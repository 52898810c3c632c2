from .torch_import import (load_state_dict, import_resnet_trunk, import_tct,
                           load_teacher_checkpoint, import_backbone_2fc,
                           load_student_checkpoint, normalize_resnet_keys,
                           import_mobilenet_trunk, import_backbone_mobilenet,
                           detect_torchvision_zoo, load_torchvision_trunk,
                           import_ctx_classifier)

__all__ = ["load_state_dict", "import_resnet_trunk", "import_tct",
           "load_teacher_checkpoint", "import_backbone_2fc",
           "load_student_checkpoint", "normalize_resnet_keys",
           "import_mobilenet_trunk", "import_backbone_mobilenet",
           "detect_torchvision_zoo", "load_torchvision_trunk",
           "import_ctx_classifier"]
