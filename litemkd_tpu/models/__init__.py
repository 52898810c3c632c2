from .student import (Student, Teacher, BatchedStudent, BatchedTeacher,
                      BACKBONES, CLASSIFIERS, TEACHER_ALIASES,
                      make_backbone, make_classifier, make_vmapped_classifier)
from .backbones.resnet import ResNetBackbone, ResNetTrunk, FeatureBackbone, adaptive_max_pool_2d
from .backbones.mobilenet import MobileNetV3Backbone

__all__ = ["Student", "Teacher", "BatchedStudent", "BatchedTeacher",
           "BACKBONES", "CLASSIFIERS", "TEACHER_ALIASES",
           "make_backbone", "make_classifier", "make_vmapped_classifier",
           "ResNetBackbone", "ResNetTrunk", "FeatureBackbone",
           "MobileNetV3Backbone", "adaptive_max_pool_2d"]
