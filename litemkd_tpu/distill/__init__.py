from .losses import (kd_loss, softmax_ce, inter_class_relation,
                     pearson_correlation, mse, get_distiller, available,
                     merge_logits, register, inter_class_cosine_ratio,
                     inter_class_cosine)

__all__ = ["kd_loss", "softmax_ce", "inter_class_relation", "pearson_correlation",
           "mse", "get_distiller", "available", "merge_logits", "register",
           "inter_class_cosine_ratio", "inter_class_cosine"]
