from .losses import (kd_loss, softmax_ce, inter_class_relation,
                     pearson_correlation, mse, get_distiller, available,
                     merge_logits, register)

__all__ = ["kd_loss", "softmax_ce", "inter_class_relation", "pearson_correlation",
           "mse", "get_distiller", "available", "merge_logits", "register"]
