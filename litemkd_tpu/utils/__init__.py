from .metrics import (aggregate_accuracy, per_episode_accuracy,
                      confidence_interval, TestAccuracies, task_confusion,
                      real_class_preds)
from .logging import MetricsLogger
from .saliency import grad_cam, backbone_grad_cam
from .tracing import cost_analysis, trace
from .tree import deep_merge_variables

__all__ = ["aggregate_accuracy", "per_episode_accuracy", "confidence_interval",
           "TestAccuracies", "task_confusion", "real_class_preds",
           "MetricsLogger", "grad_cam",
           "backbone_grad_cam", "cost_analysis", "trace",
           "deep_merge_variables"]
