from .metrics import (aggregate_accuracy, per_episode_accuracy,
                      confidence_interval, TestAccuracies)
from .logging import MetricsLogger
from .saliency import grad_cam, backbone_grad_cam
from .tracing import cost_analysis, trace

__all__ = ["aggregate_accuracy", "per_episode_accuracy", "confidence_interval",
           "TestAccuracies", "MetricsLogger", "grad_cam", "backbone_grad_cam",
           "cost_analysis", "trace"]
