from .metrics import (aggregate_accuracy, per_episode_accuracy,
                      confidence_interval, TestAccuracies)

__all__ = ["aggregate_accuracy", "per_episode_accuracy", "confidence_interval",
           "TestAccuracies"]
