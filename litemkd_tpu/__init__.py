"""litemkd_tpu — a TPU-native (JAX/XLA/pjit/Pallas) framework for multi-modal
knowledge distillation in few-shot video action recognition.

Re-designed from scratch with the capabilities of Lite-MKD (HuiGuanLab/Lite-MKD,
ACM MM 2023): episodic N-way K-shot training, the TRX temporal cross-transformer
family of metric heads, the MFM hierarchical multi-modal fusion teacher, the D2M
student-mimicry distillation losses, and the surrounding data/eval/benchmark
tooling — built TPU-first (episode batching via vmap, mesh sharding via pjit,
bf16 on the MXU, Pallas kernels on the hot attention path).
"""

__version__ = "0.1.0"

from .config import Config, EpisodeConfig, ModelConfig, DistillConfig, TrainConfig, DataConfig, MeshConfig, preset

__all__ = ["Config", "EpisodeConfig", "ModelConfig", "DistillConfig",
           "TrainConfig", "DataConfig", "MeshConfig", "preset", "__version__"]
