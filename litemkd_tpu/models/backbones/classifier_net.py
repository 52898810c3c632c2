"""Supervised per-modality classifier network.

Rebuild of ``Action_Recognition_Resnet50`` (``teacher/code/model.py:3345-3366``)
used by the pretraining stage (``teacher/code/pretrain/pretrain.py``): resnet
trunk → global average pool → mean over frames → linear classifier; plus a
per-frame feature extractor for the expert-feature dump.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .resnet import ResNetTrunk, _STAGES
from ...ops.torch_init import torch_linear_kernel_init, torch_linear_bias_init


class ActionRecognitionNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    def setup(self):
        self.trunk = ResNetTrunk(self.depth, self.compute_dtype, self.remat)
        trunk_dim = _STAGES[self.depth][2]
        self.fc = nn.Dense(self.num_classes, dtype=jnp.float32,
                           kernel_init=torch_linear_kernel_init(),
                           bias_init=torch_linear_bias_init(trunk_dim))

    def features(self, clips: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        """(B, T, H, W, 3) → (B, T, D) global-avg-pooled trunk features —
        the per-video expert features dumped to feature.npy trees."""
        b, t = clips.shape[0], clips.shape[1]
        x = clips.reshape(b * t, *clips.shape[2:]).astype(self.compute_dtype)
        if clips.dtype == jnp.uint8:
            x = x / 255.0
        x = self.trunk(x, train=train)
        x = x.astype(jnp.float32).mean(axis=(1, 2))    # global average pool
        return x.reshape(b, t, -1)

    def __call__(self, clips: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        """(B, T, H, W, 3) → (B, num_classes) logits."""
        feats = self.features(clips, train=train)
        return self.fc(feats.mean(axis=1))
