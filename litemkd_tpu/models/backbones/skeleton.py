"""Skeleton-modality expert encoder.

Rebuild of the reference's ``S3DEncoder`` (``teacher/code/model.py:2788-2818``)
— despite the name it is a temporal transformer over flattened per-frame
joint coordinates: Linear(J·3 → d) + LayerNorm + ReLU + Linear(d → d)
embedding, 0.1-scaled sinusoidal PE, and a 3-layer post-LN encoder
(nhead=1, dim_feedforward=d). The full ``S3D`` expert = this backbone + the
multi-set TCT head ('TRM'/'TRX_multi' classifier).

Documented divergence: the released encoder omits ``batch_first=True``
(model.py:2808), so torch attends across the B clips at each frame position
— batch-composition-dependent and clearly unintended. (The sinusoidal PE is
per-FRAME on both sides: ``pe[:, :x.size(1)]`` indexes dim 1 regardless of
batch_first.) We attend over time by default; ``video_axis=True`` (backbone
name ``s3d_videoaxis``/``skeleton_videoaxis``) reproduces the released
behavior so reference-trained S3D checkpoints replay their own outputs.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ...ops.dtypes import anchor
from ...ops.positional import SinusoidalPE
from ...ops.torch_init import torch_linear_kernel_init, torch_linear_bias_init
from ..teacher.fusion import Encoder


class SkeletonEncoder(nn.Module):
    """(B, T, J, C) or (B, T, J·C) skeleton frames → (B, T, out_dim)."""

    out_dim: int = 2048
    joints_dim: int = 17 * 3
    num_head: int = 1
    num_layer: int = 3
    dropout: float = 0.1
    video_axis: bool = False

    @nn.compact
    def __call__(self, skeletons: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        b, t = skeletons.shape[0], skeletons.shape[1]
        x = anchor(skeletons.reshape(b, t, -1))
        d = self.out_dim

        def dense(out, fan_in, name):
            return nn.Dense(out, name=name,
                            kernel_init=torch_linear_kernel_init(),
                            bias_init=torch_linear_bias_init(fan_in))

        x = dense(d, x.shape[-1], "embed_in")(x)
        x = nn.relu(nn.LayerNorm(epsilon=1e-5, name="embed_ln")(x))
        x = dense(d, d, "embed_out")(x)
        x = SinusoidalPE(d, max_len=max(t, 8), dropout=self.dropout,
                         name="pe")(x, train=train)
        x = Encoder(d, self.num_head, self.num_layer, self.dropout,
                    dim_ff=d, video_axis=self.video_axis,
                    name="encoder")(x, train)
        return x
