"""ResNet backbones (Flax, NHWC) with the Lite-MKD feature head.

Reproduces the torchvision-resnet-minus-last-two-layers trunk used by every
student backbone in the reference (``model/backbone/resnet18_2fc.py:17-77``,
``resnet18_student.py``, ``resnet50_*``, ``meta_baseline*``): the (7,7,C) map
is adaptive-max-pooled to (4,4), the 16 patches are mean-pooled, and one or two
linear heads lift the trunk width to ``out_dim`` (2048).

TPU-first choices: NHWC layout (XLA's native conv layout), bf16 conv + BN
application (flax still accumulates BN statistics in fp32 internally), one
fused trunk application over all (batch × frame) images of an episode batch.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from ...ops.dtypes import anchor
from ...ops.pallas_bn import PallasBatchNorm
from ...ops.torch_init import (torch_conv_kernel_init, torch_linear_kernel_init,
                               torch_linear_bias_init)


def _bn_factory(pallas_bn: bool, compute_dtype, train: bool):
    """nn.BatchNorm or the Pallas-reduced drop-in (same variable naming)."""
    if pallas_bn:
        return partial(PallasBatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=compute_dtype)
    return partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                   epsilon=1e-5, dtype=compute_dtype)

Features = Union[jnp.ndarray, Dict[str, jnp.ndarray]]


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    compute_dtype: jnp.dtype = jnp.bfloat16
    freeze_bn: bool = False
    pallas_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        train = train and not self.freeze_bn
        conv = partial(nn.Conv, use_bias=False, dtype=self.compute_dtype,
                       kernel_init=torch_conv_kernel_init())
        bn = _bn_factory(self.pallas_bn, self.compute_dtype, train)
        identity = x
        y = conv(self.filters, (3, 3), (self.stride, self.stride),
                 padding=1, name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = conv(self.filters, (3, 3), padding=1, name="conv2")(y)
        y = bn(name="bn2")(y)
        if identity.shape[-1] != self.filters or self.stride != 1:
            identity = conv(self.filters, (1, 1), (self.stride, self.stride),
                            name="downsample_conv")(x)
            identity = bn(name="downsample_bn")(identity)
        return nn.relu(y + identity.astype(y.dtype))


class Bottleneck(nn.Module):
    filters: int          # base width; output is 4x
    stride: int = 1
    compute_dtype: jnp.dtype = jnp.bfloat16
    freeze_bn: bool = False
    pallas_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        train = train and not self.freeze_bn
        conv = partial(nn.Conv, use_bias=False, dtype=self.compute_dtype,
                       kernel_init=torch_conv_kernel_init())
        bn = _bn_factory(self.pallas_bn, self.compute_dtype, train)
        out_ch = self.filters * 4
        identity = x
        y = conv(self.filters, (1, 1), name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = conv(self.filters, (3, 3), (self.stride, self.stride),
                 padding=1, name="conv2")(y)  # stride on 3x3, torchvision-style
        y = nn.relu(bn(name="bn2")(y))
        y = conv(out_ch, (1, 1), name="conv3")(y)
        y = bn(name="bn3")(y)
        if identity.shape[-1] != out_ch or self.stride != 1:
            identity = conv(out_ch, (1, 1), (self.stride, self.stride),
                            name="downsample_conv")(x)
            identity = bn(name="downsample_bn")(identity)
        return nn.relu(y + identity.astype(y.dtype))


_STAGES = {
    18: (BasicBlock, (2, 2, 2, 2), 512),
    34: (BasicBlock, (3, 4, 6, 3), 512),
    50: (Bottleneck, (3, 4, 6, 3), 2048),
}


class ResNetTrunk(nn.Module):
    """Conv trunk: (N, H, W, 3) → (N, H/32, W/32, C_out).

    ``remat=True`` rematerializes each residual block in the backward pass
    (jax.checkpoint) — trades ~33% trunk FLOPs for the activation memory that
    otherwise caps the episode batch size in HBM.
    """

    depth: int = 18
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    freeze_bn: bool = False   # use running stats even in training (finetune
                              # mode; ~15% faster — BN-stat reduces vanish)
    pallas_bn: bool = False   # Pallas-reduced BN training moments

    @nn.compact
    def __call__(self, x, *, train: bool):
        block_cls, stages, _ = _STAGES[self.depth]
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        bn_train = train and not self.freeze_bn
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.compute_dtype,
                    kernel_init=torch_conv_kernel_init(), name="conv1")(x)
        x = _bn_factory(self.pallas_bn, self.compute_dtype, bn_train)(
            name="bn1")(x)
        x = nn.relu(x)
        # SelectAndScatter backward A/B-measured faster than the scatter-free
        # alternative on v5e (18.0 vs 15.2 eps/s flagship) — see ops/pooling.py
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for i, (n_blocks, filters) in enumerate(zip(stages, (64, 128, 256, 512))):
            for b in range(n_blocks):
                stride = 2 if (i > 0 and b == 0) else 1
                x = block_cls(filters, stride, self.compute_dtype,
                              self.freeze_bn, self.pallas_bn,
                              name=f"layer{i + 1}_{b}")(x, train)
        return x


def adaptive_max_pool_2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveMaxPool2d semantics on NHWC input (static shapes).

    Window i spans [floor(i*L/out), ceil((i+1)*L/out)) — overlapping when L is
    not a multiple of out (e.g. 7→4 as in the reference, resnet18_2fc.py:29).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -(-(i + 1) * h // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -(-(j + 1) * w // ow)
            cols.append(jnp.max(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (N, oh, ow, C)


def flatten_clip_frames(clips: jnp.ndarray, compute_dtype):
    """(B, T, H, W, 3) → ((B·T, H, W, 3) in compute dtype, B, T); uint8
    pixels (the wire format) are scaled /255 on device. Shared by every CNN
    backbone so the scaling convention can't drift between trunks."""
    b, t = clips.shape[0], clips.shape[1]
    x = clips.reshape(b * t, *clips.shape[2:]).astype(compute_dtype)
    if clips.dtype == jnp.uint8:
        x = x / 255.0
    return x, b, t


def litemkd_feature_head(x, b, t, *, num_fc: int, out_dim: int,
                         pool_hw: Tuple[int, int], pool: str = "adaptive_max"):
    """The shared Lite-MKD feature head (reference resnet18_2fc.py:29-77 /
    moblienetv3.py:40-76): adaptive max-pool → 16-patch mean (f32) → fc1
    [/fc2] per frame. Must be called from inside a module's ``nn.compact``
    ``__call__`` — the fc1/fc2 Dense params land in the caller's scope, so
    every backbone keeps the same checkpoint layout."""
    if pool == "gap":
        x = anchor(x).mean(axis=(1, 2))
    else:
        # max-pool in the trunk dtype (max is precision-exact; the f32
        # upcast before pooling doubled the backward's scatter-add traffic)
        x = adaptive_max_pool_2d(x, pool_hw)
        x = anchor(x.reshape(b * t, -1, x.shape[-1])).mean(axis=1)
    trunk_dim = x.shape[-1]
    if num_fc == 0:
        return x.reshape(b, t, trunk_dim)
    dense = partial(nn.Dense, out_dim, dtype=x.dtype,
                    kernel_init=torch_linear_kernel_init(),
                    bias_init=torch_linear_bias_init(trunk_dim))
    f1 = dense(name="fc1")(x).reshape(b, t, out_dim)
    if num_fc == 1:
        return f1
    f2 = dense(name="fc2")(x).reshape(b, t, out_dim)
    return {"f1": f1, "f2": f2}


class ResNetBackbone(nn.Module):
    """Full Lite-MKD student backbone: clips → per-frame features.

    Input  (B, T, H, W, 3) float; output (B, T, out_dim) for ``num_fc=1`` or
    ``{'f1','f2'}`` dicts for ``num_fc=2``; ``num_fc=0`` returns the raw trunk
    width (the resnet50_student variant).
    """

    depth: int = 18
    num_fc: int = 2
    out_dim: int = 2048
    pool_hw: Tuple[int, int] = (4, 4)
    pool: str = "adaptive_max"     # "adaptive_max" (Lite-MKD head) | "gap" (TRM)
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    freeze_bn: bool = False
    pallas_bn: bool = False

    @nn.compact
    def __call__(self, clips: jnp.ndarray, *, train: bool) -> Features:
        x, b, t = flatten_clip_frames(clips, self.compute_dtype)
        x = ResNetTrunk(self.depth, self.compute_dtype, self.remat,
                        self.freeze_bn, self.pallas_bn, name="trunk")(
                            x, train=train)
        return litemkd_feature_head(x, b, t, num_fc=self.num_fc,
                                    out_dim=self.out_dim,
                                    pool_hw=self.pool_hw, pool=self.pool)


class FeatureBackbone(nn.Module):
    """Identity backbone for precomputed features (teacher-feature episodes).

    The reference's Teacher wrapper consumes fused features directly
    (``model_select.py:38-49``); this module gives that path the same calling
    convention as CNN backbones.
    """

    @nn.compact
    def __call__(self, feats: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        return feats
