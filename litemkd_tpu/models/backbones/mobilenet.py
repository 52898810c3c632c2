"""MobileNetV3 backbones (Flax, NHWC) with the Lite-MKD feature head.

The reference wraps torchvision's ``mobilenet_v3_large`` feature extractor with
the same adaptive-max-pool → patch-mean → fc head as the resnets
(``model/backbone/moblienetv3.py:17-76``). The README also reports
MobileNetV3-small students (``Readme.md:160-161``), so both widths are here.

Block specs follow the MobileNetV3 paper (Howard et al., 2019): inverted
residuals with optional squeeze-excite, ReLU or hard-swish per stage.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from .resnet import flatten_clip_frames, litemkd_feature_head
from ...ops.dtypes import anchor_dtype
from ...ops.torch_init import (torch_conv_kernel_init, torch_linear_kernel_init,
                               torch_linear_bias_init)


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


# (kernel, expansion, out_ch, use_se, use_hs, stride)
_LARGE = [
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1),
    (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2),
    (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1),
    (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2),
    (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]
_SMALL = [
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
]
_LAST_CH = {"large": 960, "small": 576}


class SqueezeExcite(nn.Module):
    channels: int
    squeeze: int

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2))
        se_dt = anchor_dtype(x.dtype)
        # torchvision SE uses 1x1 Conv2d with default init: biases draw
        # U(±1/sqrt(fan_in)) like every other torch linear, not zeros
        s = nn.relu(nn.Dense(self.squeeze, dtype=se_dt,
                             kernel_init=torch_linear_kernel_init(),
                             bias_init=torch_linear_bias_init(self.channels),
                             name="fc1")(s))
        s = hard_sigmoid(nn.Dense(self.channels, dtype=se_dt,
                                  kernel_init=torch_linear_kernel_init(),
                                  bias_init=torch_linear_bias_init(self.squeeze),
                                  name="fc2")(s))
        return x * s[:, None, None, :].astype(x.dtype)


class InvertedResidual(nn.Module):
    kernel: int
    expand: int
    out_ch: int
    use_se: bool
    use_hs: bool
    stride: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        # train is POSITIONAL (like resnet.BasicBlock) so nn.remat can mark it
        # static (static_argnums=(2,)); keyword-only args can't be static
        act = hard_swish if self.use_hs else nn.relu
        conv = partial(nn.Conv, use_bias=False, dtype=self.compute_dtype,
                       kernel_init=torch_conv_kernel_init())
        bn = partial(nn.BatchNorm, use_running_average=not train, momentum=0.99,
                     epsilon=1e-3, dtype=self.compute_dtype)
        in_ch = x.shape[-1]
        y = x
        if self.expand != in_ch:
            y = act(bn(name="expand_bn")(conv(self.expand, (1, 1), name="expand")(y)))
        pad = (self.kernel - 1) // 2
        y = conv(self.expand, (self.kernel, self.kernel),
                 (self.stride, self.stride), padding=pad,
                 feature_group_count=self.expand, name="depthwise")(y)
        y = act(bn(name="depthwise_bn")(y))
        if self.use_se:
            y = SqueezeExcite(self.expand, _make_divisible(self.expand / 4),
                              name="se")(y)
        y = bn(name="project_bn")(conv(self.out_ch, (1, 1), name="project")(y))
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x.astype(y.dtype)
        return y


class MobileNetV3Trunk(nn.Module):
    variant: str = "large"
    compute_dtype: jnp.dtype = jnp.bfloat16
    freeze_bn: bool = False   # finetune mode: BN uses running stats in train
    remat: bool = False       # rematerialize each inverted-residual block:
                              # the 224px early-stage activations otherwise cap
                              # the fused fwd/bwd at micro_batch=4 in HBM

    @nn.compact
    def __call__(self, x, *, train: bool):
        train = train and not self.freeze_bn   # train only gates BN here
        specs = _LARGE if self.variant == "large" else _SMALL
        block_cls = InvertedResidual
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        conv = partial(nn.Conv, use_bias=False, dtype=self.compute_dtype,
                       kernel_init=torch_conv_kernel_init())
        bn = partial(nn.BatchNorm, use_running_average=not train, momentum=0.99,
                     epsilon=1e-3, dtype=self.compute_dtype)
        x = hard_swish(bn(name="stem_bn")(
            conv(16, (3, 3), (2, 2), padding=1, name="stem")(x)))
        for i, (k, e, o, se, hs, s) in enumerate(specs):
            x = block_cls(k, e, o, se, hs, s, self.compute_dtype,
                          name=f"block{i}")(x, train)
        last = _LAST_CH[self.variant]
        x = hard_swish(bn(name="head_bn")(conv(last, (1, 1), name="head")(x)))
        return x


class MobileNetV3Backbone(nn.Module):
    """Clips → per-frame features via the shared Lite-MKD head."""

    variant: str = "large"
    num_fc: int = 2
    out_dim: int = 2048
    pool_hw: Tuple[int, int] = (4, 4)
    compute_dtype: jnp.dtype = jnp.bfloat16
    freeze_bn: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, clips: jnp.ndarray, *, train: bool):
        x, b, t = flatten_clip_frames(clips, self.compute_dtype)
        x = MobileNetV3Trunk(self.variant, self.compute_dtype,
                             self.freeze_bn, self.remat,
                             name="trunk")(x, train=train)
        return litemkd_feature_head(x, b, t, num_fc=self.num_fc,
                                    out_dim=self.out_dim,
                                    pool_hw=self.pool_hw)
