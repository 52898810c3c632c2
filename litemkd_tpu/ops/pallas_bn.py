"""Pallas batch-norm kernels (measured, NOT used by default).

Profiling the flagship train step (16-episode batch, resnet18_2fc trunk)
shows ~40% of device time in ``convert_reduce_fusion`` ops — BN batch
moments (forward) and the two BN backward reductions (Σdy, Σdy·x̂). These
kernels stream the activations through VMEM with fp32 accumulators revisited
across a sequential grid.

**A/B result on TPU v5e (flagship step, 2026-08-16): XLA wins decisively —
18.0 eps/s with flax/XLA BN vs 9.5 eps/s with these kernels**
(``BENCH_PALLAS_BN=1``). Standalone reduction kernels serialize ~40 extra
launches per step, idle half the lanes at C=64, and can't overlap with the
convolutions the way XLA's kInput reduce fusions do. Conclusion recorded so
round 2+ doesn't re-walk this path: the BN reduces in this model are already
near XLA's achievable envelope; remaining wins must come from *removing*
passes (e.g. freeze_bn finetune mode, +15%), not re-implementing them.
Kept as a verified-correct reference implementation:

- ``_sums``      : (R, C) → [Σx, Σx²]        (forward moments, one read)
- ``_bwd_sums``  : (R, C)×2 → [Σdy, Σdy·x̂]   (backward reductions, one read
                   of dy and x each; x̂ recomputed in-register from μ, σ⁻¹)

``batch_norm_train`` wraps them in a custom VJP (normalize/apply stays in
jnp so XLA fuses it with neighboring elementwise work), and
``PallasBatchNorm`` is a drop-in ``nn.BatchNorm`` replacement with the same
param/batch_stats naming ("scale"/"bias", "mean"/"var") so checkpoints and
the torch importer work unchanged. Off-TPU (or with ``use_pallas=False``)
the same code path runs on jnp reductions — used by the CPU test mesh.

Reference context: the torch reference relies on cuDNN BN inside
torchvision resnets (model/backbone/resnet18_2fc.py:17-77).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from .dtypes import anchor

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_INTERPRET = False  # flipped by tests to run kernels off-TPU


def _on_tpu() -> bool:
    return _HAVE_PALLAS and (jax.default_backend() == "tpu" or _INTERPRET)


def _block_rows(c: int) -> int:
    # ≤0.5 MiB bf16 input blocks, sublane-aligned; the bwd kernel keeps two
    # inputs (double-buffered) plus their f32 temporaries on the VMEM stack,
    # so 1 MiB blocks overflowed the 16 MiB scoped limit. The floor is the
    # 16-row bf16 tile, NOT a perf floor — max(256, ...) here would reinstate
    # 1 MiB blocks for c ≥ 2048 (resnet50 layer4)
    return max(16, min(4096, (1 << 19) // (2 * c) // 16 * 16))


def _row_mask(i, rb: int, r: int):
    rows = lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
    return (i * rb + rows) < r


def _sums_pallas(x2: jnp.ndarray) -> jnp.ndarray:
    """(R, C) → (2, C) f32 [Σx, Σx²]."""
    r, c = x2.shape
    rb = _block_rows(c)
    grid = pl.cdiv(r, rb)

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        xb = x_ref[...].astype(jnp.float32)
        xb = jnp.where(_row_mask(i, rb, r), xb, 0.0)
        o_ref[0:1, :] += jnp.sum(xb, axis=0, keepdims=True)
        o_ref[1:2, :] += jnp.sum(xb * xb, axis=0, keepdims=True)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((rb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=_INTERPRET,
    )(x2)


def _bwd_sums_pallas(dy2: jnp.ndarray, x2: jnp.ndarray, mean: jnp.ndarray,
                     inv: jnp.ndarray) -> jnp.ndarray:
    """(R, C) dy and x (+ per-channel μ, σ⁻¹) → (2, C) f32 [Σdy, Σdy·x̂]."""
    r, c = x2.shape
    rb = _block_rows(c)
    grid = pl.cdiv(r, rb)

    def kernel(dy_ref, x_ref, mu_ref, inv_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        mask = _row_mask(i, rb, r)
        dy = jnp.where(mask, dy_ref[...].astype(jnp.float32), 0.0)
        # mask x as well: 0·NaN from padded tail rows would poison Σdy·x̂
        xb = jnp.where(mask, x_ref[...].astype(jnp.float32), 0.0)
        xhat = (xb - mu_ref[...]) * inv_ref[...]
        o_ref[0:1, :] += jnp.sum(dy, axis=0, keepdims=True)
        o_ref[1:2, :] += jnp.sum(dy * xhat, axis=0, keepdims=True)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=_INTERPRET,
    )(dy2, x2, mean.reshape(1, c), inv.reshape(1, c))


def _sums_jnp(x2):
    xf = x2.astype(jnp.float32)
    return jnp.stack([jnp.sum(xf, axis=0), jnp.sum(xf * xf, axis=0)])


def _bwd_sums_jnp(dy2, x2, mean, inv):
    dy = dy2.astype(jnp.float32)
    xhat = (x2.astype(jnp.float32) - mean) * inv
    return jnp.stack([jnp.sum(dy, axis=0), jnp.sum(dy * xhat, axis=0)])


# ---------------------------------------------------------------------------
# batch_norm_train: custom-VJP training-mode BN (returns y, batch mean/var)
# ---------------------------------------------------------------------------

def _bn_forward(x, scale, bias, eps, use_pallas):
    c = x.shape[-1]
    r = x.size // c
    x2 = x.reshape(r, c)
    sums = (_sums_pallas(x2) if use_pallas and _on_tpu()
            else _sums_jnp(x2))
    mean = sums[0] / r
    var = jnp.maximum(sums[1] / r - mean * mean, 0.0)   # E[x²]−E[x]² (flax)
    inv = lax.rsqrt(var + eps)
    mul = scale * inv
    y = ((x2.astype(jnp.float32) - mean) * mul + bias).astype(x.dtype)
    return y.reshape(x.shape), mean, var, inv


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def batch_norm_train(x, scale, bias, eps: float, use_pallas: bool = True):
    """Training-mode batch norm over all leading axes of ``x`` (channels
    last): returns ``(y, batch_mean, batch_var)``. The mean/var outputs are
    for running-stat updates and are treated as stop-gradient in the VJP."""
    y, mean, var, _ = _bn_forward(x, scale, bias, eps, use_pallas)
    return y, mean, var


def _bn_fwd(x, scale, bias, eps, use_pallas):
    y, mean, var, inv = _bn_forward(x, scale, bias, eps, use_pallas)
    return (y, mean, var), (x, scale, mean, inv)


def _bn_bwd(eps, use_pallas, res, cts):
    gy = cts[0]                      # stats cotangents are zero by contract
    x, scale, mean, inv = res
    c = x.shape[-1]
    r = x.size // c
    x2 = x.reshape(r, c)
    gy2 = gy.reshape(r, c)
    sums = (_bwd_sums_pallas(gy2, x2, mean, inv) if use_pallas and _on_tpu()
            else _bwd_sums_jnp(gy2, x2, mean, inv))
    s_dy, s_dyxh = sums[0], sums[1]
    xhat = (x2.astype(jnp.float32) - mean) * inv
    dx = (inv * scale) * (gy2.astype(jnp.float32) - s_dy / r
                          - xhat * (s_dyxh / r))
    return (dx.astype(x.dtype).reshape(x.shape),
            s_dyxh.astype(scale.dtype), s_dy.astype(scale.dtype))


batch_norm_train.defvjp(_bn_fwd, _bn_bwd)


class PallasBatchNorm(nn.Module):
    """Drop-in ``nn.BatchNorm`` (channels-last) with Pallas-reduced training
    moments. Same variable naming as flax ("scale"/"bias" params,
    batch_stats "mean"/"var"), same momentum semantics
    (``ra = m·ra + (1−m)·batch``), biased batch variance."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if self.use_running_average:
            mul = scale * lax.rsqrt(ra_var.value + self.epsilon)
            y = (anchor(x) - ra_mean.value) * mul + bias
            return y.astype(self.dtype)
        y, mean, var = batch_norm_train(x, scale, bias, self.epsilon,
                                        self.use_pallas)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * lax.stop_gradient(mean)
            ra_var.value = m * ra_var.value + (1 - m) * lax.stop_gradient(var)
        return y.astype(self.dtype)
