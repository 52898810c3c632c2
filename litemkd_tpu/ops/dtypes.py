"""Numerics-anchor dtype policy.

The framework's mixed-precision convention is "bf16 trunks / fp32
stats-softmax-logits": precision-sensitive reductions are pinned to float32
so bf16 trunks can't erode them. Pinning with a literal ``jnp.float32``
however silently DOWNCASTS float64 flows (the fp64 golden-parity tests run
the whole model in double against torch ``.double()``); these helpers keep
the fp32 floor while widening to fp64 when the incoming compute dtype is
already double.
"""
from __future__ import annotations

import jax.numpy as jnp


def anchor_dtype(dtype) -> jnp.dtype:
    """float32 anchor for sub-fp32 dtypes; float64 stays float64."""
    return (jnp.float64 if jnp.dtype(dtype) == jnp.dtype(jnp.float64)
            else jnp.float32)


def anchor(x: jnp.ndarray) -> jnp.ndarray:
    """Cast ``x`` up to its anchor dtype (bf16/fp16/fp32 → fp32, fp64 → fp64)."""
    return x.astype(anchor_dtype(x.dtype))
