"""Fused Pallas kernel for the TRX cross-attention core.

Computes, for each class w:

    scores = q_k · class_k[w]^T / sqrt(dk)          # (Q·U, S·U)
    attn   = row-softmax(scores)                    # joint (shot, tuple) axis
    proto  = attn · class_v[w]                      # (Q·U, dk)
    dist   = Σ_u ‖q_v - proto‖² / U                 # per query
    logits[:, w] = -dist

in ONE kernel program per class — the (Q, W, U, dk) prototype tensor and the
(Q, W, U, S, U) attention tensor never round-trip through HBM (the XLA path
materializes both). Numerics match ``tct.py``'s einsum path (see
tests/test_pallas.py); the module falls back to that path off-TPU.

VMEM budget at the flagship shapes (Q=25, U=28, dk=1152, S=5):
q_k/q_v 700×1152×4 ≈ 3.2 MB each, class_k/v 140×1152×4 ≈ 0.65 MB each,
scores 700×140×4 ≈ 0.4 MB — comfortably under the ~16 MB/core limit.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _kernel(qk_ref, qv_ref, ck_ref, cv_ref, out_ref, *, n_way: int,
            n_queries: int, n_tuples: int, dk: int):
    """Single program; static unrolled loop over the (small) class axis.
    refs: qk/qv (Q*U, dk); ck/cv (W, S*U, dk); out (Q, W) distances."""
    qk = qk_ref[:]                                       # (QU, dk)
    qv = qv_ref[:]
    inv_sqrt = 1.0 / np.sqrt(dk)
    for w in range(n_way):
        ck = ck_ref[w]                                   # (SU, dk)
        scores = jnp.dot(qk, ck.T,
                         preferred_element_type=jnp.float32) * inv_sqrt
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)    # (QU, SU)
        proto = jnp.dot(attn, cv_ref[w],
                        preferred_element_type=jnp.float32)
        diff = qv - proto                                # (QU, dk)
        sq = jnp.sum(diff * diff, axis=-1)               # (QU,)
        out_ref[:, w] = sq.reshape(n_queries, n_tuples).sum(axis=-1) / n_tuples


def tct_attention_pallas(q_k: jnp.ndarray, q_v: jnp.ndarray,
                         class_k: jnp.ndarray, class_v: jnp.ndarray) -> jnp.ndarray:
    """q_k/q_v (Q, U, dk); class_k/class_v (W, S, U, dk) → logits (Q, W)."""
    q, u, dk = q_k.shape
    w, s = class_k.shape[0], class_k.shape[1]
    qk = q_k.reshape(q * u, dk).astype(jnp.float32)
    qv = q_v.reshape(q * u, dk).astype(jnp.float32)
    ck = class_k.reshape(w, s * u, dk).astype(jnp.float32)
    cv = class_v.reshape(w, s * u, dk).astype(jnp.float32)

    dist = pl.pallas_call(
        partial(_kernel, n_way=w, n_queries=q, n_tuples=u, dk=dk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * w * (q * u) * (s * u) * dk * 2,
            bytes_accessed=(2 * q * u * dk + 2 * w * s * u * dk + w * q) * 4,
            transcendentals=w * q * u * s * u,
        ),
    )(qk, qv, ck, cv)
    return -dist                                         # (Q, W) logits


def tct_attention_xla(q_k, q_v, class_k, class_v, return_proto: bool = False):
    """Reference einsum path (identical math; used off-TPU, in tests, and —
    with ``return_proto=True`` — by the prototype-emitting TRX_sup head, so
    the two call sites cannot drift numerically)."""
    q, u, dk = q_k.shape
    w, s = class_k.shape[0], class_k.shape[1]
    scores = jnp.einsum("qud,wsvd->qwusv", q_k, class_k,
                        preferred_element_type=jnp.float32) / np.sqrt(dk)
    attn = jax.nn.softmax(scores.reshape(q, w, u, s * u), axis=-1)
    attn = attn.reshape(q, w, u, s, u)
    proto = jnp.einsum("qwusv,wsvd->qwud", attn, class_v,
                       preferred_element_type=jnp.float32)
    diff = q_v[:, None, :, :] - proto
    dist = jnp.sum(diff * diff, axis=(-2, -1)) / u
    return (-dist, proto) if return_proto else -dist


@jax.custom_vjp
def _tct_attention_fused(q_k, q_v, class_k, class_v):
    return tct_attention_pallas(q_k, q_v, class_k, class_v)


def _fused_fwd(q_k, q_v, class_k, class_v):
    return tct_attention_pallas(q_k, q_v, class_k, class_v), \
        (q_k, q_v, class_k, class_v)


def _fused_bwd(residuals, g):
    # backward via the einsum path (rematerialized): correct gradients with
    # XLA-fused cost; the forward keeps the fused-kernel memory profile
    _, vjp = jax.vjp(tct_attention_xla, *residuals)
    return vjp(g)


_tct_attention_fused.defvjp(_fused_fwd, _fused_bwd)


def tct_attention(q_k, q_v, class_k, class_v, use_pallas: bool = False):
    if use_pallas and _HAVE_PALLAS:
        return _tct_attention_fused(q_k, q_v, class_k, class_v)
    return tct_attention_xla(q_k, q_v, class_k, class_v)
