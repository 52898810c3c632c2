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

Honest perf note (on-chip device-loop A/B, 2026-08-17): at the flagship
shapes the fused forward is a WASH with the XLA einsum path (~0.8-1.0 ms for
a 4-8 episode vmap; round 1's "3x XLA" claim was a host-loop timing artifact
— the ~30 ms axon-tunnel round trip dominated both sides). The kernel's value
is its memory profile: the attention/proto intermediates stay in VMEM, which
is what lets the fully-fused train step compile at ``micro_batch>=8``.

VMEM discipline: the grid tiles (query-chunk × class), so per-program blocks
are a qk/qv chunk (≤8 queries × U rows) plus ONE class's k/v — ~3.5 MB at the
flagship shapes (Q=25, U=28, dk=1152, S=5) regardless of how many episodes the
caller vmaps over (vmap prepends an episode grid axis). The first version kept
whole per-episode operands resident (12.9 MB) and blew the 16 MB scoped-VMEM
limit once ``nn.vmap`` batched ≥8 episodes into one call — the real cause of
the round-1 ``micro_batch≥8`` remote-compile failures.
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


_LANES = 128   # TPU lane width: the class axis of the output is padded to one
               # full lane tile so the out block satisfies the (8, 128) layout
               # constraint; real classes occupy the first W lanes

_INTERPRET = False  # flipped by tests to run the kernel off-TPU


def _on_tpu() -> bool:
    # same guard as pallas_bn._on_tpu: pallas imports fine on CPU but only
    # interpret mode can lower there — the documented off-TPU fallback must
    # check the backend, not just the import
    return _HAVE_PALLAS and (jax.default_backend() == "tpu" or _INTERPRET)


def _kernel(qk_ref, qv_ref, ck_ref, cv_ref, out_ref, *, n_tuples: int,
            chunk_q: int, dk: int):
    """One program = (query-chunk, class) grid cell.
    refs: qk/qv (chunk_q*U, dk); ck/cv (1, S*U, dk); out (chunk_q, 128) —
    revisited across the class axis, each step accumulating its class's
    distance column through a one-hot lane mask (a dynamic lane index store
    is not expressible; a 128-lane masked add is free)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    qk = qk_ref[:]                                       # (CQ·U, dk)
    qv = qv_ref[:]
    ck = ck_ref[0]                                       # (SU, dk)
    scores = jnp.dot(qk, ck.T,
                     preferred_element_type=jnp.float32) / np.sqrt(dk)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)        # (CQ·U, SU)
    proto = jnp.dot(attn, cv_ref[0],
                    preferred_element_type=jnp.float32)
    diff = qv - proto                                    # (CQ·U, dk)
    sq = jnp.sum(diff * diff, axis=-1)                   # (CQ·U,)
    d = sq.reshape(chunk_q, n_tuples).sum(axis=-1) / n_tuples
    lane = jax.lax.broadcasted_iota(jnp.int32, (chunk_q, _LANES), 1)
    out_ref[:] += jnp.where(lane == j, d[:, None], 0.0)


def tct_attention_pallas(q_k: jnp.ndarray, q_v: jnp.ndarray,
                         class_k: jnp.ndarray, class_v: jnp.ndarray,
                         chunk_q: int | None = None) -> jnp.ndarray:
    """q_k/q_v (Q, U, dk); class_k/class_v (W, S, U, dk) → logits (Q, W)."""
    q, u, dk = q_k.shape
    w, s = class_k.shape[0], class_k.shape[1]
    if w > _LANES:   # the one-hot lane accumulation addresses 128 lanes; a
        # larger class axis would silently read zeros back for classes >= 128
        raise ValueError(f"pallas TCT supports n_way <= {_LANES}, got {w}; "
                         f"use tct_attention_xla")
    qk = q_k.reshape(q * u, dk).astype(jnp.float32)
    qv = q_v.reshape(q * u, dk).astype(jnp.float32)
    ck = class_k.reshape(w, s * u, dk).astype(jnp.float32)
    cv = class_v.reshape(w, s * u, dk).astype(jnp.float32)

    if chunk_q is None:
        chunk_q = min(q, 8)          # ≤8·U rows ≈ 1 MB/block at dk=1152.
                                     # On-chip A/B (2026-08-17): cq 8/16/25
                                     # within noise of each other and of XLA,
                                     # but ≥25 re-blows scoped VMEM (17.6M)
                                     # under a vmapped episode grid axis —
                                     # every block then varies across the
                                     # episode axis and gets double-buffered
    grid_q = pl.cdiv(q, chunk_q)     # ragged tail handled by block padding
    dist = pl.pallas_call(
        partial(_kernel, n_tuples=u, chunk_q=chunk_q, dk=dk),
        # class axis innermost: qk/qv/out index maps are constant across it,
        # so the query chunk stays VMEM-resident while classes stream through
        grid=(grid_q, w),
        in_specs=[
            pl.BlockSpec((chunk_q * u, dk), lambda i, j: (i, 0)),
            pl.BlockSpec((chunk_q * u, dk), lambda i, j: (i, 0)),
            pl.BlockSpec((1, s * u, dk), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, s * u, dk), lambda i, j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((chunk_q, _LANES), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((q, _LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * w * (q * u) * (s * u) * dk * 2,
            bytes_accessed=(2 * q * u * dk + 2 * w * s * u * dk + w * q) * 4,
            transcendentals=w * q * u * s * u,
        ),
        interpret=_INTERPRET,   # like pallas_bn: the flag must reach the
                                # call or flipping it off-TPU dies at lowering
    )(qk, qv, ck, cv)
    return -dist[:, :w]                                  # (Q, W) logits


def tct_attention_xla(q_k, q_v, class_k, class_v, return_proto: bool = False):
    """Reference einsum path (identical math; used off-TPU, in tests, and —
    with ``return_proto=True`` — by the prototype-emitting TRX_sup head, so
    the two call sites cannot drift numerically)."""
    from .dtypes import anchor_dtype
    q, u, dk = q_k.shape
    w, s = class_k.shape[0], class_k.shape[1]
    acc = anchor_dtype(q_k.dtype)    # fp32 accumulation; fp64 under x64 flows
    scores = jnp.einsum("qud,wsvd->qwusv", q_k, class_k,
                        preferred_element_type=acc) / np.sqrt(dk)
    attn = jax.nn.softmax(scores.reshape(q, w, u, s * u), axis=-1)
    attn = attn.reshape(q, w, u, s, u)
    proto = jnp.einsum("qwusv,wsvd->qwud", attn, class_v,
                       preferred_element_type=acc)
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
    # fall back to the einsum path off-TPU (the kernel cannot lower on CPU)
    # and for n_way > 128: the one-hot lane-mask accumulation only addresses
    # the first 128 output lanes (never hit by few-shot configs)
    if use_pallas and _on_tpu() and class_k.shape[0] <= _LANES:
        return _tct_attention_fused(q_k, q_v, class_k, class_v)
    return tct_attention_xla(q_k, q_v, class_k, class_v)
