"""OTAM: ordered temporal alignment with soft-DTW cumulative distances.

Rebuild of ``CNN_OTAM`` / ``OTAM_cum_dist`` (``teacher/code/model.py:
3271-3344``): per-frame cosine distance matrices between query and support
videos, a smoothed DTW band recursion in both directions, class-mean distances
and softmax(-dist) logits.

The recursion is sequential over the (static, 8-frame) time axis; it unrolls
at trace time into a fixed dataflow graph — no dynamic control flow reaches
XLA. Row 0 uses the plain running sum and column 0 stays zero, matching the
reference's simplified (non-relaxed) first row.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .distances import safe_norm
from .dtypes import anchor


def otam_cum_dist(dists: jnp.ndarray, lbda: float = 0.1) -> jnp.ndarray:
    """dists (Q, S, L, M) frame distances → (Q, S) cumulative distances.

    Pads the last axis with one zero column each side, then runs the banded
    soft-min recursion of the reference (model.py:3271-3300)."""
    q, s, L, M = dists.shape
    d = jnp.pad(dists, ((0, 0), (0, 0), (0, 0), (1, 1)))
    Mp = M + 2

    def softmin(*xs):
        # min-subtracted log-sum-exp: identical to -λ·log(Σ exp(-x/λ)) in
        # real arithmetic but NaN-free — the naive form underflows to
        # log(0) = -inf once cumulative distances exceed ~λ·88 in fp32
        stacked = jnp.stack(xs)
        m = jnp.min(stacked, axis=0)
        return m - lbda * jnp.log(
            jnp.sum(jnp.exp(-(stacked - m) / lbda), axis=0))

    # cum is built row by row; each row is a list of (Q, S) cells
    zeros = jnp.zeros((q, s), dists.dtype)
    prev_row = [zeros]
    for m in range(1, Mp):
        prev_row.append(d[:, :, 0, m] + prev_row[m - 1])

    for l in range(1, L):
        row = [zeros]  # column 0 is never assigned → stays 0
        row.append(d[:, :, l, 1] + softmin(prev_row[0], prev_row[1], row[0]))
        for m in range(2, Mp - 1):
            row.append(d[:, :, l, m] + softmin(prev_row[m - 1], row[m - 1]))
        row.append(d[:, :, l, Mp - 1] + softmin(prev_row[Mp - 2],
                                                prev_row[Mp - 1], row[Mp - 2]))
        prev_row = row

    return prev_row[-1]


def otam_logits(support: jnp.ndarray, support_labels: jnp.ndarray,
                queries: jnp.ndarray, way: int, shot: int,
                lbda: float = 0.1, eps: float = 0.01) -> jnp.ndarray:
    """(WS, T, D), (WS,), (Q, T, D) → (Q, way) softmaxed OTAM logits.

    Cosine uses the reference's ``cos_sim`` semantics — ``x·y/(|x||y|+0.01)``
    (model.py:3260-3268), which also damps near-zero-norm frames — with the
    gradient-safe ``sqrt(Σx²+1e-16)`` norm (CLAUDE.md convention). The
    reference's NaN-feature guard (model.py:3321-3324: return zero logits
    when support features contain NaN, so one bad episode can't poison the
    summed batch loss) is reproduced below."""
    q_n, t, dim = queries.shape
    s_n = support.shape[0]
    bad = jnp.any(jnp.isnan(support))
    # sanitize the SUPPORT features before the math: masking only the output
    # would still leak NaN through the backward pass (0·NaN = NaN in the
    # cotangent chain). Query NaN is deliberately NOT sanitized — the
    # reference guards only support (model.py:3321-3324), so corrupted query
    # data stays loudly NaN instead of training silently on zero-filled frames
    qf = anchor(queries.reshape(q_n * t, dim))
    sf = jnp.nan_to_num(anchor(support.reshape(s_n * t, dim)))
    qnorm = safe_norm(qf, -1, keepdims=True)
    snorm = safe_norm(sf, -1, keepdims=True)
    sim = (qf @ sf.T) / (qnorm @ snorm.T + eps)          # (QT, ST)
    dists = 1.0 - sim.reshape(q_n, t, s_n, t).transpose(0, 2, 1, 3)  # (Q,S,T,T)

    cum = otam_cum_dist(dists, lbda) + \
        otam_cum_dist(dists.transpose(0, 1, 3, 2), lbda)  # both directions

    # class means via stable sort (same trick as the TCT head)
    order = jnp.argsort(support_labels, stable=True)
    cum_sorted = jnp.take(cum, order, axis=1).reshape(q_n, way, shot)
    class_dists = cum_sorted.mean(axis=-1)               # (Q, way)
    logits = jax.nn.softmax(-class_dists, axis=-1)
    return jnp.where(bad, jnp.zeros_like(logits), logits)
