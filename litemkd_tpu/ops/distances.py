"""Metric heads: support-relation distances and prototype matchers.

Vectorized equivalents of the reference's per-class Python loops:
- ``SupportDK`` (``/root/reference/model/classifiers/TRX_2fcsup.py:162-189``)
- ``e_dist`` (``/root/reference/model/classifiers/e_dist.py:16-61``)
- ``CosDistance`` (``/root/reference/model/classifiers/COS.py:23-62``; note the
  released code computes *euclidean* cdist despite the name — we keep that
  behavior and expose a true-cosine variant separately).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from .dtypes import anchor
from .tct import class_sort


@lru_cache(maxsize=None)
def _off_diag(way: int) -> np.ndarray:
    """Static (way, way-1) column indices skipping the diagonal."""
    return np.stack([[j for j in range(way) if j != i] for i in range(way)])


def support_dk_logits(support: jnp.ndarray, support_labels: jnp.ndarray,
                      way: int, shot: int, seq_len: int) -> jnp.ndarray:
    """Support-level relation matrix: (way, way-1) of negative mean-squared
    distances between class prototypes, excluding the diagonal.

    Row i lists -||p_i - p_j||_F^2/seq_len for j != i in ascending class order,
    matching the reference's nested loop fill order.
    """
    s = class_sort(support, support_labels, way, shot)  # (W, S, T, D)
    proto = anchor(s.mean(axis=1))                      # (W, T, D)
    diff = proto[:, None] - proto[None, :]              # (W, W, T, D)
    dist = -jnp.sum(diff * diff, axis=(-2, -1)) / seq_len
    # drop the diagonal, preserving ascending-j order per row (static gather —
    # boolean masking is not vmappable)
    return jnp.take_along_axis(dist, jnp.asarray(_off_diag(way), jnp.int32),
                               axis=1)


def _cdist(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Pairwise euclidean distance (Q, D) x (S, D) → (Q, S)."""
    aa = jnp.sum(a * a, axis=-1, keepdims=True)
    bb = jnp.sum(b * b, axis=-1)
    sq = aa + bb[None, :] - 2.0 * (a @ b.T)
    return jnp.sqrt(jnp.maximum(sq, eps))


def edist_logits(support: jnp.ndarray, support_labels: jnp.ndarray,
                 queries: jnp.ndarray, way: int, shot: int) -> jnp.ndarray:
    """Mean-over-shot euclidean distance logits (Q, way).

    Frame-mean embeddings; per query, the logit for class w is the *negative
    mean* of distances to each of that class's shot embeddings (the reference
    averages the cdist row, not the prototypes).
    """
    q = anchor(queries.mean(axis=-2))                              # (Q, D)
    s = class_sort(support, support_labels, way, shot)             # (W,S,T,D)
    s = anchor(s.mean(axis=-2))                                    # (W, S, D)
    d = _cdist(q, s.reshape(way * shot, -1)).reshape(-1, way, shot)
    return -d.mean(axis=-1)


def safe_norm(x: jnp.ndarray, axis=-1, keepdims: bool = False) -> jnp.ndarray:
    """``sqrt(sum(x²)+1e-16)`` — the repo-wide gradient-safe norm
    (CLAUDE.md convention: ``jnp.linalg.norm`` has NaN gradient at exactly
    zero, reachable from uniform softmax rows / zero-filled modalities)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + 1e-16)


def cosine_logits(support: jnp.ndarray, support_labels: jnp.ndarray,
                  queries: jnp.ndarray, way: int, shot: int,
                  eps: float = 1e-8) -> jnp.ndarray:
    """True cosine-similarity logits (Q, way) against class prototypes."""
    q = anchor(queries.mean(axis=-2))
    s = class_sort(support, support_labels, way, shot).mean(axis=(1, -2))
    s = anchor(s)                                                  # (W, D)
    qn = q / (safe_norm(q, -1, keepdims=True) + eps)
    sn = s / (safe_norm(s, -1, keepdims=True) + eps)
    return qn @ sn.T
