"""Temporal tuple construction.

The TRX head attends over ordered frame *tuples* (pairs for temp-set 2, giving
C(8,2)=28 tuples; ``/root/reference/model/classifiers/TRX_2fcsup.py:68-90``).
On TPU we precompute the index matrix once (host-side numpy) and gather +
reshape in one op — no per-tuple Python loop inside the traced program.
"""
from __future__ import annotations

from itertools import combinations

import numpy as np
import jax.numpy as jnp


def tuple_indices(seq_len: int, set_size: int) -> np.ndarray:
    """(n_tuples, set_size) int32 matrix of ordered frame combinations."""
    return np.asarray(list(combinations(range(seq_len), set_size)), dtype=np.int32)


def n_tuples(seq_len: int, set_size: int) -> int:
    return tuple_indices(seq_len, set_size).shape[0]


def gather_tuples(x: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """(..., T, D) → (..., n_tuples, set_size*D).

    Concatenates the features of each tuple's frames along the channel axis,
    matching ``torch.index_select(...).reshape(n, -1)`` in the reference.
    """
    g = jnp.take(x, jnp.asarray(idx), axis=-2)       # (..., n_tuples, set_size, D)
    return g.reshape(*g.shape[:-2], g.shape[-2] * g.shape[-1])
