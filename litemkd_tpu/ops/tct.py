"""Vectorized Temporal Cross Transformer (TRX attention head).

Reference semantics: ``/root/reference/model/classifiers/TRX_2fcsup.py:50-160``.
The reference loops over the 5 classes in Python and applies a per-query softmax
in a list comprehension (l.116-144). Here the whole head is three einsums — one
trace, MXU-shaped, and trivially ``vmap``-able over a batch of episodes:

    scores[q,w,u,s,v] = <q_k[q,u,:], class_k[w,s,v,:]> / sqrt(dk)
    attn             = softmax over the joint (s,v) axis        # ref l.126-128
    proto[q,w,u,:]   = sum_{s,v} attn * class_v[w,s,v,:]
    logits[q,w]      = -||q_v[q] - proto[q,w]||_F^2 / n_tuples   # ref l.137-142

Faithfulness notes:
- the key LayerNorm is applied, the value LayerNorm is *not* (the reference
  defines ``norm_v`` but never uses it, l.106);
- softmax is over the concatenated (shot × tuple) axis of one class at a time,
  exactly the reference's 28×140 per-query softmax;
- support rows are class-sorted with a stable argsort — all within-class
  reductions are permutation-invariant so this matches the reference's
  mask-gather per class (l.118-119).
- NOT reproduced: the reference writes its per-class distances into a
  default-dtype ``torch.zeros`` buffer (l.116), quantizing logits to fp32
  even under ``.double()`` (same in SupportDK, l.184). Our logits keep the
  computation dtype — identical in fp32 flows, full-precision in fp64
  (the ~6e-8 rel gap is asserted as the tolerance floor of the fp64 golden
  tests in tests/test_reference_golden.py).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .dtypes import anchor_dtype
from .positional import SinusoidalPE
from .tuples import tuple_indices, gather_tuples
from .torch_init import torch_linear_kernel_init, torch_linear_bias_init


def class_sort(support: jnp.ndarray, labels: jnp.ndarray, way: int,
               shot: int) -> jnp.ndarray:
    """Sort support rows by label and reshape to (way, shot, ...).

    Episode labels are a shuffled vector containing each class exactly ``shot``
    times; a stable argsort groups them as (way, shot) with class w at row w.
    """
    order = jnp.argsort(labels, stable=True)
    sorted_support = jnp.take(support, order, axis=0)
    return sorted_support.reshape(way, shot, *support.shape[1:])


class TemporalCrossTransformer(nn.Module):
    """One TRX cross-attention head for a single episode.

    Inputs: support (way*shot, T, D), labels (way*shot,), queries (Q, T, D).
    Output: logits (Q, way) — negative squared distances.
    """

    way: int
    shot: int
    seq_len: int
    in_dim: int = 2048
    out_dim: int = 1152
    set_size: int = 2
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    return_prototypes: bool = False
    use_pallas: bool = False   # fused attention kernel (TPU; ops/pallas_tct.py)

    @nn.compact
    def __call__(self, support: jnp.ndarray, support_labels: jnp.ndarray,
                 queries: jnp.ndarray, *, train: bool):
        idx = tuple_indices(self.seq_len, self.set_size)
        n_tup = idx.shape[0]
        tuple_dim = self.set_size * self.in_dim
        dk = self.out_dim

        pe = SinusoidalPE(self.in_dim, max_len=int(self.seq_len * 1.5),
                          dropout=self.dropout)
        support = pe(support, train=train)
        queries = pe(queries, train=train)

        # (WS, U, set*D) / (Q, U, set*D)
        s_t = gather_tuples(support, idx)
        q_t = gather_tuples(queries, idx)

        k_linear = nn.Dense(dk, kernel_init=torch_linear_kernel_init(),
                            bias_init=torch_linear_bias_init(tuple_dim),
                            dtype=self.compute_dtype, name="k_linear")
        v_linear = nn.Dense(dk, kernel_init=torch_linear_kernel_init(),
                            bias_init=torch_linear_bias_init(tuple_dim),
                            dtype=self.compute_dtype, name="v_linear")
        adt = anchor_dtype(self.compute_dtype)
        norm_k = nn.LayerNorm(epsilon=1e-5, dtype=adt,  # torch eps
                              name="norm_k")

        s_k = norm_k(k_linear(s_t))
        q_k = norm_k(k_linear(q_t))
        s_v = v_linear(s_t).astype(adt)   # value LayerNorm unused (ref l.106)
        q_v = v_linear(q_t).astype(adt)

        # group support by class: (W, S, U, dk)
        class_k = class_sort(s_k, support_labels, self.way, self.shot)
        class_v = class_sort(s_v, support_labels, self.way, self.shot)

        if self.return_prototypes:
            # prototype-emitting path (TRX_sup) needs the materialized protos;
            # shares the einsum implementation with the common path
            from .pallas_tct import tct_attention_xla
            return tct_attention_xla(q_k, q_v, class_k, class_v,
                                     return_proto=True)

        from .pallas_tct import tct_attention
        return tct_attention(q_k, q_v, class_k, class_v,
                             use_pallas=self.use_pallas)


class MultiSetTCT(nn.Module):
    """Stack of TCTs over several tuple cardinalities, averaged.

    Matches ``TrxBranch``/``TRX`` with ``temp_set`` > 1 entry
    (``/root/reference/teacher/code/model.py:1094-1128``).
    """

    way: int
    shot: int
    seq_len: int
    in_dim: int = 2048
    out_dim: int = 1152
    temp_set: Tuple[int, ...] = (2,)
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, support, support_labels, queries, *, train: bool):
        logits = [
            TemporalCrossTransformer(
                way=self.way, shot=self.shot, seq_len=self.seq_len,
                in_dim=self.in_dim, out_dim=self.out_dim, set_size=s,
                dropout=self.dropout, compute_dtype=self.compute_dtype,
                use_pallas=self.use_pallas,
                name=f"tct_{s}")(support, support_labels, queries, train=train)
            for s in self.temp_set
        ]
        return jnp.mean(jnp.stack(logits, axis=-1), axis=-1)
