"""STRM enrichment blocks and the patch-level distance head.

Flax rebuilds of the STRM-style blocks used by the strm* backbones/classifiers
(``model/backbone/strm18_student.py:42-205``, ``model/classifiers/
strmclassifiers_res18.py:162-246``):

- ``TokenMLP`` / ``BottleneckMLP2`` / ``BottleneckMLP3Res``: small MLPs over
  token and channel axes;
- ``SelfAttnBot``: patch self-attention with a learned-zero gamma gate and a
  3-layer bottleneck MLP;
- ``MLPMixEnrich``: token-mixing + channel-bottleneck frame enrichment;
- ``strm_distance_logits``: the vectorized query-class tuple distance — ReLU'd
  linear projection of frame-pair tuples, per-query-tuple MIN distance over
  each class's (shot × tuple) pool, mean over query tuples, negated.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .positional import SinusoidalPE
from .dtypes import anchor
from .tuples import tuple_indices, gather_tuples
from .tct import class_sort
from .torch_init import torch_linear_kernel_init, torch_linear_bias_init


def _dense(out, fan_in, name):
    return nn.Dense(out, name=name, kernel_init=torch_linear_kernel_init(),
                    bias_init=torch_linear_bias_init(fan_in))


class TokenMLP(nn.Module):
    """2-layer MLP over the token axis (input arrives token-last)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(_dense(self.dim, self.dim, "inp_fc")(x))
        return _dense(self.dim, self.dim, "out_fc")(y)


# the reference's Bottleneck_Perceptron_2_layer is byte-identical to
# Token_Perceptron; one module serves both names (checkpoint param paths come
# from the instance name=, not the class)
BottleneckMLP2 = TokenMLP


class BottleneckMLP3Res(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = self.dim // 2
        y = nn.relu(_dense(h, self.dim, "inp_fc")(x))
        y = nn.relu(_dense(h, h, "hid_fc")(y))
        return _dense(self.dim, h, "out_fc")(y) + x


class SelfAttnBot(nn.Module):
    """Patch-level self-attention enrichment (Self_Attn_Bot)."""

    dim: int
    n_tokens: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = SinusoidalPE(self.dim, max_len=int(self.n_tokens * 1.5),
                         dropout=self.dropout, name="pe")(x, train=train)
        residual = x
        q = _dense(self.dim, self.dim, "query_proj")(x)
        k = _dense(self.dim, self.dim, "key_proj")(x)
        v = _dense(self.dim, self.dim, "value_proj")(x)
        attn = jax.nn.softmax(jnp.einsum("bqd,bkd->bqk", q, k), axis=-1)
        out = jnp.einsum("bqk,bkd->bqd", attn, v)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        out = gamma * out + residual
        return BottleneckMLP3Res(self.dim, name="bot_mlp")(out)


class MLPMixEnrich(nn.Module):
    """Frame-level token-mix + channel-bottleneck enrichment (MLP_Mix_Enrich)."""

    dim: int
    seq_len: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = SinusoidalPE(self.dim, max_len=int(self.seq_len * 1.5),
                         dropout=self.dropout, name="pe")(x, train=train)
        res1 = x
        y = TokenMLP(self.seq_len, name="tok_mlp")(x.swapaxes(-1, -2))
        y = y.swapaxes(-1, -2) + res1
        res2 = y
        return BottleneckMLP2(self.dim, name="bot_mlp")(y) + res2


class STRMDistance(nn.Module):
    """Patch-stream query-class distance logits (DistanceLoss).

    Vectorized over the reference's per-class loop: tuples → clsW projection →
    ReLU → per-(query, query-tuple) min euclidean distance over the class's
    shot×tuple pool → mean over query tuples → negative.
    """

    way: int
    shot: int
    seq_len: int
    in_dim: int = 2048
    set_size: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, support, support_labels, queries, *, train: bool):
        idx = tuple_indices(self.seq_len, self.set_size)
        u = idx.shape[0]
        tuple_dim = self.set_size * self.in_dim
        drop = nn.Dropout(self.dropout, deterministic=not train, name="drop")
        support = drop(support)
        queries = drop(queries)
        s_t = gather_tuples(support, idx)        # (WS, U, 2D)
        q_t = gather_tuples(queries, idx)        # (Q, U, 2D)
        clsW = _dense(self.in_dim // 2, tuple_dim, "clsW")
        s_e = anchor(nn.relu(clsW(s_t)))
        q_e = anchor(nn.relu(clsW(q_t)))
        class_e = class_sort(s_e, support_labels, self.way, self.shot)  # (W,S,U,h)
        class_e = class_e.reshape(self.way, self.shot * u, -1)
        # pairwise distances (Q, U, W, S*U)
        qq = jnp.sum(q_e * q_e, axis=-1)[:, :, None, None]
        ss = jnp.sum(class_e * class_e, axis=-1)[None, None, :, :]
        cross = jnp.einsum("qud,wkd->quwk", q_e, class_e)
        dist = jnp.sqrt(jnp.maximum(qq + ss - 2.0 * cross, 1e-12))
        min_d = dist.min(axis=-1)                # (Q, U, W)
        return -min_d.mean(axis=1)               # (Q, W)
