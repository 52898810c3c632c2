"""OTAM and multi-tuple-set classifier heads.

``OTAMClassifier`` = ``CNN_OTAM`` (``teacher/code/model.py:3312-3344``).
``TRXMulti`` = the multi-cardinality TCT stack used by ``TRM`` / ``TrxBranch``
(``model.py:886-975, 1094-1128``) — logits averaged over temp-set sizes.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.otam import otam_logits
from ...ops.tct import MultiSetTCT


class OTAMClassifier(nn.Module):
    way: int
    shot: int
    seq_len: int
    lbda: float = 0.1

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        return otam_logits(context, context_labels, target, self.way,
                           self.shot, self.lbda)


class TRXMulti(nn.Module):
    way: int
    shot: int
    seq_len: int
    in_dim: int = 2048
    out_dim: int = 1152
    temp_set: Tuple[int, ...] = (2, 3)
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        return MultiSetTCT(way=self.way, shot=self.shot, seq_len=self.seq_len,
                           in_dim=self.in_dim, out_dim=self.out_dim,
                           temp_set=self.temp_set, dropout=self.dropout,
                           compute_dtype=self.compute_dtype,
                           use_pallas=self.use_pallas,
                           name="transformers")(context, context_labels,
                                                target, train=train)
