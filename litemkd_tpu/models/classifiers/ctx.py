"""CTX head: temporal self-attention encoding + frame-level cross transformer.

Rebuild of the reference's ``CTX`` pipeline pieces (``teacher/code/model.py``):
``TimeTransformer`` (l.2819-2839: trainable PE + 2-layer nhead-8 encoder) and
``CrossTransformer`` (l.2840-2936: a TCT over single frames instead of frame
pairs — here simply the shared TCT with ``set_size=1``).

Documented divergence: the released TimeTransformer omits
``batch_first=True`` (l.2828), so torch attends across the N videos at each
frame position instead of across time — batch-composition-dependent and
clearly unintended (the core fusions pass batch_first=True). We attend over
time.
"""
from __future__ import annotations

import flax.linen as nn

from ...ops.positional import TrainablePE
from ...ops.tct import TemporalCrossTransformer
from ..teacher.fusion import Encoder


class TimeTransformer(nn.Module):
    d: int = 2048
    depth: int = 2
    nhead: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool):
        t = x.shape[-2]
        x = TrainablePE(t, self.d, self.dropout, name="pe")(x, train=train)
        return Encoder(self.d, self.nhead, self.depth, self.dropout,
                       name="encoder")(x, train)


class CTXClassifier(nn.Module):
    way: int
    shot: int
    seq_len: int
    in_dim: int = 2048
    out_dim: int = 1152
    set_size: int = 1          # frame-level attention (CrossTransformer)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        tt = TimeTransformer(self.in_dim, dropout=self.dropout,
                             name="time_trans")
        ctx = tt(context, train=train)
        tgt = tt(target, train=train)
        return TemporalCrossTransformer(
            way=self.way, shot=self.shot, seq_len=self.seq_len,
            in_dim=self.in_dim, out_dim=self.out_dim,
            set_size=self.set_size, dropout=self.dropout,
            name="transformers")(ctx, context_labels, tgt, train=train)
