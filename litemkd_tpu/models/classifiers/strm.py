"""STRM classifier heads.

``strmclassifiers_resnet18`` (``model/classifiers/strmclassifiers_res18.py:
257-288``): patch-stream STRMDistance + frame-stream TCT → {'pat','fr'}.
``strmclassifiers_resnet18_sup`` (``strm_res18_sup.py:289-327``): shared TCT
on trx1/trx2 + STRMDistance + SupportDK → {'pat','fr1','fr2','sup'}.
``strm_1fc_sup``: single frame stream + SupportDK → {'pat','fr','sup'}.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ...ops.tct import TemporalCrossTransformer
from ...ops.strm import STRMDistance
from ...ops.distances import support_dk_logits


class STRMClassifier(nn.Module):
    way: int
    shot: int
    seq_len: int
    in_dim: int = 2048
    out_dim: int = 1152
    set_size: int = 2
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def _tct(self):
        return TemporalCrossTransformer(
            way=self.way, shot=self.shot, seq_len=self.seq_len,
            in_dim=self.in_dim, out_dim=self.out_dim, set_size=self.set_size,
            dropout=self.dropout, compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            name="transformers")

    def _distance(self):
        return STRMDistance(way=self.way, shot=self.shot, seq_len=self.seq_len,
                            in_dim=self.in_dim, set_size=self.set_size,
                            dropout=self.dropout, name="distance")

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        pat = self._distance()(context["distance"], context_labels,
                               target["distance"], train=train)
        fr = self._tct()(context["trx"], context_labels, target["trx"],
                         train=train)
        return {"pat": pat, "fr": fr}


class STRMClassifierSup(STRMClassifier):
    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        pat = self._distance()(context["distance"], context_labels,
                               target["distance"], train=train)
        tct = self._tct()
        fr1 = tct(context["trx1"], context_labels, target["trx1"], train=train)
        fr2 = tct(context["trx2"], context_labels, target["trx2"], train=train)
        sup = support_dk_logits(context["trx2"], context_labels,
                                self.way, self.shot, self.seq_len)
        return {"pat": pat, "fr1": fr1, "fr2": fr2, "sup": sup}


class STRM1FCSup(STRMClassifier):
    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        pat = self._distance()(context["distance"], context_labels,
                               target["distance"], train=train)
        fr = self._tct()(context["trx"], context_labels, target["trx"],
                         train=train)
        sup = support_dk_logits(context["trx"], context_labels,
                                self.way, self.shot, self.seq_len)
        return {"pat": pat, "fr": fr, "sup": sup}
