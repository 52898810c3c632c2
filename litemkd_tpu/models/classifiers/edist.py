"""Euclidean / cosine metric heads (ProtoNet-style).

Reference: ``model/classifiers/e_dist.py``, ``e_dist_fc2.py``, ``COS.py``.
All are parameter-free; they are flax modules only for a uniform calling
convention with the TRX family.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ...ops.distances import edist_logits, cosine_logits, support_dk_logits


class EDist(nn.Module):
    """Frame-mean euclidean matcher (``e_dist.py:16-61``)."""

    way: int
    shot: int
    seq_len: int

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        return edist_logits(context, context_labels, target, self.way, self.shot)


class CosDistance(nn.Module):
    """Reference 'CosDistance' (``COS.py:23-62``). NOTE: the released code
    computes *euclidean* cdist despite the name; we reproduce that. Set
    ``true_cosine=True`` for an actual cosine matcher."""

    way: int
    shot: int
    seq_len: int
    true_cosine: bool = False

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        if self.true_cosine:
            return cosine_logits(context, context_labels, target, self.way, self.shot)
        return edist_logits(context, context_labels, target, self.way, self.shot)


class EDistFC2(nn.Module):
    """e_dist over both streams → {'fc_1','fc_2'} (``e_dist_fc2.py:106-136``)."""

    way: int
    shot: int
    seq_len: int

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        return {
            "fc_1": edist_logits(context["f1"], context_labels, target["f1"],
                                 self.way, self.shot),
            "fc_2": edist_logits(context["f2"], context_labels, target["f2"],
                                 self.way, self.shot),
        }


class EDistFC2Sup(nn.Module):
    """e_dist streams + SupportDK → {'kl','ce','sup'} (``e_dist_fc2.py:139-172``)."""

    way: int
    shot: int
    seq_len: int

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        return {
            "kl": edist_logits(context["f1"], context_labels, target["f1"],
                               self.way, self.shot),
            "ce": edist_logits(context["f2"], context_labels, target["f2"],
                               self.way, self.shot),
            "sup": support_dk_logits(context["f2"], context_labels,
                                     self.way, self.shot, self.seq_len),
        }


class EDist1FCSup(nn.Module):
    """Single-stream e_dist + SupportDK → {'kl','sup'} (``e_dist_fc2.py:174-198``).
    Also serves as ``e_dist_fc2_sup_fixed`` (identical math, l.201-231)."""

    way: int
    shot: int
    seq_len: int

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        return {
            "kl": edist_logits(context, context_labels, target, self.way, self.shot),
            "sup": support_dk_logits(context, context_labels,
                                     self.way, self.shot, self.seq_len),
        }
