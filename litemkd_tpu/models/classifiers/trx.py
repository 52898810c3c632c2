"""TRX classifier family.

Episodic metric heads over per-frame features. Calling convention (all heads):

    head(context_features, context_labels, target_features, train=...)
      → logits: (Q, way) array, or a dict of branch logits.

``context_features`` is either a (way*shot, T, D) array or a two-stream dict
``{'f1': ..., 'f2': ...}`` from a 2fc backbone; same for targets.

Reference behavior being reproduced (cited per class below):
- ``TRX`` / ``TRX_fixed``: one TCT (``model/classifiers/TRX.py:167-211``)
- ``TRX_sup`` (+fixed): TCT also emitting per-class prototype cosine
  similarities (``model/classifiers/TRX_sup.py:140-229``)
- ``TRX_2fc``: one shared TCT on both streams (``TRX_2fc.py:163-192``)
- ``TRX_2fcsup`` (+fixed): the paper's head — shared TCT on stream1 → 'kl',
  stream2 → 'ce', SupportDK on stream2 → 'sup' (``TRX_2fcsup.py:191-256``)

"fixed" variants share the architecture; gradient freezing is applied at the
call site with ``jax.lax.stop_gradient`` (the JAX analog of ``torch.no_grad``).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.tct import TemporalCrossTransformer
from ...ops.distances import support_dk_logits, safe_norm
from ...ops.dtypes import anchor


class TRX(nn.Module):
    """Single temporal-cross-transformer head → (Q, way) logits."""

    way: int
    shot: int
    seq_len: int
    in_dim: int = 2048
    out_dim: int = 1152
    set_size: int = 2
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def _tct(self, **kw):
        return TemporalCrossTransformer(
            way=self.way, shot=self.shot, seq_len=self.seq_len,
            in_dim=self.in_dim, out_dim=self.out_dim, set_size=self.set_size,
            dropout=self.dropout, compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            name="transformers", **kw)

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        return self._tct()(context, context_labels, target, train=train)


class TRX_sup(TRX):
    """TCT emitting both query logits and support-prototype similarities.

    'support_set' is the (Q, way, way) cosine-similarity matrix between the
    query-specific class prototype vectors (flattened over tuples × dk).
    """

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        logits, proto = self._tct(return_prototypes=True)(
            context, context_labels, target, train=train)
        # proto: (Q, W, U, dk) → flatten per class, cosine over class pairs
        q, w = proto.shape[0], proto.shape[1]
        flat = anchor(proto.reshape(q, w, -1))
        norm = flat / (safe_norm(flat, -1, keepdims=True) + 1e-8)
        sim = jnp.einsum("qid,qjd->qij", norm, norm)
        return {"support_set": sim, "query": logits}


class TRX_2fc(TRX):
    """One shared TCT applied to both feature streams → {'fc_1','fc_2'}."""

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        tct = self._tct()
        return {
            "fc_1": tct(context["f1"], context_labels, target["f1"], train=train),
            "fc_2": tct(context["f2"], context_labels, target["f2"], train=train),
        }


class TRX_2fcsup(TRX):
    """The paper's student head: shared TCT over both streams + SupportDK.

    stream1 → 'kl' (mimics the teacher), stream2 → 'ce' (ground-truth branch),
    SupportDK(stream2) → 'sup' (support-level class relations).
    """

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        tct = self._tct()
        kl = tct(context["f1"], context_labels, target["f1"], train=train)
        ce = tct(context["f2"], context_labels, target["f2"], train=train)
        sup = support_dk_logits(context["f2"], context_labels,
                                self.way, self.shot, self.seq_len)
        return {"kl": kl, "ce": ce, "sup": sup}


class TRX_2fcsup_fixed(TRX):
    """Teacher head over fused features (single stream): TCT → 'kl',
    SupportDK → 'sup' (``TRX_2fcsup.py:226-256``). Freeze via stop_gradient
    at the call site."""

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        kl = self._tct()(context, context_labels, target, train=train)
        sup = support_dk_logits(context, context_labels,
                                self.way, self.shot, self.seq_len)
        return {"kl": kl, "sup": sup}


# single-stream student head: identical body to the fixed teacher head
# (TCT → 'kl' + SupportDK → 'sup'); trainability is the call site's choice
# (stop_gradient), so one class serves both registry names
TRX_1fc_sup = TRX_2fcsup_fixed


class TRX_2fcsup_2(TRX):
    """TRX_2fcsup with SupportDK on BOTH streams — pairs with the
    ``fc_2_sup_2`` distiller (distillers.py:501-548).

    The release never shipped this head's source (`model_select.py:190`
    registers it and `classifiers/__init__.py:17` lists it in ``__all__``
    without importing it, so selecting it crashes); its behavior is
    recovered from the repository's compiled
    ``__pycache__/TRX_2fcsup_2.cpython-37.pyc`` (forward @ line 205):
    one shared TCT on both streams (kl/ce) plus SupportDK per stream
    (sup_kl/sup_ce). The compiled ``TRX_2fcsup_2_fixed`` teacher variant is
    behaviorally identical to :class:`TRX_2fcsup_fixed`."""

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        tct = self._tct()
        kl = tct(context["f1"], context_labels, target["f1"], train=train)
        ce = tct(context["f2"], context_labels, target["f2"], train=train)
        sup_kl = support_dk_logits(context["f1"], context_labels,
                                   self.way, self.shot, self.seq_len)
        sup_ce = support_dk_logits(context["f2"], context_labels,
                                   self.way, self.shot, self.seq_len)
        return {"kl": kl, "ce": ce, "sup_kl": sup_kl, "sup_ce": sup_ce}
