"""CTX head: temporal self-attention encoding + frame-level cross transformer.

The student registry's ``CTX`` is shipped by the release ONLY as bytecode
(``model/classifiers/__pycache__/CTX.cpython-37.pyc`` — no ``.py``; read with
``tools/pyc_reader.py``). That compiled classifier is the parity target here:

- ``Time_Transformer`` (pyc lines 69-92): trainable PE → transpose(0,1) →
  2-layer nhead-8 TransformerEncoder → ``dropout(f1(·))`` with an in→in
  Linear. The transpose means it attends over TIME — which settles the
  ambiguity in the teacher-side copy (``teacher/code/model.py:2819-2839``):
  that one omits the transpose (attending across videos, batch-composition-
  dependent) and never calls its ``f1``; the compiled classifier shows the
  intended behavior, and we follow it.
- ``TemporalCrossTransformer_gai`` (pyc lines 95-178): the TCT over single
  frames instead of frame pairs — here the shared TCT with ``set_size=1``.
- ``CTX.forward`` (pyc line 202): time-encode both sides, then the
  frame-level TCT → {'logits'}.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ...ops.positional import TrainablePE
from ...ops.tct import TemporalCrossTransformer
from ...ops.torch_init import torch_linear_kernel_init, torch_linear_bias_init
from ..teacher.fusion import Encoder


class TimeTransformer(nn.Module):
    """PE → time-axis encoder → f1 → dropout (compiled CTX.py:69-92).

    ``video_axis=True`` + ``apply_f1=False`` is the TEACHER-half variant
    (teacher/code/model.py:2819-2838): that copy omits both the transpose
    (video-axis attention) and the ``f1``/dropout application (constructed
    but dead in its forward) — used by the ``CTX_videoaxis`` classifier so
    teacher-trained CTX checkpoints reproduce their own logits."""

    d: int = 2048
    depth: int = 2
    nhead: int = 8
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    video_axis: bool = False
    apply_f1: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool):
        t = x.shape[-2]
        x = TrainablePE(t, self.d, self.dropout, name="pe")(x, train=train)
        x = Encoder(self.d, self.nhead, self.depth, self.dropout,
                    self.compute_dtype, video_axis=self.video_axis,
                    name="encoder")(x, train)
        if not self.apply_f1:
            return x
        x = nn.Dense(self.d, kernel_init=torch_linear_kernel_init(),
                     bias_init=torch_linear_bias_init(self.d),
                     name="f1")(x)
        return nn.Dropout(self.dropout, deterministic=not train,
                          name="drop")(x)


class CTXClassifier(nn.Module):
    way: int
    shot: int
    seq_len: int
    in_dim: int = 2048
    out_dim: int = 1152
    set_size: int = 1          # frame-level attention (TCT_gai)
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    video_axis: bool = False   # teacher-half CTX: video-axis encoder, dead f1

    @nn.compact
    def __call__(self, context, context_labels, target, train: bool):
        tt = TimeTransformer(self.in_dim, dropout=self.dropout,
                             compute_dtype=self.compute_dtype,
                             video_axis=self.video_axis,
                             apply_f1=not self.video_axis,
                             name="time_trans")
        ctx = tt(context, train=train)
        tgt = tt(target, train=train)
        return TemporalCrossTransformer(
            way=self.way, shot=self.shot, seq_len=self.seq_len,
            in_dim=self.in_dim, out_dim=self.out_dim,
            set_size=self.set_size, dropout=self.dropout,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            name="transformers")(ctx, context_labels, tgt, train=train)


class CTXVideoAxis(CTXClassifier):
    """TEACHER-half CTX head (model.py:2938-3014): video-axis
    TimeTransformer with its f1 dead — see TimeTransformer. Registered as
    ``CTX_videoaxis`` so reference-trained teacher CTX checkpoints reproduce
    their own logits; ``CTX`` (the compiled student head's time-axis intent)
    stays the default."""

    video_axis: bool = True
