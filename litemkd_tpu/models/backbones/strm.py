"""STRM student backbones.

``strm18_student`` (``model/backbone/strm18_student.py:207-294``): resnet18
trunk → patch attention (SelfAttnBot over the 16 pooled patches at trunk
width) → patch mean → 512→2048 lift → the pre-enrichment stream is the
'distance' (patch) output; MLPMixEnrich over frames then fc1/fc2 give the
'trx1'/'trx2' streams.

``strmbackbone`` (``strmbackbone.py:207-309``): same with a single 'trx'
stream (pre-fc enriched features).
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax.numpy as jnp
import flax.linen as nn

from .resnet import ResNetTrunk, adaptive_max_pool_2d, flatten_clip_frames
from ...ops.dtypes import anchor
from ...ops.strm import SelfAttnBot, MLPMixEnrich
from ...ops.torch_init import torch_linear_kernel_init, torch_linear_bias_init


class STRMBackbone(nn.Module):
    """Clips → {'distance', 'trx1', 'trx2'} (two_fc) or {'distance', 'trx'}."""

    depth: int = 18
    num_fc: int = 2              # 2 → trx1/trx2; 1 → single 'trx' stream
    out_dim: int = 2048
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    freeze_bn: bool = False
    # PE dropout inside the enrichment blocks. The reference HARDCODES 0.1
    # here regardless of --trans_dropout (model.py:512 / strm18_student.py:
    # 119,176); we thread cfg.model.trans_dropout instead — identical at the
    # canonical 0.1 default, and lets dropout-off runs (goldens, finetune)
    # actually be deterministic. Same policy the classifier-side
    # STRMDistance already follows (models/classifiers/strm.py).
    dropout: float = 0.1

    @nn.compact
    def __call__(self, clips: jnp.ndarray, *, train: bool) -> Dict[str, jnp.ndarray]:
        x, b, t = flatten_clip_frames(clips, self.compute_dtype)
        x = ResNetTrunk(self.depth, self.compute_dtype, self.remat,
                        self.freeze_bn, name="trunk")(x, train=train)
        x = anchor(adaptive_max_pool_2d(x, (4, 4)))
        trunk_dim = x.shape[-1]
        x = x.reshape(b * t, 16, trunk_dim)
        x = SelfAttnBot(trunk_dim, 16, dropout=self.dropout,
                        name="attn_pat")(x, train=train)
        x = x.mean(axis=1)                                   # (BT, trunk)
        lift = nn.Dense(self.out_dim, dtype=x.dtype,
                        kernel_init=torch_linear_kernel_init(),
                        bias_init=torch_linear_bias_init(trunk_dim),
                        name="lift")
        x = lift(x).reshape(b, t, self.out_dim)
        pat = x                                              # pre-enrichment
        fr = MLPMixEnrich(self.out_dim, t, dropout=self.dropout,
                          name="fr_enrich")(x, train=train)
        dense = partial(nn.Dense, self.out_dim, dtype=fr.dtype,
                        kernel_init=torch_linear_kernel_init(),
                        bias_init=torch_linear_bias_init(self.out_dim))
        if self.num_fc == 2:
            return {"distance": pat,
                    "trx1": dense(name="fc1")(fr),
                    "trx2": dense(name="fc2")(fr)}
        return {"distance": pat, "trx": fr}
