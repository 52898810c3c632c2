"""Spec-driven fusion composer.

The reference grows one bespoke ~100-line class per fusion permutation
(TwoTRXShuffleTime, ThreeTRXShuffleTime, ThreeTRXLRShiftLoopTime,
FourShiftFusion, FiveShiftFusion, OTAMThreeTRXShiftLoopTime, ...;
``teacher/code/model.py:1394-2262``). All of them are sums of two kinds of
branch applied to time-shifted modality streams, classified by a TRX (or OTAM)
head — so here the permutation space is one composable module driven by a
branch spec:

    branch := ("multi", modality_indices, 0)        # N-stream concat encoder
            | ("pair", (i, j), shift)               # 2-stream encoder; stream j
                                                    # rolled left by `shift`
                                                    # (negative = roll right)

Shifts are applied identically to support and query streams. (The released
reference's shuffle variants contain cat-order quirks that degenerate some
shifts to the identity — see fusion.py's MFMTeacher notes; this composer
implements the stated intent. The bug-faithful 3-modality MFM remains
available as ``MFMTeacher``.)
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .fusion import (MultiStreamFusion, ThreeStreamFusion, TwoStreamFusion,
                     TrxBranch, _roll_left, _roll_right)
from ...ops.otam import otam_logits

BranchSpec = Tuple[str, Tuple[int, ...], int]

# named presets reproducing the reference fusion classes (modality indices
# refer to positions in cfg.model.modalities, m1 first)
PRESETS: Dict[str, Tuple[BranchSpec, ...]] = {
    # model.py:1394 TwoTRX — single pair fusion
    "TwoTRX": (("pair", (0, 1), 0),),
    # model.py:1499 TwoTRXShuffleTime — plain + shifted pair
    "TwoTRXShuffleTime": (("pair", (0, 1), 0), ("pair", (0, 1), 1)),
    # model.py:1539 ThreeTRXShuffleTime — plain + shifted pairs per modality
    "ThreeTRXShuffleTime": (("pair", (0, 1), 0), ("pair", (0, 1), 1),
                            ("pair", (0, 2), 0), ("pair", (0, 2), 1)),
    # model.py:1588 ThreeTRXShiftLoopTime (MFM intent: m2 left, m3 right)
    "ThreeTRXShiftLoopTime": (("multi", (0, 1, 2), 0), ("pair", (0, 1), 1),
                              ("pair", (0, 2), -1)),
    # model.py:2209 ThreeTRXLRShiftLoopTime — left and right shifts
    "ThreeTRXLRShiftLoopTime": (("pair", (0, 1), 0), ("pair", (0, 1), 1),
                                ("pair", (0, 2), -1)),
    # model.py:1712 / 1797 Four/FiveShiftFusion
    "FourShiftFusion": (("multi", (0, 1, 2, 3), 0), ("pair", (0, 1), 1),
                        ("pair", (0, 2), -1), ("pair", (0, 3), 1)),
    "FiveShiftFusion": (("multi", (0, 1, 2, 3, 4), 0), ("pair", (0, 1), 1),
                        ("pair", (0, 2), -1), ("pair", (0, 3), 1),
                        ("pair", (0, 4), -1)),
}


def _shift(x, s: int):
    if s > 0:
        return _roll_left(x, s)
    if s < 0:
        return _roll_right(x, -s)
    return x


class ComposedFusionTeacher(nn.Module):
    """Sum-of-branches fusion over modality dicts, TRX or OTAM head.

    ``__call__(context_feats, context_labels, target_feats, train)`` →
    ``{'logits': (Q, way)}``; ``extract(feats)`` → fused (N, T, D).
    """

    way: int
    shot: int
    seq_len: int
    branches: Tuple[BranchSpec, ...]
    modalities: Tuple[str, ...] = ("rgb", "depth", "flow")
    in_dim: int = 2048
    out_dim: int = 1152
    temp_set: Tuple[int, ...] = (2,)
    depth: int = 2
    dropout: float = 0.1
    head: str = "trx"            # "trx" | "otam"

    def setup(self):
        mods = []
        for kind, idxs, _ in self.branches:
            if kind == "multi":
                n = len(idxs)
                if n == 3:
                    mods.append(ThreeStreamFusion(self.seq_len, self.in_dim,
                                                  self.depth, self.dropout))
                else:
                    mods.append(MultiStreamFusion(n, self.seq_len, self.in_dim,
                                                  self.depth, self.dropout))
            else:
                mods.append(TwoStreamFusion(self.seq_len, self.in_dim,
                                            self.depth, self.dropout))
        self.branch_modules = mods
        if self.head == "trx":
            self.classifier = TrxBranch(self.way, self.shot, self.seq_len,
                                        self.in_dim, self.out_dim,
                                        self.temp_set, self.dropout)

    def fuse(self, feats: Dict[str, jnp.ndarray], train: bool) -> jnp.ndarray:
        streams = [feats[m] for m in self.modalities]
        fused = None
        for module, (kind, idxs, shift) in zip(self.branch_modules,
                                               self.branches):
            if kind == "multi":
                picked = [streams[i] for i in idxs]
                out = (module(*picked, train) if len(idxs) == 3
                       else module(picked, train))
            else:
                i, j = idxs
                out = module(streams[i], _shift(streams[j], shift), train)
            fused = out if fused is None else fused + out
        return fused

    def __call__(self, context_feats, context_labels, target_feats, train: bool):
        fused_ctx = self.fuse(context_feats, train)
        fused_tgt = self.fuse(target_feats, train)
        if self.head == "otam":
            logits = otam_logits(fused_ctx, context_labels, fused_tgt,
                                 self.way, self.shot)
        else:
            logits = self.classifier(fused_ctx, context_labels, fused_tgt,
                                     train)
        return {"logits": logits}

    def extract(self, feats: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        return self.fuse(feats, train=False)
