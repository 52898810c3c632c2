"""Spec-driven fusion composer.

The reference grows one bespoke ~100-line class per fusion permutation
(TwoTRXShuffleTime, ThreeTRXShuffleTime, ThreeTRXLRShiftLoopTime,
Four/FiveShiftFusion, TwoCross, ThreeCross, TwoCombination*,
ThreeCombinationTRX, ThreeFusion3, TwoFusionBatchFusion, ...;
``teacher/code/model.py:1394-2719``). All of them combine a handful of branch
types applied to (optionally time-shifted) modality streams, classified by a
TRX (or OTAM) head — so here the permutation space is one composable module
driven by branch specs:

    Branch(kind, idxs, shift=0, share=None, sides=(1, 1), depth=None)

    kind  := "pair"   2-stream concat encoder (TwoTransforFusion)
           | "multi"  N-stream concat encoder (Three/FourTransforTemproal;
                      ``depth`` overrides trans_num, e.g. ThreeTransforTask's
                      hardcoded 2 layers)
           | "cross"  BERT cross attention (transformer.py BertAttention)
           | "self"   per-stream plain encoder (ThreeFusion3's ``tran``)
           | "batch"  scalar-stat shift fusion (BatchTwoFusion)
    idxs  := modality indices (positions in ``modalities``; m1 first)
    shift := int — circular roll of the *last* stream, applied identically to
             support and query (positive = roll left) — or a per-side pair
             ``((mode, s), (mode, s))`` with mode "roll"|"pad" (zero-filled),
             support spec first
    share := branches with the same key share ONE parameterized module (the
             reference reuses a single ``self.fusion`` across its pair
             branches — sharing is part of the architecture)
    sides := which of (support, query) include this branch — e.g.
             TwoCombinationTemTroShiftTRX adds its 3-stream branch to the
             support fusion only (model.py:2192-2204)

Branch outputs combine by summation (``combine="sum"``) or by a shared
cross-attention combiner (``combine="cross"``, ThreeCross model.py:1486-1492);
``post="mlp"`` applies ThreeFusion3's bottleneck MLP to the combined fusion
(model.py:2582-2584).

Two preset families: the intent presets (bare class names) implement what
each reference class *states* it does; the ``*_faithful`` presets reproduce
the released code's cat-order quirks bit-for-bit (several "shuffles"
re-concatenate the split halves in original order and degenerate to the
identity, and some shift only the support side — noted per preset). The
bug-faithful 3-modality MFM is ``MFMTeacher`` (fusion.py); the bespoke
two-road head is ``TwoRoadFusionTeacher``.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from .fusion import (BatchStatFusion, CrossAttentionFusion, MultiStreamFusion,
                     SelfEncoderBranch, ThreeStreamFusion, TwoStreamFusion,
                     TrxBranch, _roll_left, _roll_right)
from ...ops.otam import otam_logits

SideShift = Tuple[str, int]                     # ("roll"|"pad", frames)
ShiftSpec = Union[int, Tuple[SideShift, SideShift]]


class Branch(NamedTuple):
    kind: str
    idxs: Tuple[int, ...]
    shift: ShiftSpec = 0
    share: Optional[str] = None
    sides: Tuple[int, int] = (1, 1)
    depth: Optional[int] = None
    nhead: int = 0    # multi branches: 0 → per-arity default head count
    # bug-faithful released-encoder quirks (multi/self branches; see
    # fusion.Encoder.video_axis / MultiStreamFusion.shared_last_pe)
    video_axis: bool = False
    shared_last_pe: bool = False


BranchSpec = Union[Branch, Tuple]   # plain (kind, idxs, shift) tuples accepted

# named presets reproducing the reference fusion classes (modality indices
# refer to positions in cfg.model.modalities, m1 first; shift amounts bake the
# canonical shirt_num=1 of every released script). Pair/cross branches within
# one preset share a single fusion module exactly where the reference reuses
# one ``self.fusion`` for several calls.
PRESETS: Dict[str, Tuple[BranchSpec, ...]] = {
    # model.py:1394 TwoTRX — single pair fusion
    "TwoTRX": (Branch("pair", (0, 1)),),
    # model.py:1430 TwoCross — single BERT cross-attention fusion
    "TwoCross": (Branch("cross", (0, 1)),),
    # model.py:1462 ThreeCross — fusion1(m1,m2) and fusion1(m1,m3) (one shared
    # module) combined by a second cross attention (see PRESET_OPTIONS)
    "ThreeCross": (Branch("cross", (0, 1), share="f1"),
                   Branch("cross", (0, 2), share="f1")),
    # model.py:1499 TwoTRXShuffleTime — plain + shifted pair, one shared fusion
    "TwoTRXShuffleTime": (Branch("pair", (0, 1), 0, "f"),
                          Branch("pair", (0, 1), 1, "f")),
    # model.py:3083 TwoCTXShuffleTime — the same plain + shifted shared pair
    # fusion, classified by CTXBranch (a FRAME-level TCT, model.py:3045-3077)
    # instead of TrxBranch → head="ctx" (PRESET_OPTIONS)
    "TwoCTXShuffleTime": (Branch("pair", (0, 1), 0, "f"),
                          Branch("pair", (0, 1), 1, "f")),
    # as released (model.py:3101-3108): support rolled left by shirt_num; the
    # query side cat((first frames, rest)) == identity
    "TwoCTXShuffleTime_faithful": (
        Branch("pair", (0, 1), 0, "f"),
        Branch("pair", (0, 1), (("roll", 1), ("roll", 0)), "f")),
    # as released (model.py:1516-1523): support rolled left by shirt_num, but
    # the query side re-concatenates (prefix, rest) == identity
    "TwoTRXShuffleTime_faithful": (
        Branch("pair", (0, 1), 0, "f"),
        Branch("pair", (0, 1), (("roll", 1), ("roll", 0)), "f")),
    # model.py:1539 ThreeTRXShuffleTime — plain + shifted pairs per modality
    "ThreeTRXShuffleTime": (Branch("pair", (0, 1), 0, "f"),
                            Branch("pair", (0, 1), 1, "f"),
                            Branch("pair", (0, 2), 0, "f"),
                            Branch("pair", (0, 2), 1, "f")),
    # as released (model.py:1556-1566): exactly 3 branches; the shifts are
    # ZERO-PADDED (F.pad) with the amount hardcoded to 1 frame, m2 left and
    # m3 right, both sides; there is no unshifted third-modality branch
    "ThreeTRXShuffleTime_faithful": (
        Branch("pair", (0, 1), 0, "f"),
        Branch("pair", (0, 1), (("pad", 1), ("pad", 1)), "f"),
        Branch("pair", (0, 2), (("pad", -1), ("pad", -1)), "f")),
    # model.py:2262 ThreeStrm — despite the name, no STRM blocks: just the
    # 3-stream encoder (ThreeTransforTemproal) into the TRX branch
    "ThreeStrm": (Branch("multi", (0, 1, 2)),),
    # model.py:2335 FourStrm — FourTransforFusion: nhead=4, 2 layers fixed.
    # Documented divergences from the release (see PARITY.md): the released
    # encoder omits batch_first (video-axis attention), and it applies
    # positionEncoding3 to BOTH streams 3 and 4 (model.py:1218-1219 —
    # positionEncoding4 is constructed but dead); we give stream 4 its own PE
    "FourStrm": (Branch("multi", (0, 1, 2, 3), depth=2, nhead=4),),
    # model.py:1588 ThreeTRXShiftLoopTime (MFM intent: m2 left, m3 right);
    # the released quirk version (identity third shift) is MFMTeacher
    "ThreeTRXShiftLoopTime": (Branch("multi", (0, 1, 2)),
                              Branch("pair", (0, 1), 1, "f"),
                              Branch("pair", (0, 2), -1, "f")),
    # model.py:2209 ThreeTRXLRShiftLoopTime — left and right shifts
    "ThreeTRXLRShiftLoopTime": (Branch("pair", (0, 1), 0, "f"),
                                Branch("pair", (0, 1), 1, "f"),
                                Branch("pair", (0, 2), -1, "f")),
    # as released (model.py:2224-2240): m2 support rolled left / query
    # identity; m3 support cat((prefix, rest)) == identity but m3 QUERY is
    # cat((rest, prefix)) == rolled left — the sides shift in OPPOSITE
    # corners (verified against the executing class,
    # tests/test_reference_golden_fusion.py)
    "ThreeTRXLRShiftLoopTime_faithful": (
        Branch("pair", (0, 1), 0, "f"),
        Branch("pair", (0, 1), (("roll", 1), ("roll", 0)), "f"),
        Branch("pair", (0, 2), (("roll", 0), ("roll", 1)), "f")),
    # model.py:1712 / 1797 Four/FiveShiftFusion
    "FourShiftFusion": (Branch("multi", (0, 1, 2, 3)),
                        Branch("pair", (0, 1), 1, "f"),
                        Branch("pair", (0, 2), -1, "f"),
                        Branch("pair", (0, 3), 1, "f")),
    # as released (model.py:1731-1754): only m2 is genuinely rolled; the m3/m4
    # cat((suffix, rest)) degenerates to identity on both sides
    "FourShiftFusion_faithful": (
        Branch("multi", (0, 1, 2, 3)), Branch("pair", (0, 1), 1, "f"),
        Branch("pair", (0, 2), 0, "f"), Branch("pair", (0, 3), 0, "f")),
    # NOTE: the released FiveShiftFusion's multi branch is the THREE-stream
    # encoder over (m1,m2,m3) only (model.py:1803: three_fusion =
    # ThreeTransforTemproal, called at l.1852 with first/second/third) — no
    # five-stream encoder exists in the reference, so both variants keep it
    "FiveShiftFusion": (Branch("multi", (0, 1, 2)),
                        Branch("pair", (0, 1), 1, "f"),
                        Branch("pair", (0, 2), -1, "f"),
                        Branch("pair", (0, 3), 1, "f"),
                        Branch("pair", (0, 4), -1, "f")),
    # as released (model.py:1818-1849): m2 and m5 rolled left, m3/m4 identity
    "FiveShiftFusion_faithful": (
        Branch("multi", (0, 1, 2)), Branch("pair", (0, 1), 1, "f"),
        Branch("pair", (0, 2), 0, "f"), Branch("pair", (0, 3), 0, "f"),
        Branch("pair", (0, 4), 1, "f")),
    # model.py:1990 TwoCombinationTRX — (m1,m2) + (m1,m3), one shared fusion
    "TwoCombinationTRX": (Branch("pair", (0, 1), 0, "f"),
                          Branch("pair", (0, 2), 0, "f")),
    # model.py:2022 TwoCombinationCTX — same but BERT cross attention
    "TwoCombinationCTX": (Branch("cross", (0, 1), 0, "f1"),
                          Branch("cross", (0, 2), 0, "f1")),
    # model.py:2054 ThreeCombinationTRX — 3 pairs vs m1, one shared fusion
    "ThreeCombinationTRX": (Branch("pair", (0, 1), 0, "f"),
                            Branch("pair", (0, 2), 0, "f"),
                            Branch("pair", (0, 3), 0, "f")),
    # model.py:3462 ThreeTRXCombination (the scripts' "combination_r+d+f"
    # model, distinct from ThreeCombinationTRX above): MFM's branch set with
    # NO time shift in the live forward (second/third streams go into the
    # shared pair fusion unshifted, model.py:3483-3489). Its dump path
    # left-rolls BOTH m2 and m3 (model.py:3513-3520) — see PRESET_EXTRACT;
    # its extract_task_feature crashes as released (6 args into the 3-arg
    # ThreeTransforTemproal.forward, model.py:3552)
    "ThreeTRXCombination": (Branch("multi", (0, 1, 2)),
                            Branch("pair", (0, 1), 0, "f"),
                            Branch("pair", (0, 2), 0, "f")),
    # model.py:2096 TwoCombinationShiftTRX — shifted (m1,m2) + (m1,m3)
    "TwoCombinationShiftTRX": (Branch("pair", (0, 1), 1, "f"),
                               Branch("pair", (0, 2), -1, "f")),
    # as released (model.py:2112-2126): m2 rolled left both sides; m3
    # cat((suffix, rest)) == identity
    "TwoCombinationShiftTRX_faithful": (Branch("pair", (0, 1), 1, "f"),
                                        Branch("pair", (0, 2), 0, "f")),
    # model.py:2158 TwoCombinationTemTroShiftTRX — ThreeTransforTask (2-layer
    # 3-stream encoder) + the two shifted pairs
    "TwoCombinationTemTroShiftTRX": (
        Branch("multi", (0, 1, 2), depth=2),
        Branch("pair", (0, 1), 1, "f"), Branch("pair", (0, 2), -1, "f")),
    # as released (model.py:2192-2204): the 3-stream branch is added to the
    # SUPPORT fusion only (fusion_target omits fusion_context1's counterpart);
    # m2 rolled left both sides; m3 identity
    "TwoCombinationTemTroShiftTRX_faithful": (
        Branch("multi", (0, 1, 2), depth=2, sides=(1, 0)),
        Branch("pair", (0, 1), 1, "f"), Branch("pair", (0, 2), 0, "f")),
    # model.py:1896 OTAMThreeTRXShiftLoopTime — the MFM branch set as RELEASED
    # (m2 rolled left both sides, m3's cat((prefix, rest)) == identity,
    # l.1918-1933) under a CNN_OTAM head instead of the TRX branch
    "OTAMThreeTRXShiftLoopTime": (Branch("multi", (0, 1, 2)),
                                  Branch("pair", (0, 1), 1, "f"),
                                  Branch("pair", (0, 2), 0, "f")),
    # model.py:2555 ThreeFusion3 — self-encoded m1 + pair(m2, m3), MLP post
    "ThreeFusion3": (Branch("self", (0,), depth=3), Branch("pair", (1, 2))),
    # as released: the ``tran`` encoder omits batch_first → video-axis
    # attention (model.py:2566); this variant reproduces it exactly so a
    # reference-trained ThreeFusion3 checkpoint replays its own logits
    "ThreeFusion3_videoaxis": (
        Branch("self", (0,), depth=3, video_axis=True),
        Branch("pair", (1, 2))),
    # as released: FourTransforFusion omits batch_first AND routes stream 4
    # through positionEncoding3 (PE4 constructed but dead, model.py:1218-1219)
    "FourStrm_videoaxis": (
        Branch("multi", (0, 1, 2, 3), depth=2, nhead=4, video_axis=True,
               shared_last_pe=True),),
    # model.py:2700 TwoFusionBatchFusion — scalar-stat shift fusion
    "TwoFusionBatchFusion": (Branch("batch", (0, 1)),),
}

# per-preset module-level options (combiner / post-processor)
PRESET_OPTIONS: Dict[str, Dict[str, str]] = {
    "ThreeCross": {"combine": "cross"},
    "OTAMThreeTRXShiftLoopTime": {"head": "otam"},
    "ThreeFusion3": {"post": "mlp"},
    "ThreeFusion3_videoaxis": {"post": "mlp"},
    "TwoCTXShuffleTime": {"head": "ctx"},
    "TwoCTXShuffleTime_faithful": {"head": "ctx"},
}

# per-preset EXTRACT-path branch specs, for reference classes whose per-video
# feature dump disagrees with their own live forward (the same released
# asymmetry MFMTeacher reproduces for ThreeTRXShiftLoopTime). Entries must
# match the live specs module-for-module — only shift/sides may differ.
PRESET_EXTRACT: Dict[str, Tuple[BranchSpec, ...]] = {
    # model.py:3506-3520: extract_feature left-rolls m2 AND m3 by shirt_num
    # before the shared pair fusion, unlike the unshifted live forward
    "ThreeTRXCombination": (Branch("multi", (0, 1, 2)),
                            Branch("pair", (0, 1), 1, "f"),
                            Branch("pair", (0, 2), 1, "f")),
}


def _apply_side_shift(x: jnp.ndarray, spec: SideShift) -> jnp.ndarray:
    """Shift (N, T, D) along T: roll = circular, pad = zero-filled."""
    mode, s = spec
    if s == 0:
        return x
    if mode == "roll":
        return _roll_left(x, s) if s > 0 else _roll_right(x, -s)
    if s > 0:   # drop the first s frames, zero-pad the tail (F.pad (0,0,0,s))
        return jnp.concatenate([x[:, s:], jnp.zeros_like(x[:, :s])], axis=1)
    s = -s      # drop the last s frames, zero-pad the head (F.pad (0,0,s,0))
    return jnp.concatenate([jnp.zeros_like(x[:, :s]), x[:, :x.shape[1] - s]],
                           axis=1)


def _normalize_shift(shift: ShiftSpec) -> Tuple[SideShift, SideShift]:
    if isinstance(shift, int):
        return (("roll", shift), ("roll", shift))
    return shift


def _as_branch(spec: BranchSpec) -> Branch:
    return spec if isinstance(spec, Branch) else Branch(*spec)


class ComposedFusionTeacher(nn.Module):
    """Sum/cross-combined branches over modality dicts, TRX or OTAM head.

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
    head: str = "trx"            # "trx" | "otam" | "ctx" (frame-level TCT)
    combine: str = "sum"         # "sum" | "cross"
    post: Optional[str] = None   # None | "mlp"
    use_pallas: bool = False
    # dump-path overrides (PRESET_EXTRACT): same modules, different shifts
    extract_branches: Optional[Tuple[BranchSpec, ...]] = None

    def setup(self):
        branches = [_as_branch(s) for s in self.branches]
        if self.extract_branches is not None:
            ex = [_as_branch(s) for s in self.extract_branches]
            if len(ex) != len(branches) or any(
                    (a.kind, a.idxs, a.share, a.depth, a.nhead,
                     a.video_axis, a.shared_last_pe)
                    != (b.kind, b.idxs, b.share, b.depth, b.nhead,
                        b.video_axis, b.shared_last_pe)
                    for a, b in zip(ex, branches)):
                raise ValueError(
                    "extract_branches must match branches module-for-module "
                    "(only shift/sides may differ)")
        for side in (0, 1):
            if not any(b.sides[side] for b in branches):
                raise ValueError(f"no branch active on side {side} "
                                 "(0=support, 1=query)")
        top = max(i for b in branches for i in b.idxs)
        if top >= len(self.modalities):
            raise ValueError(
                f"branch spec references modality index {top} but only "
                f"{len(self.modalities)} modalities are configured "
                f"({self.modalities}) — pass --modalities with at least "
                f"{top + 1} names for this fusion")
        seen: Dict[Tuple[str, str], Branch] = {}
        for b in branches:
            if not b.share:
                continue
            k = (b.kind, b.share)
            prev = seen.setdefault(k, b)
            if (len(prev.idxs) != len(b.idxs)
                    or (prev.depth or self.depth) != (b.depth or self.depth)
                    or prev.nhead != b.nhead
                    or prev.video_axis != b.video_axis
                    or prev.shared_last_pe != b.shared_last_pe):
                raise ValueError(
                    f"branches sharing {k} disagree on arity/depth/nhead/"
                    f"video_axis: {prev} vs {b}")
        mods = []
        shared: Dict[Tuple[str, str], nn.Module] = {}
        for spec in self.branches:
            b = _as_branch(spec)
            key = (b.kind, b.share) if b.share else None
            if key is not None and key in shared:
                mods.append(shared[key])
                continue
            depth = b.depth if b.depth is not None else self.depth
            if b.kind == "multi":
                n = len(b.idxs)
                plain3 = (n == 3 and not b.nhead and not b.video_axis
                          and not b.shared_last_pe)
                m = (ThreeStreamFusion(self.seq_len, self.in_dim, depth,
                                       self.dropout)
                     if plain3 else
                     MultiStreamFusion(n, self.seq_len, self.in_dim, depth,
                                       self.dropout, nhead=b.nhead,
                                       video_axis=b.video_axis,
                                       shared_last_pe=b.shared_last_pe))
            elif b.kind == "cross":
                m = CrossAttentionFusion(self.in_dim, dropout=self.dropout)
            elif b.kind == "self":
                m = SelfEncoderBranch(self.in_dim, depth, self.dropout,
                                      video_axis=b.video_axis)
            elif b.kind == "batch":
                m = BatchStatFusion(self.in_dim)
            else:
                m = TwoStreamFusion(self.seq_len, self.in_dim, depth,
                                    self.dropout)
            if key is not None:
                shared[key] = m
            mods.append(m)
        self.branch_modules = mods
        if self.combine == "cross":
            self.combiner = CrossAttentionFusion(self.in_dim,
                                                 dropout=self.dropout)
        if self.post == "mlp":
            from ...ops.strm import BottleneckMLP2
            self.post_mlp = BottleneckMLP2(self.in_dim)
        if self.head in ("trx", "ctx"):
            # "ctx" = CTXBranch (model.py:3045-3077): the TCT over single
            # frames (CrossTransformer) instead of frame tuples
            self.classifier = TrxBranch(
                self.way, self.shot, self.seq_len, self.in_dim, self.out_dim,
                (1,) if self.head == "ctx" else self.temp_set, self.dropout,
                use_pallas=self.use_pallas)
        elif self.head != "otam":
            raise ValueError(f"unknown head {self.head!r}; "
                             "choose trx | otam | ctx")

    def fuse(self, feats: Dict[str, jnp.ndarray], train: bool,
             side: int = 0, specs=None) -> jnp.ndarray:
        """``side``: 0 = support/context shift spec, 1 = query/target.
        ``specs`` swaps the branch specs (same modules) — the extract path."""
        streams = [feats[m] for m in self.modalities]
        outs = []
        for module, spec in zip(self.branch_modules,
                                self.branches if specs is None else specs):
            b = _as_branch(spec)
            if not b.sides[side]:
                continue
            if (b.kind in ("multi", "self")
                    and any(s != 0 for _, s in _normalize_shift(b.shift))):
                # no reference fusion class shifts a multi/self stream; a
                # shifted spec here would otherwise be silently unshifted
                # (zero-amount specs are no-ops per _apply_side_shift)
                raise ValueError(
                    f"shift is only defined for pair/cross/batch branches, "
                    f"got {b.kind!r} with shift={b.shift!r}")
            if b.kind == "multi":
                picked = [streams[i] for i in b.idxs]
                # dispatch must mirror setup: 3-stream WITHOUT an nhead
                # override is the positional ThreeStreamFusion; everything
                # else is the list-taking MultiStreamFusion
                out = (module(*picked, train)
                       if (len(b.idxs) == 3 and not b.nhead
                           and not b.video_axis and not b.shared_last_pe)
                       else module(picked, train))
            elif b.kind == "self":
                out = module(streams[b.idxs[0]], train)
            else:
                i, j = b.idxs
                spec_s = _normalize_shift(b.shift)[side]
                out = module(streams[i],
                             _apply_side_shift(streams[j], spec_s), train)
            outs.append(out)
        if self.combine == "cross" and len(outs) > 1:
            fused = outs[0]
            for o in outs[1:]:
                fused = self.combiner(fused, o, train)
        else:
            fused = sum(outs[1:], outs[0])
        if self.post == "mlp":
            fused = self.post_mlp(fused)
        return fused

    def __call__(self, context_feats, context_labels, target_feats, train: bool):
        fused_ctx = self.fuse(context_feats, train, side=0)
        fused_tgt = self.fuse(target_feats, train, side=1)
        if self.head == "otam":
            logits = otam_logits(fused_ctx, context_labels, fused_tgt,
                                 self.way, self.shot)
        else:
            logits = self.classifier(fused_ctx, context_labels, fused_tgt,
                                     train)
        return {"logits": logits}

    def extract(self, feats: Dict[str, jnp.ndarray],
                side: int = 0) -> jnp.ndarray:
        """Fused features for the dump tools. For side-asymmetric
        ``*_faithful`` presets the two sides genuinely differ (the released
        classes never implemented extract_feature, e.g. model.py:1790); pass
        ``side=1`` to dump what the trained classifier computed for QUERY
        videos instead of the default support-side fusion. Presets whose
        released dump disagrees with their live forward carry
        ``extract_branches`` (PRESET_EXTRACT) — applied here only."""
        return self.fuse(feats, train=False, side=side,
                         specs=self.extract_branches)
