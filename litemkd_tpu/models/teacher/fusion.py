"""MFM hierarchical multi-modal fusion teacher.

TPU-native rebuild of the reference's fusion-teacher stack
(``teacher/code/model.py``):

- ``EncoderLayer``/``Encoder``: torch ``nn.TransformerEncoderLayer`` semantics
  (post-LN, ReLU FFN with a 2048-wide bottleneck — the torch default
  ``dim_feedforward`` the reference silently inherits) over concatenated
  modality channels.
- ``TwoStreamFusion``  = ``TwoTransforFusion``   (model.py:1361-1393)
- ``ThreeStreamFusion`` = ``ThreeTransforTemproal`` (model.py:1300-1331)
- ``TrxBranch``        = TCT head stack            (model.py:1094-1128)
- ``MFMTeacher``       = ``ThreeTRXShiftLoopTime`` (model.py:1588-1710):
  fusion1 = 3-stream encoder over (m1, m2, m3);
  fusion2 = 2-stream encoder over (m1, m2 rolled left by ``shirt_num``);
  fusion3 = 2-stream encoder over (m1, m3') — NOTE: the released reference's
  "shift" of m3 concatenates prefix+rest in original order, i.e. the identity
  (model.py:1614-1620); we reproduce that faithfully and expose
  ``third_shift='right'`` for the presumably-intended reverse roll.
  fused = fusion1 + fusion2 + fusion3 → TrxBranch logits.
- ``ScoreFusion``      = ``TSF`` (model.py:1154-..): weighted sum of
  per-modality TrxBranch logits.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.dtypes import anchor_dtype
from ...ops.positional import TrainablePE
from ...ops.tct import MultiSetTCT
from ...ops.torch_init import torch_linear_kernel_init, torch_linear_bias_init


def _dense(out, fan_in, name, dtype=jnp.float32):
    return nn.Dense(out, dtype=dtype, name=name,
                    kernel_init=torch_linear_kernel_init(),
                    bias_init=torch_linear_bias_init(fan_in))


def _qkv_kernel_init():
    """torch MultiheadAttention._reset_parameters applies xavier_uniform_ to
    the STACKED (3d, d) in_proj weight → bound sqrt(6/(d+3d)); each (d, d)
    slice is iid uniform at that bound, so three separate Denses reproduce
    the stacked distribution exactly."""
    def init(key, shape, dtype=jnp.float32):
        d_in, d_out = shape
        bound = np.sqrt(6.0 / (d_in + 3 * d_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _attn_dense(out, name, dtype, qkv: bool):
    # attention projections follow torch MHA init, not nn.Linear's: xavier
    # over the stacked in_proj for q/k/v, Linear-default kernel for out_proj,
    # and ZERO biases on all four (verified empirically against torch 2.x)
    return nn.Dense(out, dtype=dtype, name=name,
                    kernel_init=(_qkv_kernel_init() if qkv
                                 else torch_linear_kernel_init()),
                    bias_init=nn.initializers.zeros)


class EncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch TransformerEncoderLayer
    defaults: ReLU FFN, dim_feedforward=2048, dropout=0.1)."""

    d_model: int
    nhead: int
    dim_ff: int = 2048
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d, h = self.d_model, self.nhead
        hd = d // h
        cd = self.compute_dtype
        n, t, _ = x.shape

        q = _attn_dense(d, "attn_q", cd, qkv=True)(x).reshape(n, t, h, hd)
        k = _attn_dense(d, "attn_k", cd, qkv=True)(x).reshape(n, t, h, hd)
        v = _attn_dense(d, "attn_v", cd, qkv=True)(x).reshape(n, t, h, hd)
        adt = anchor_dtype(cd)
        scores = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                            preferred_element_type=adt) / np.sqrt(hd)
        attn = jax.nn.softmax(scores.astype(adt), axis=-1)
        drop = lambda z, name: nn.Dropout(self.dropout, deterministic=not train,
                                          name=name)(z)
        # torch TransformerEncoderLayer forwards its dropout into
        # MultiheadAttention, which drops the post-softmax probabilities too
        attn = drop(attn, "drop_probs")
        ctx = jnp.einsum("nhqk,nkhd->nqhd", attn.astype(cd), v,
                         preferred_element_type=adt)
        ctx = _attn_dense(d, "attn_out", cd, qkv=False)(ctx.reshape(n, t, d))
        x = nn.LayerNorm(epsilon=1e-5, dtype=adt, name="norm1")(
            x + drop(ctx, "drop_attn"))
        y = _dense(self.dim_ff, d, "mlp_in", cd)(x)
        y = drop(nn.relu(y), "drop_mlp1")
        y = _dense(d, self.dim_ff, "mlp_out", cd)(y)
        x = nn.LayerNorm(epsilon=1e-5, dtype=adt, name="norm2")(
            x + drop(y, "drop_mlp2"))
        return x


class Encoder(nn.Module):
    """``video_axis=True`` reproduces the released no-``batch_first`` bug of
    five reference modules (FourTransforFusion model.py:1205, ThreeFusion3's
    ``tran`` :2566, ThreeTranToTwo :2632, S3DEncoder :2807, teacher
    TimeTransformer :2827): a (N, T, D) input is read by torch as
    (seq, batch, feature), so attention mixes the N VIDEOS at each frame
    position — one swapaxes on each side of the layer stack here. Off by
    default; the bug-faithful ``*_videoaxis`` variants exist so
    reference-trained checkpoints reproduce their own outputs."""

    d_model: int
    nhead: int
    depth: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    dim_ff: int = 2048   # torch TransformerEncoderLayer default
    video_axis: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        if self.video_axis:
            x = x.swapaxes(0, 1)
        for i in range(self.depth):
            x = EncoderLayer(self.d_model, self.nhead, dim_ff=self.dim_ff,
                             dropout=self.dropout,
                             compute_dtype=self.compute_dtype,
                             name=f"layer{i}")(x, train)
        return x.swapaxes(0, 1) if self.video_axis else x


class TwoStreamFusion(nn.Module):
    """Concat two modalities channel-wise, encode, project back to d."""

    seq_len: int
    d: int = 2048
    depth: int = 2
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, m1, m2, train: bool):
        pe1 = TrainablePE(self.seq_len, self.d, self.dropout, name="pe1")
        pe2 = TrainablePE(self.seq_len, self.d, self.dropout, name="pe2")
        x = jnp.concatenate([pe1(m1, train=train), pe2(m2, train=train)], -1)
        x = Encoder(2 * self.d, 2, self.depth, self.dropout,
                    self.compute_dtype, name="encoder")(x, train)
        x = _dense(self.d, 2 * self.d, "fuse_proj", self.compute_dtype)(x)
        return nn.Dropout(self.dropout, deterministic=not train,
                          name="drop_out")(x)


class ThreeStreamFusion(nn.Module):
    seq_len: int
    d: int = 2048
    depth: int = 2
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, m1, m2, m3, train: bool):
        pes = [TrainablePE(self.seq_len, self.d, self.dropout, name=f"pe{i+1}")
               for i in range(3)]
        x = jnp.concatenate([pe(m, train=train)
                             for pe, m in zip(pes, (m1, m2, m3))], -1)
        x = Encoder(3 * self.d, 3, self.depth, self.dropout,
                    self.compute_dtype, name="encoder")(x, train)
        x = _dense(self.d, 3 * self.d, "fuse_proj", self.compute_dtype)(x)
        return nn.Dropout(self.dropout, deterministic=not train,
                          name="drop_out")(x)


class MultiStreamFusion(nn.Module):
    """N-modality concat-encode-project fusion — generalizes the reference's
    ThreeTransforTemproal (nhead=3), FourTransforTemproal (nhead=2,
    model.py:1333-1360) and FourTransforFusion (nhead=4, model.py:1192-1233);
    Two/ThreeStreamFusion are the 2/3-stream cases. ``nhead`` overrides the
    default per-arity head count."""

    n_streams: int
    seq_len: int
    d: int = 2048
    depth: int = 2
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    nhead: int = 0    # 0 → per-arity default (3 streams → 3 heads, else 2)
    video_axis: bool = False      # released FourTransforFusion bug (see Encoder)
    shared_last_pe: bool = False  # released FourTransforFusion: stream 4 goes
                                  # through positionEncoding3 — PE4 is dead
                                  # (model.py:1218-1219)

    @nn.compact
    def __call__(self, streams, train: bool):
        assert len(streams) == self.n_streams
        n_pes = self.n_streams - 1 if self.shared_last_pe else self.n_streams
        pes = [TrainablePE(self.seq_len, self.d, self.dropout, name=f"pe{i+1}")
               for i in range(n_pes)]
        if self.shared_last_pe:
            pes = pes + [pes[-1]]
        x = jnp.concatenate([pe(m, train=train)
                             for pe, m in zip(pes, streams)], -1)
        nhead = self.nhead or (3 if self.n_streams == 3 else 2)
        x = Encoder(self.n_streams * self.d, nhead, self.depth, self.dropout,
                    self.compute_dtype, video_axis=self.video_axis,
                    name="encoder")(x, train)
        x = _dense(self.d, self.n_streams * self.d, "fuse_proj",
                   self.compute_dtype)(x)
        return nn.Dropout(self.dropout, deterministic=not train,
                          name="drop_out")(x)


class CrossAttentionFusion(nn.Module):
    """BERT-style cross attention (``teacher/code/transformer.py:57-71``,
    ``BertAttention``): query = stream 1, key/value = stream 2, 2 heads,
    out-projection + dropout + LayerNorm(residual to stream 1). Used by
    TwoCross/ThreeCross/TwoCombinationCTX (model.py:1430-1498, 2022-2053)."""

    d: int = 2048
    nhead: int = 2
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        d, h = self.d, self.nhead
        hd = d // h
        cd = self.compute_dtype
        n, t, _ = x1.shape
        q = _dense(d, d, "query", cd)(x1).reshape(n, t, h, hd)
        k = _dense(d, d, "key", cd)(x2).reshape(n, -1, h, hd)
        v = _dense(d, d, "value", cd)(x2).reshape(n, -1, h, hd)
        adt = anchor_dtype(cd)
        scores = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                            preferred_element_type=adt) / np.sqrt(hd)
        attn = jax.nn.softmax(scores.astype(adt), axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train,
                          name="drop_probs")(attn)
        ctx = jnp.einsum("nhqk,nkhd->nqhd", attn.astype(cd), v,
                         preferred_element_type=adt).reshape(n, t, d)
        out = _dense(d, d, "out", cd)(ctx)
        out = nn.Dropout(self.dropout, deterministic=not train,
                         name="drop_out")(out)
        return nn.LayerNorm(epsilon=1e-5, dtype=adt,  # torch eps
                            name="norm")(out + x1)


class SelfEncoderBranch(nn.Module):
    """Plain self-attention encoder over one stream, no positional encoding —
    ThreeFusion3's ``self.tran`` (model.py:2565-2580: nhead=1, 3 layers; its
    positionEncoding1 is constructed but never applied).

    Documented divergence: the released layer omits ``batch_first=True``
    (unlike the four core fusions, l.1245/1311/1346/1370), so with (N, T, D)
    inputs torch attends ACROSS VIDEOS at each frame position — batch-size-
    and episode-composition-dependent. We attend over time by default, the
    evident intent; ``video_axis=True`` (the ``ThreeFusion3_videoaxis``
    preset) reproduces the released behavior for checkpoint interop."""

    d: int = 2048
    depth: int = 3
    dropout: float = 0.1
    video_axis: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        return Encoder(self.d, 1, self.depth, self.dropout,
                       video_axis=self.video_axis, name="encoder")(x, train)


class BatchStatFusion(nn.Module):
    """BatchTwoFusion (model.py:2607-2619): shift-normalize x by the *scalar*
    mean/std of the other stream (torch.mean/std over all elements), then one
    linear; operates on flattened (N·T, D) tokens."""

    d: int = 2048

    @nn.compact
    def __call__(self, x, w, train: bool):
        n, t, _ = x.shape
        xf = x.reshape(-1, self.d)
        wf = w.reshape(-1, self.d)
        mu = jnp.mean(wf)
        # unbiased std (torch.std default); sqrt(var+tiny) keeps the gradient
        # finite for constant/zero-filled streams (CLAUDE.md norm convention)
        sd = jnp.sqrt(jnp.var(wf, ddof=1) + 1e-16)
        out = _dense(self.d, self.d, "f1")(xf + (xf - mu) / (sd + 1e-5))
        return out.reshape(n, t, self.d)


class TrxBranch(nn.Module):
    """TCT stack over fused features → (Q, way) logits (model.py:1094-1128)."""

    way: int
    shot: int
    seq_len: int
    in_dim: int = 2048
    out_dim: int = 1152
    temp_set: Tuple[int, ...] = (2,)
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
                           name="transformers")(context, context_labels, target,
                                                train=train)


def _roll_left(x, s: int):
    return jnp.concatenate([x[:, s:, :], x[:, :s, :]], axis=1)


def _roll_right(x, s: int):
    return jnp.concatenate([x[:, -s:, :], x[:, :-s, :]], axis=1)


class MFMTeacher(nn.Module):
    """Hierarchical multi-modal fusion (ThreeTRXShiftLoopTime).

    ``__call__(context_feats, context_labels, target_feats, train)`` where the
    feats are dicts keyed by modality name ({'rgb','depth','flow'} by default,
    each (N, T, D)) → {'logits': (Q, way)}.
    """

    way: int
    shot: int
    seq_len: int
    in_dim: int = 2048
    out_dim: int = 1152
    temp_set: Tuple[int, ...] = (2,)
    depth: int = 2                    # trans_num
    shirt_num: int = 1
    modalities: Tuple[str, ...] = ("rgb", "depth", "flow")
    dropout: float = 0.1
    third_shift: str = "reference"    # 'reference' (identity) | 'right'
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        n = len(self.modalities)
        if n == 3:
            self.three_fusion = ThreeStreamFusion(self.seq_len, self.in_dim,
                                                  self.depth, self.dropout,
                                                  self.compute_dtype)
        else:
            # Four/FiveShiftFusion generalization (model.py:1712-1894)
            self.three_fusion = MultiStreamFusion(n, self.seq_len, self.in_dim,
                                                  self.depth, self.dropout,
                                                  self.compute_dtype)
        self.fusion = TwoStreamFusion(self.seq_len, self.in_dim, self.depth,
                                      self.dropout, self.compute_dtype)
        self.branch = TrxBranch(self.way, self.shot, self.seq_len, self.in_dim,
                                self.out_dim, self.temp_set, self.dropout,
                                compute_dtype=self.compute_dtype,
                                use_pallas=self.use_pallas)

    def _shift3(self, x):
        if self.third_shift == "right":
            return _roll_right(x, self.shirt_num)
        return x  # faithful to the released reference (model.py:1614-1620)

    def fuse(self, feats: Dict[str, jnp.ndarray], train: bool, *,
             dump: bool = False) -> jnp.ndarray:
        streams = [feats[m] for m in self.modalities]
        if len(streams) == 3:
            fused = self.three_fusion(streams[0], streams[1], streams[2], train)
        else:
            fused = self.three_fusion(streams, train)
        # pairwise branches: m2 rolled left by shirt_num; modalities ≥3 use the
        # reference's no-op "shift" (identity; 'right' mode actually rolls).
        # ``dump`` selects the released extract_feature's LEFT-roll for m3+
        # in 'reference' mode (the dump-vs-live asymmetry, see extract()).
        fused = fused + self.fusion(
            streams[0], _roll_left(streams[1], self.shirt_num), train)
        for extra in streams[2:]:
            if dump and self.third_shift != "right":
                shifted = _roll_left(extra, self.shirt_num)
            else:
                shifted = self._shift3(extra)
            fused = fused + self.fusion(streams[0], shifted, train)
        return fused

    def __call__(self, context_feats, context_labels, target_feats, train: bool):
        fused_ctx = self.fuse(context_feats, train)
        fused_tgt = self.fuse(target_feats, train)
        logits = self.branch(fused_ctx, context_labels, fused_tgt, train)
        return {"logits": logits}

    def extract(self, feats: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Per-video fused features (model.py:1648-1663) — feeds the student's
        teacher-feature tree.

        Bug-faithful asymmetry: the released ``extract_feature`` LEFT-rolls
        the third modality (model.py:1658-1661, same cat order as m2) even
        though ``forward``/``extract_task_feature`` identity-"shift" it via
        the reversed cat (model.py:1614-1620, 1682-1688) — so the reference's
        dumped trees do NOT match its own live fusion on m3+. The dumped tree
        is the interop surface, so extraction reproduces ``extract_feature``;
        ``third_shift='right'`` (the corrected mode) stays self-consistent
        with its forward instead."""
        return self.fuse(feats, False, dump=True)


class DGAdaIN(nn.Module):
    """Adaptive-instance-norm fusion (model.py:2454-2468): normalize the
    content stream, then scale/shift with affine maps of the style stream
    (scale = 1 + A_s(w), bias = A_b(w)).

    Normalization axis: the reference reshapes to (1, N·T, D) before the
    call (model.py:2505-2510), so torch's ``InstanceNorm1d`` sees N·T as
    channels and D as length — each TOKEN is normalized over its D channels
    (not the token axis)."""

    dim: int = 2048

    @nn.compact
    def __call__(self, x, w):
        mu = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        x_n = (x - mu) / jnp.sqrt(var + 1e-5)
        scale = 1.0 + _dense(self.dim, self.dim, "affine_scale")(w)
        bias = _dense(self.dim, self.dim, "affine_bias")(w)
        return x_n * scale + bias


class DGAFusionTeacher(nn.Module):
    """ThreeFusionDGA (model.py:2484-2516): two-stream transformer fusion of
    (m2, m3), then AdaIN conditioning of that fusion on m1 (RGB), classified
    by a TrxBranch. ``with_enrich=True`` adds the MLP-mix enrichment of
    ThreeFusionDGA2 (model.py:2518-2554)."""

    way: int
    shot: int
    seq_len: int
    in_dim: int = 2048
    out_dim: int = 1152
    temp_set: Tuple[int, ...] = (2,)
    depth: int = 2
    modalities: Tuple[str, ...] = ("rgb", "depth", "flow")
    dropout: float = 0.1
    with_enrich: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        self.fusion1 = TwoStreamFusion(self.seq_len, self.in_dim, self.depth,
                                       self.dropout)
        self.fusion2 = DGAdaIN(self.in_dim)
        if self.with_enrich:
            from ...ops.strm import MLPMixEnrich
            self.mlp1 = MLPMixEnrich(self.in_dim, self.seq_len)
        self.branch = TrxBranch(self.way, self.shot, self.seq_len, self.in_dim,
                                self.out_dim, self.temp_set, self.dropout,
                                compute_dtype=self.compute_dtype,
                                use_pallas=self.use_pallas)

    def fuse(self, feats, train: bool):
        m1, m2, m3 = self.modalities
        fused = self.fusion1(feats[m2], feats[m3], train)
        # fusion2(rgb, fused) per the reference (model.py:2509): RGB is the
        # normalized CONTENT, the (m2,m3) fusion provides the style affines.
        # Both the norm and the affines act per token, so the reference's
        # (1, N·T, D) reshape is a no-op here.
        fused = self.fusion2(feats[m1], fused)
        if self.with_enrich:
            fused = self.mlp1(fused, train=train)
        return fused

    def __call__(self, context_feats, context_labels, target_feats, train: bool):
        fused_ctx = self.fuse(context_feats, train)
        fused_tgt = self.fuse(target_feats, train)
        logits = self.branch(fused_ctx, context_labels, fused_tgt, train)
        return {"logits": logits}

    def extract(self, feats):
        """Per-video fused features for the dump tools."""
        return self.fuse(feats, train=False)


class TwoRoadFusionTeacher(nn.Module):
    """ThreeFusionTwoRoad (model.py:2646-2700) + its ThreeTranToTwo encoder
    (model.py:2620-2645): 3 modalities PE'd and concatenated, a 4-layer
    nhead=3 encoder over 3D channels, a 3D→2D projection, then the released
    two-road head: the (N, T, 2D) fusion is reinterpreted flat as (2NT, D)
    tokens, split channel-wise into D/2 halves, each passed through its own
    linear + bottleneck MLP, summed, and the NT·D elements are reinterpreted
    again as (N, T, D) for the TRX branch — reshape quirks reproduced exactly.

    Documented divergence: ThreeTranToTwo omits ``batch_first=True``
    (model.py:2630), so the released encoder attends across videos, not time
    (see SelfEncoderBranch); we attend over time by default —
    ``video_axis=True`` (the ``two_road_videoaxis`` kind) reproduces the
    released behavior for checkpoint interop.
    """

    way: int
    shot: int
    seq_len: int
    in_dim: int = 2048
    out_dim: int = 1152
    temp_set: Tuple[int, ...] = (2,)
    depth: int = 4                       # reference hardcodes num_layers=4
    modalities: Tuple[str, ...] = ("rgb", "depth", "flow")
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    video_axis: bool = False

    def setup(self):
        from ...ops.strm import BottleneckMLP2
        d, half = self.in_dim, self.in_dim // 2
        self.pes = [TrainablePE(self.seq_len, d, self.dropout)
                    for _ in self.modalities]
        self.encoder = Encoder(3 * d, 3, self.depth, self.dropout,
                               video_axis=self.video_axis)
        self.proj = nn.Dense(2 * d, kernel_init=torch_linear_kernel_init(),
                             bias_init=torch_linear_bias_init(3 * d))
        self.drop = nn.Dropout(self.dropout)
        self.road1 = nn.Dense(half, kernel_init=torch_linear_kernel_init(),
                              bias_init=torch_linear_bias_init(half))
        self.road2 = nn.Dense(half, kernel_init=torch_linear_kernel_init(),
                              bias_init=torch_linear_bias_init(half))
        self.mlp1 = BottleneckMLP2(half)
        self.mlp2 = BottleneckMLP2(half)
        self.branch = TrxBranch(self.way, self.shot, self.seq_len, self.in_dim,
                                self.out_dim, self.temp_set, self.dropout,
                                compute_dtype=self.compute_dtype,
                                use_pallas=self.use_pallas)

    def fuse(self, feats: Dict[str, jnp.ndarray], train: bool) -> jnp.ndarray:
        d, half = self.in_dim, self.in_dim // 2
        streams = [pe(feats[m], train=train)
                   for pe, m in zip(self.pes, self.modalities)]
        x = self.encoder(jnp.concatenate(streams, -1), train)
        x = self.drop(self.proj(x), deterministic=not train)   # (N, T, 2D)
        n = x.shape[0]
        x = x.reshape(-1, d)                                    # (2NT, D)
        a = self.mlp1(self.road1(x[:, :half]))
        b = self.mlp2(self.road2(x[:, half:]))
        return (a + b).reshape(n, self.seq_len, d)              # NT·D elements

    def __call__(self, context_feats, context_labels, target_feats, train: bool):
        fused_ctx = self.fuse(context_feats, train)
        fused_tgt = self.fuse(target_feats, train)
        logits = self.branch(fused_ctx, context_labels, fused_tgt, train)
        return {"logits": logits}

    def extract(self, feats: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        return self.fuse(feats, train=False)


class ScoreFusion(nn.Module):
    """TSF: weighted sum of per-modality TrxBranch logits (model.py:1154-...).

    Weights (a, b, c) follow the reference's --a/--b/--c flags."""

    way: int
    shot: int
    seq_len: int
    in_dim: int = 2048
    out_dim: int = 1152
    temp_set: Tuple[int, ...] = (2,)
    modalities: Tuple[str, ...] = ("rgb", "depth", "flow")
    weights: Tuple[float, ...] = (1.0, 1.0, 1.0)
    dropout: float = 0.1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, context_feats, context_labels, target_feats, train: bool):
        if len(self.weights) != len(self.modalities):
            raise ValueError(
                f"ScoreFusion needs one weight per modality: got "
                f"{len(self.weights)} weights for {self.modalities}")
        total = None
        per_mod = {}
        for m, w in zip(self.modalities, self.weights):
            logits = TrxBranch(self.way, self.shot, self.seq_len, self.in_dim,
                               self.out_dim, self.temp_set, self.dropout,
                               use_pallas=self.use_pallas,
                               name=f"branch_{m}")(
                context_feats[m], context_labels, target_feats[m], train)
            per_mod[m] = logits
            total = w * logits if total is None else total + w * logits
        return {"logits": total, "per_modality": per_mod}
