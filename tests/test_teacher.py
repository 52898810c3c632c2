"""MFM fusion teacher tests, incl. encoder-layer parity with torch."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from litemkd_tpu.models.teacher import (EncoderLayer, MFMTeacher, ScoreFusion,
                                        TwoStreamFusion)

WAY, SHOT, QPC, T, D = 3, 2, 2, 4, 32


def test_encoder_layer_matches_torch():
    """Our post-LN encoder layer == torch nn.TransformerEncoderLayer with the
    same weights (eval mode, no dropout)."""
    d_model, nhead, dim_ff = 16, 2, 24
    layer = EncoderLayer(d_model, nhead, dim_ff=dim_ff)
    x = np.random.default_rng(0).normal(size=(2, 5, d_model)).astype(np.float32)
    params = layer.init(jax.random.key(0), jnp.asarray(x), False)["params"]

    tl = torch.nn.TransformerEncoderLayer(d_model, nhead, dim_ff,
                                          batch_first=True)
    tl.eval()
    p = params
    with torch.no_grad():
        wq = np.asarray(p["attn_q"]["kernel"]).T
        wk = np.asarray(p["attn_k"]["kernel"]).T
        wv = np.asarray(p["attn_v"]["kernel"]).T
        tl.self_attn.in_proj_weight.copy_(torch.tensor(np.concatenate([wq, wk, wv])))
        tl.self_attn.in_proj_bias.copy_(torch.tensor(np.concatenate(
            [np.asarray(p["attn_q"]["bias"]), np.asarray(p["attn_k"]["bias"]),
             np.asarray(p["attn_v"]["bias"])])))
        tl.self_attn.out_proj.weight.copy_(torch.tensor(np.asarray(p["attn_out"]["kernel"]).T))
        tl.self_attn.out_proj.bias.copy_(torch.tensor(np.asarray(p["attn_out"]["bias"])))
        tl.linear1.weight.copy_(torch.tensor(np.asarray(p["mlp_in"]["kernel"]).T))
        tl.linear1.bias.copy_(torch.tensor(np.asarray(p["mlp_in"]["bias"])))
        tl.linear2.weight.copy_(torch.tensor(np.asarray(p["mlp_out"]["kernel"]).T))
        tl.linear2.bias.copy_(torch.tensor(np.asarray(p["mlp_out"]["bias"])))
        tl.norm1.weight.copy_(torch.tensor(np.asarray(p["norm1"]["scale"])))
        tl.norm1.bias.copy_(torch.tensor(np.asarray(p["norm1"]["bias"])))
        tl.norm2.weight.copy_(torch.tensor(np.asarray(p["norm2"]["scale"])))
        tl.norm2.bias.copy_(torch.tensor(np.asarray(p["norm2"]["bias"])))
        want = tl(torch.tensor(x)).numpy()

    got = np.asarray(layer.apply({"params": params}, jnp.asarray(x), False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _feats(rng, n):
    return {m: jnp.asarray(rng.normal(size=(n, T, D)).astype(np.float32))
            for m in ("rgb", "depth", "flow")}


def test_mfm_teacher_forward():
    rng = np.random.default_rng(0)
    ctx = _feats(rng, WAY * SHOT)
    tgt = _feats(rng, WAY * QPC)
    labels = jnp.asarray(np.repeat(np.arange(WAY), SHOT).astype(np.int32))
    m = MFMTeacher(way=WAY, shot=SHOT, seq_len=T, in_dim=D, out_dim=24,
                   depth=1)
    variables = m.init(jax.random.key(0), ctx, labels, tgt, False)
    out = m.apply(variables, ctx, labels, tgt, False)
    assert out["logits"].shape == (WAY * QPC, WAY)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_mfm_extract_reproduces_released_dump_semantics():
    """The released pipeline is internally inconsistent on the third
    modality: forward/extract_task_feature identity-"shift" flow via the
    reversed cat (model.py:1614-1620, 1682-1688) while the per-video dump
    extract_feature LEFT-rolls it like depth (model.py:1658-1661). The dumped
    tree is the interop surface, so reference-mode extract() must left-roll
    flow (== fuse() over feats with flow pre-rolled) and therefore DIFFER
    from the live fusion; the corrected 'right' mode stays self-consistent
    with its forward."""
    from litemkd_tpu.models.teacher.fusion import _roll_left
    rng = np.random.default_rng(1)
    feats = _feats(rng, 4)
    labels = jnp.asarray(np.repeat(np.arange(WAY), SHOT).astype(np.int32))
    m = MFMTeacher(way=WAY, shot=SHOT, seq_len=T, in_dim=D, out_dim=24, depth=1)
    ctx = _feats(rng, WAY * SHOT)
    tgt = _feats(rng, WAY * QPC)
    variables = m.init(jax.random.key(0), ctx, labels, tgt, False)
    fused = m.apply(variables, feats, method=m.extract)
    assert fused.shape == (4, T, D)
    live = m.apply(variables, feats, False, method=m.fuse)
    # the dump path left-rolls flow; the live fusion identity-shifts it —
    # they must differ exactly when flow is roll-sensitive, and agree when
    # flow is time-constant (roll == identity). Numeric parity of the dump
    # math vs a torch transcription lives in
    # tests/test_torch_import.py::test_load_mfm_checkpoint_runs_extraction.
    assert not np.allclose(np.asarray(fused), np.asarray(live))
    const_flow = dict(feats, flow=jnp.broadcast_to(
        feats["flow"][:, :1], feats["flow"].shape))
    np.testing.assert_allclose(
        np.asarray(m.apply(variables, const_flow, method=m.extract)),
        np.asarray(m.apply(variables, const_flow, False, method=m.fuse)),
        rtol=1e-5, atol=1e-5)

    mr = MFMTeacher(way=WAY, shot=SHOT, seq_len=T, in_dim=D, out_dim=24,
                    depth=1, third_shift="right")
    vr = mr.init(jax.random.key(0), ctx, labels, tgt, False)
    np.testing.assert_allclose(
        np.asarray(mr.apply(vr, feats, method=mr.extract)),
        np.asarray(mr.apply(vr, feats, False, method=mr.fuse)),
        rtol=1e-5, atol=1e-5)


def test_mfm_shift_semantics():
    """m2 rolls left by shirt_num; m3 is untouched in reference mode."""
    from litemkd_tpu.models.teacher.fusion import _roll_left, _roll_right
    x = jnp.arange(2 * 4 * 3).reshape(2, 4, 3).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(_roll_left(x, 1))[0, :, 0],
                                  np.asarray(x)[0, [1, 2, 3, 0], 0])
    np.testing.assert_array_equal(np.asarray(_roll_right(x, 1))[0, :, 0],
                                  np.asarray(x)[0, [3, 0, 1, 2], 0])


def test_score_fusion():
    rng = np.random.default_rng(2)
    ctx = _feats(rng, WAY * SHOT)
    tgt = _feats(rng, WAY * QPC)
    labels = jnp.asarray(np.repeat(np.arange(WAY), SHOT).astype(np.int32))
    m = ScoreFusion(way=WAY, shot=SHOT, seq_len=T, in_dim=D, out_dim=24,
                    weights=(1.0, 0.5, 0.25))
    variables = m.init(jax.random.key(0), ctx, labels, tgt, False)
    out = m.apply(variables, ctx, labels, tgt, False)
    assert out["logits"].shape == (WAY * QPC, WAY)
    manual = (out["per_modality"]["rgb"] + 0.5 * out["per_modality"]["depth"]
              + 0.25 * out["per_modality"]["flow"])
    np.testing.assert_allclose(np.asarray(out["logits"]), np.asarray(manual),
                               rtol=1e-5)


def test_four_modality_mfm():
    """FourShiftFusion generalization: N-stream fusion + pairwise branches."""
    rng = np.random.default_rng(3)
    mods = ("rgb", "depth", "flow", "skeleton")
    feats = lambda n: {m: jnp.asarray(rng.normal(size=(n, T, D)).astype(np.float32))
                       for m in mods}
    ctx, tgt = feats(WAY * SHOT), feats(WAY * QPC)
    labels = jnp.asarray(np.repeat(np.arange(WAY), SHOT).astype(np.int32))
    m = MFMTeacher(way=WAY, shot=SHOT, seq_len=T, in_dim=D, out_dim=24,
                   depth=1, modalities=mods)
    v = m.init(jax.random.key(0), ctx, labels, tgt, False)
    out = m.apply(v, ctx, labels, tgt, False)
    assert out["logits"].shape == (WAY * QPC, WAY)


def test_dgadain_matches_torch():
    """DGAdaIN numerics vs a torch transcription of model.py:2454-2468 at
    the reference's calling shape (x reshaped to (1, N·T, D) →
    InstanceNorm1d normalizes each TOKEN over its D channels), with
    fusion2(rgb, fused): RGB is the normalized content."""
    import torch
    from litemkd_tpu.models.teacher.fusion import DGAdaIN

    D_ = 16
    torch.manual_seed(3)
    scale_l = torch.nn.Linear(D_, D_)
    bias_l = torch.nn.Linear(D_, D_)
    norm = torch.nn.InstanceNorm1d(D_, affine=False)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((4, T, D_)).astype(np.float32)   # content (rgb)
    w = rng.standard_normal((4, T, D_)).astype(np.float32)   # style (fused)
    with torch.no_grad():
        xt = torch.from_numpy(x).reshape(1, -1, D_)
        wt = torch.from_numpy(w).reshape(1, -1, D_)
        want = (norm(xt) * (1 + scale_l(wt)) + bias_l(wt)) \
            .reshape(4, T, D_).numpy()

    params = {"affine_scale": {"kernel": scale_l.weight.detach().numpy().T,
                               "bias": scale_l.bias.detach().numpy()},
              "affine_bias": {"kernel": bias_l.weight.detach().numpy().T,
                              "bias": bias_l.bias.detach().numpy()}}
    got = DGAdaIN(D_).apply({"params": params}, jnp.asarray(x),
                            jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_dga_fusion_teacher():
    from litemkd_tpu.models.teacher import DGAFusionTeacher
    rng = np.random.default_rng(4)
    ctx, tgt = _feats(rng, WAY * SHOT), _feats(rng, WAY * QPC)
    labels = jnp.asarray(np.repeat(np.arange(WAY), SHOT).astype(np.int32))
    m = DGAFusionTeacher(way=WAY, shot=SHOT, seq_len=T, in_dim=D, out_dim=24,
                         depth=1, with_enrich=True)
    v = m.init(jax.random.key(0), ctx, labels, tgt, False)
    out = m.apply(v, ctx, labels, tgt, False)
    assert out["logits"].shape == (WAY * QPC, WAY)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_skeleton_encoder_expert():
    from litemkd_tpu.models.backbones.skeleton import SkeletonEncoder
    rng = np.random.default_rng(5)
    sk = jnp.asarray(rng.normal(size=(4, T, 17, 3)).astype(np.float32))
    enc = SkeletonEncoder(out_dim=D, num_layer=1)
    v = enc.init(jax.random.key(0), sk, train=False)
    out = enc.apply(v, sk, train=False)
    assert out.shape == (4, T, D)


def test_composed_fusion_presets():
    """Composer presets (shuffle/LR-shift/OTAM-head permutations) all run."""
    from litemkd_tpu.models.teacher import ComposedFusionTeacher, FUSION_PRESETS
    rng = np.random.default_rng(6)
    for name, mods in [("TwoTRXShuffleTime", ("rgb", "depth")),
                       ("ThreeTRXLRShiftLoopTime", ("rgb", "depth", "flow"))]:
        feats = lambda n: {m: jnp.asarray(
            rng.normal(size=(n, T, D)).astype(np.float32)) for m in mods}
        ctx, tgt = feats(WAY * SHOT), feats(WAY * QPC)
        labels = jnp.asarray(np.repeat(np.arange(WAY), SHOT).astype(np.int32))
        m = ComposedFusionTeacher(way=WAY, shot=SHOT, seq_len=T, in_dim=D,
                                  out_dim=24, depth=1, modalities=mods,
                                  branches=FUSION_PRESETS[name])
        v = m.init(jax.random.key(0), ctx, labels, tgt, False)
        out = m.apply(v, ctx, labels, tgt, False)
        assert out["logits"].shape == (WAY * QPC, WAY), name
        # extract() provides the fused features for the dump tools
        fused = m.apply(v, feats(4), method=m.extract)
        assert fused.shape == (4, T, D)


def test_composer_rejects_shifted_multi_branch():
    """shift is only defined for pair/cross/batch branches; a shifted
    multi/self spec must fail loudly instead of silently fusing unshifted
    (no reference fusion class shifts a multi or self stream)."""
    import pytest
    from litemkd_tpu.models.teacher import ComposedFusionTeacher
    from litemkd_tpu.models.teacher.composer import Branch
    rng = np.random.default_rng(9)
    mods = ("rgb", "depth", "flow")
    feats = {m: jnp.asarray(rng.normal(size=(WAY * SHOT, T, D))
                            .astype(np.float32)) for m in mods}
    labels = jnp.asarray(np.repeat(np.arange(WAY), SHOT).astype(np.int32))
    m = ComposedFusionTeacher(way=WAY, shot=SHOT, seq_len=T, in_dim=D,
                              out_dim=24, depth=1, modalities=mods,
                              branches=(Branch("multi", (0, 1, 2), shift=1),))
    with pytest.raises(ValueError, match="pair/cross/batch"):
        m.init(jax.random.key(0), feats, labels, feats, False)


def test_faithful_composer_presets():
    """The *_faithful presets reproduce the released cat-order quirks: the
    TwoTRXShuffleTime query side and the LR/Four/Five third-modality shifts
    degenerate to the identity (model.py:1516-1523, 2225-2240, 1731-1754)."""
    from litemkd_tpu.models.teacher import ComposedFusionTeacher, FUSION_PRESETS
    from litemkd_tpu.models.teacher.composer import _apply_side_shift
    rng = np.random.default_rng(7)

    # pad-mode shifts match the torch F.pad transcription
    x = jnp.asarray(rng.normal(size=(2, T, D)).astype(np.float32))
    left = np.concatenate([np.asarray(x)[:, 1:], np.zeros((2, 1, D), np.float32)], 1)
    right = np.concatenate([np.zeros((2, 1, D), np.float32), np.asarray(x)[:, :-1]], 1)
    np.testing.assert_array_equal(np.asarray(_apply_side_shift(x, ("pad", 1))), left)
    np.testing.assert_array_equal(np.asarray(_apply_side_shift(x, ("pad", -1))), right)

    # faithful TwoTRXShuffleTime: query-side branch shift is the identity —
    # its fused target equals a composer whose second branch has no shift;
    # the support side matches the symmetric-intent preset (roll both sides)
    mods = ("rgb", "depth")
    feats = {m: jnp.asarray(rng.normal(size=(4, T, D)).astype(np.float32))
             for m in mods}
    kw = dict(way=WAY, shot=SHOT, seq_len=T, in_dim=D, out_dim=24, depth=1,
              modalities=mods)
    m_faith = ComposedFusionTeacher(
        branches=FUSION_PRESETS["TwoTRXShuffleTime_faithful"], **kw)
    m_intent = ComposedFusionTeacher(
        branches=FUSION_PRESETS["TwoTRXShuffleTime"], **kw)
    m_plain = ComposedFusionTeacher(
        branches=(("pair", (0, 1), 0, "f"), ("pair", (0, 1), 0, "f")), **kw)
    labels = jnp.asarray(np.repeat(np.arange(WAY), SHOT).astype(np.int32))
    ctx = {m: jnp.asarray(rng.normal(size=(WAY * SHOT, T, D)).astype(np.float32))
           for m in mods}
    v = m_faith.init(jax.random.key(0), ctx, labels, feats, False)
    tgt_faith = m_faith.apply(v, feats, False, 1, method=m_faith.fuse)
    tgt_plain = m_plain.apply(v, feats, False, 1, method=m_plain.fuse)
    np.testing.assert_allclose(np.asarray(tgt_faith), np.asarray(tgt_plain),
                               rtol=1e-6)
    sup_faith = m_faith.apply(v, feats, False, 0, method=m_faith.fuse)
    sup_intent = m_intent.apply(v, feats, False, 0, method=m_intent.fuse)
    np.testing.assert_allclose(np.asarray(sup_faith), np.asarray(sup_intent),
                               rtol=1e-6)

    # every faithful preset trains/evals end-to-end
    for name, n_mod in [("ThreeTRXShuffleTime_faithful", 3),
                        ("ThreeTRXLRShiftLoopTime_faithful", 3),
                        ("FourShiftFusion_faithful", 4),
                        ("FiveShiftFusion_faithful", 5),
                        ("TwoCombinationShiftTRX_faithful", 3),
                        ("TwoCombinationTemTroShiftTRX_faithful", 3)]:
        mods_n = tuple(f"m{i}" for i in range(n_mod))
        mk = lambda n: {m: jnp.asarray(
            rng.normal(size=(n, T, D)).astype(np.float32)) for m in mods_n}
        m = ComposedFusionTeacher(way=WAY, shot=SHOT, seq_len=T, in_dim=D,
                                  out_dim=24, depth=1, modalities=mods_n,
                                  branches=FUSION_PRESETS[name])
        ctx_n, tgt_n = mk(WAY * SHOT), mk(WAY * QPC)
        v = m.init(jax.random.key(1), ctx_n, labels, tgt_n, False)
        out = m.apply(v, ctx_n, labels, tgt_n, False)
        assert out["logits"].shape == (WAY * QPC, WAY), name


def test_composer_new_kinds_and_sharing():
    """Cross/self/batch branch kinds, the cross combiner, the MLP post, the
    TwoRoad teacher, and reference-faithful parameter sharing."""
    from litemkd_tpu.models.teacher import (ComposedFusionTeacher,
                                            FUSION_PRESETS,
                                            FUSION_PRESET_OPTIONS,
                                            TwoRoadFusionTeacher)
    rng = np.random.default_rng(8)
    labels = jnp.asarray(np.repeat(np.arange(WAY), SHOT).astype(np.int32))

    def mk(n, mods):
        return {m: jnp.asarray(rng.normal(size=(n, T, D)).astype(np.float32))
                for m in mods}

    for name, n_mod in [("TwoCross", 2), ("ThreeCross", 3),
                        ("TwoCombinationCTX", 3), ("TwoCombinationTRX", 3),
                        ("ThreeCombinationTRX", 4), ("ThreeFusion3", 3),
                        ("TwoFusionBatchFusion", 2)]:
        mods = tuple(f"m{i}" for i in range(n_mod))
        m = ComposedFusionTeacher(way=WAY, shot=SHOT, seq_len=T, in_dim=D,
                                  out_dim=24, depth=1, modalities=mods,
                                  branches=FUSION_PRESETS[name],
                                  **FUSION_PRESET_OPTIONS.get(name, {}))
        ctx, tgt = mk(WAY * SHOT, mods), mk(WAY * QPC, mods)
        v = m.init(jax.random.key(0), ctx, labels, tgt, False)
        out = m.apply(v, ctx, labels, tgt, False)
        assert out["logits"].shape == (WAY * QPC, WAY), name

    # parameter sharing: TwoCombinationTRX's two pair branches use ONE fusion
    # module (the reference reuses self.fusion, model.py:1990-2020)
    mods3 = ("m0", "m1", "m2")
    m = ComposedFusionTeacher(way=WAY, shot=SHOT, seq_len=T, in_dim=D,
                              out_dim=24, depth=1, modalities=mods3,
                              branches=FUSION_PRESETS["TwoCombinationTRX"])
    v = m.init(jax.random.key(0), mk(WAY * SHOT, mods3), labels,
               mk(WAY * QPC, mods3), False)
    fusion_mods = [k for k in v["params"] if "TwoStreamFusion" in k
                   or "branch_modules" in k]
    assert len(fusion_mods) == 1, fusion_mods

    # TwoRoad teacher end-to-end + extract
    m = TwoRoadFusionTeacher(way=WAY, shot=SHOT, seq_len=T, in_dim=D,
                             out_dim=24, depth=1, modalities=mods3)
    ctx, tgt = mk(WAY * SHOT, mods3), mk(WAY * QPC, mods3)
    v = m.init(jax.random.key(0), ctx, labels, tgt, False)
    out = m.apply(v, ctx, labels, tgt, False)
    assert out["logits"].shape == (WAY * QPC, WAY)
    fused = m.apply(v, mk(4, mods3), method=m.extract)
    assert fused.shape == (4, T, D)


def test_batch_stat_fusion_formula():
    """BatchStatFusion == f1(x + (x − mean(w)) / (std(w)+eps)) with scalar
    unbiased std over ALL elements of w (model.py:2607-2619)."""
    from litemkd_tpu.models.teacher import BatchStatFusion
    rng = np.random.default_rng(9)
    x = rng.normal(size=(4, T, D)).astype(np.float32)
    w = rng.normal(size=(4, T, D)).astype(np.float32)
    m = BatchStatFusion(D)
    v = m.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(w), False)
    got = np.asarray(m.apply(v, jnp.asarray(x), jnp.asarray(w), False))
    k = np.asarray(v["params"]["f1"]["kernel"])
    b = np.asarray(v["params"]["f1"]["bias"])
    xf = x.reshape(-1, D)
    shifted = xf + (xf - w.mean()) / (w.std(ddof=1) + 1e-5)
    want = (shifted @ k + b).reshape(4, T, D)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_cross_attention_matches_torch_bert():
    """CrossAttentionFusion == the reference BertAttention
    (transformer.py:57-71) with transplanted weights, eval mode."""
    from litemkd_tpu.models.teacher import CrossAttentionFusion
    d, heads, n, tq, tk = 16, 2, 3, 4, 5
    rng = np.random.default_rng(10)
    x1 = rng.normal(size=(n, tq, d)).astype(np.float32)
    x2 = rng.normal(size=(n, tk, d)).astype(np.float32)
    m = CrossAttentionFusion(d, nhead=heads, dropout=0.0,
                             compute_dtype=jnp.float32)
    v = m.init(jax.random.key(0), jnp.asarray(x1), jnp.asarray(x2), False)
    got = np.asarray(m.apply(v, jnp.asarray(x1), jnp.asarray(x2), False))

    p = v["params"]

    def lin(name, x):
        return x @ np.asarray(p[name]["kernel"]) + np.asarray(p[name]["bias"])

    # BertSelfAttention math in numpy
    q = lin("query", x1).reshape(n, tq, heads, d // heads).transpose(0, 2, 1, 3)
    k = lin("key", x2).reshape(n, tk, heads, d // heads).transpose(0, 2, 1, 3)
    val = lin("value", x2).reshape(n, tk, heads, d // heads).transpose(0, 2, 1, 3)
    scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(d // heads)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    ctx = (probs @ val).transpose(0, 2, 1, 3).reshape(n, tq, d)
    out = lin("out", ctx) + x1
    mu = out.mean(-1, keepdims=True)
    var = out.var(-1, keepdims=True)
    want = ((out - mu) / np.sqrt(var + 1e-6)
            * np.asarray(p["norm"]["scale"]) + np.asarray(p["norm"]["bias"]))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_five_shift_multi_branch_is_three_stream():
    """The released FiveShiftFusion's multi branch is ThreeTransforTemproal
    over (m1,m2,m3) only (model.py:1803, called at l.1852) — no five-stream
    encoder exists in the reference."""
    from litemkd_tpu.models.teacher import FUSION_PRESETS
    for name in ("FiveShiftFusion", "FiveShiftFusion_faithful"):
        multi = [b for b in FUSION_PRESETS[name] if b.kind == "multi"]
        assert len(multi) == 1 and tuple(multi[0].idxs) == (0, 1, 2), name


def test_resolve_teacher_accepts_any_classifier():
    from litemkd_tpu.models.student import resolve_teacher
    assert resolve_teacher("test_teacher_TRX_2fcsup_fixed") == "TRX_2fcsup_fixed"
    # any registered classifier name passes straight through
    assert resolve_teacher("e_dist_fc2_sup_fixed") == "e_dist_fc2_sup_fixed"
    assert resolve_teacher("strm_1fc_sup") == "strm_1fc_sup"
    with pytest.raises(ValueError, match="unknown teacher head"):
        resolve_teacher("not_a_head")


def test_skeleton_backbone_keeps_module_name():
    """The 'backbone' module name is the pytree invariant the torch
    import/export tools address — lambdas in the registry must forward it."""
    from litemkd_tpu import preset
    from litemkd_tpu.models.student import make_backbone
    cfg = preset("tiny")
    for name in ("s3d", "skeleton", "feature"):
        assert make_backbone(name, cfg).name == "backbone", name


def test_three_trx_combination_dump_vs_live_asymmetry():
    """ThreeTRXCombination (model.py:3462, the scripts' combination_r+d+f
    model): the live forward fuses UNSHIFTED streams (model.py:3483-3489)
    while the released dump left-rolls m2 AND m3 (model.py:3513-3520). The
    preset's extract_branches reproduce the dump; the live path must equal a
    manually-built unshifted composer with the same parameters."""
    from litemkd_tpu.models.teacher import (Branch, ComposedFusionTeacher,
                                            FUSION_PRESETS,
                                            FUSION_PRESET_EXTRACT)
    rng = np.random.default_rng(13)
    mods = ("rgb", "depth", "flow")
    kw = dict(way=WAY, shot=SHOT, seq_len=T, in_dim=D, out_dim=24, depth=1,
              modalities=mods)
    m = ComposedFusionTeacher(
        branches=FUSION_PRESETS["ThreeTRXCombination"],
        extract_branches=FUSION_PRESET_EXTRACT["ThreeTRXCombination"], **kw)
    feats = {k: jnp.asarray(rng.normal(size=(4, T, D)).astype(np.float32))
             for k in mods}
    ctx = {k: jnp.asarray(rng.normal(size=(WAY * SHOT, T, D)).astype(np.float32))
           for k in mods}
    tgt = {k: jnp.asarray(rng.normal(size=(WAY * QPC, T, D)).astype(np.float32))
           for k in mods}
    labels = jnp.asarray(np.repeat(np.arange(WAY), SHOT).astype(np.int32))
    v = m.init(jax.random.key(0), ctx, labels, tgt, False)
    out = m.apply(v, ctx, labels, tgt, False)
    assert out["logits"].shape == (WAY * QPC, WAY)

    # live fusion == a composer with NO extract override and the same params
    live = m.apply(v, feats, False, method=m.fuse)
    plain = ComposedFusionTeacher(
        branches=FUSION_PRESETS["ThreeTRXCombination"], **kw)
    np.testing.assert_allclose(
        np.asarray(live), np.asarray(plain.apply(v, feats, False,
                                                 method=plain.fuse)),
        rtol=1e-6)

    # extract == fusing with the left-rolled pair branches (same modules)
    dump = m.apply(v, feats, method=m.extract)
    shifted = ComposedFusionTeacher(
        branches=FUSION_PRESET_EXTRACT["ThreeTRXCombination"], **kw)
    np.testing.assert_allclose(
        np.asarray(dump), np.asarray(shifted.apply(v, feats, False,
                                                   method=shifted.fuse)),
        rtol=1e-6)
    assert not np.allclose(np.asarray(dump), np.asarray(live))

    # override validation: module-for-module mismatch is rejected
    bad = ComposedFusionTeacher(
        branches=FUSION_PRESETS["ThreeTRXCombination"],
        extract_branches=(Branch("multi", (0, 1, 2)),
                          Branch("pair", (0, 1), 1, "f")), **kw)
    with pytest.raises(ValueError, match="module-for-module"):
        bad.init(jax.random.key(0), ctx, labels, tgt, False)


def test_two_ctx_shuffle_time_head():
    """TwoCTXShuffleTime (model.py:3083): the TwoTRXShuffleTime branch pair
    classified by CTXBranch — a FRAME-level TCT (CrossTransformer = TCT with
    set_size 1, model.py:3045-3077) instead of the tuple-level TrxBranch."""
    from litemkd_tpu.models.teacher import (ComposedFusionTeacher,
                                            FUSION_PRESETS,
                                            FUSION_PRESET_OPTIONS)
    rng = np.random.default_rng(17)
    mods = ("rgb", "depth")
    labels = jnp.asarray(np.repeat(np.arange(WAY), SHOT).astype(np.int32))
    mk = lambda n: {m: jnp.asarray(rng.normal(size=(n, T, D)).astype(np.float32))
                    for m in mods}
    for name in ("TwoCTXShuffleTime", "TwoCTXShuffleTime_faithful"):
        m = ComposedFusionTeacher(way=WAY, shot=SHOT, seq_len=T, in_dim=D,
                                  out_dim=24, depth=1, modalities=mods,
                                  branches=FUSION_PRESETS[name],
                                  **FUSION_PRESET_OPTIONS[name])
        ctx, tgt = mk(WAY * SHOT), mk(WAY * QPC)
        v = m.init(jax.random.key(0), ctx, labels, tgt, False)
        out = m.apply(v, ctx, labels, tgt, False)
        assert out["logits"].shape == (WAY * QPC, WAY), name
        # frame-level head: the classifier's TCT stack is set-size 1 only
        tcts = [k for k in v["params"]["classifier"]["transformers"]]
        assert tcts == ["tct_1"], (name, tcts)

    # unknown heads are rejected
    bad = ComposedFusionTeacher(way=WAY, shot=SHOT, seq_len=T, in_dim=D,
                                out_dim=24, depth=1, modalities=mods,
                                branches=FUSION_PRESETS["TwoCTXShuffleTime"],
                                head="nope")
    with pytest.raises(ValueError, match="unknown head"):
        bad.init(jax.random.key(0), mk(WAY * SHOT), labels, mk(WAY * QPC), False)
