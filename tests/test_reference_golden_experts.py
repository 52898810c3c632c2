"""Executing-reference goldens for the expert models (run.py ``--method``).

VERDICT r3 item 4: TRX's extract pooling, TRM, CNN_STRM,
Action_Recognition_Resnet50, S3D and CorrelationTRX had no
reference-executed golden. Here each class is constructed from the
reference's own bytecode (CNN trunks through tools/torchvision_stub), its
weights are shared into our models via the torch importers, and forwards /
extract paths are compared numerically. Geometry is off-canonical where the
reference is parametric (seq_len=4, shot=1, qpc=1, img 112px); way=5 stays
(the reference TCT hardcodes 5-way).
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import refexec
from refexec import requires_reference, t2n

from litemkd_tpu import preset
from litemkd_tpu.models import Student
from litemkd_tpu.models.backbones.classifier_net import ActionRecognitionNet
from litemkd_tpu.tools.torch_import import (load_cnn_strm_checkpoint,
                                            load_skeleton_expert_checkpoint,
                                            load_state_dict,
                                            load_student_checkpoint)

pytestmark = requires_reference

WAY, SHOT, QPC, T, IMG = 5, 1, 1, 4, 112
S, Q = WAY * SHOT, WAY * QPC
LABELS = np.repeat(np.arange(WAY), SHOT).astype(np.int64)


def _expert_args(method, d, temp_set=(2,), out_dim=128):
    return refexec.teacher_args(
        method=method, trans_linear_in_dim=d, trans_linear_out_dim=out_dim,
        temp_set=list(temp_set), seq_len=T, shot=SHOT, query_per_class=QPC,
        num_classes=7)


def _cfg(backbone, classifier, d, temp_set=(2,), out_dim=128):
    cfg = preset("tiny")
    return cfg.replace(
        episode=cfg.episode.__class__(**{**cfg.episode.__dict__,
                                         "way": WAY, "shot": SHOT,
                                         "query_per_class": QPC,
                                         "seq_len": T, "img_size": IMG}),
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "backbone": backbone,
                                     "classifier": classifier,
                                     "trans_linear_in_dim": d,
                                     "trans_linear_out_dim": out_dim,
                                     "temp_set": temp_set,
                                     "compute_dtype": "float32"}))


def _images(n, seed):
    """Shared pixel content: float in [0,1], torch NCHW / ours NTHWC."""
    r = np.random.default_rng(seed)
    x = r.random(size=(n, T, IMG, IMG, 3)).astype(np.float32)
    flat = torch.tensor(x.reshape(n * T, IMG, IMG, 3).transpose(0, 3, 1, 2))
    return x, flat


def _save(ref, tmp_path):
    path = str(tmp_path / "ref.pt")
    torch.save({"model_state_dict": ref.state_dict()}, path)
    return path


def test_trx_extract_feature_pooling_matches(tmp_path):
    """TRX.extract_feature (model.py:679-705): trunk → AdaptiveMaxPool2d(4,4)
    → 16-patch mean — the dump path behind extract_feature.py, which differs
    from the classification GAP. vs our ActionRecognitionNet.expert_features
    with the reference's own trunk weights."""
    nt = refexec.teacher_half()
    torch.manual_seed(61)
    ref = nt.model.TRX(_expert_args("resnet18", 512)).eval()
    sd = {k: t2n(v) for k, v in ref.state_dict().items()}

    from litemkd_tpu.tools.torch_import import import_resnet_trunk
    trunk_p, trunk_s = import_resnet_trunk(sd, 18, prefix="resnet.")
    net = ActionRecognitionNet(num_classes=7, depth=18,
                               compute_dtype=jnp.float32)
    clips, flat = _images(3, 62)
    variables = net.init(jax.random.key(0), jnp.asarray(clips), train=False)
    variables = {
        "params": {**variables["params"], "trunk": trunk_p},
        "batch_stats": {"trunk": trunk_s},
    }
    with torch.no_grad():
        want = t2n(ref.extract_feature(flat)).reshape(3, T, 512)
    got = np.asarray(net.apply(variables, jnp.asarray(clips), train=False,
                               method=net.expert_features))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_trm_forward_and_extract_match(tmp_path):
    """TRM (model.py:886-974): hardcoded resnet50 GAP trunk (children[:-1],
    avgpool retained) → per-temp_set TCT mean. Forward + extract_feature vs
    our Student(resnet50_gap + TRM head) through load_student_checkpoint's
    TRM dispatch (backbone.-prefixed artifact)."""
    nt = refexec.teacher_half()
    torch.manual_seed(63)
    ref = nt.model.TRM(_expert_args("resnet50", 2048, temp_set=(2, 3))).eval()
    path = _save(ref, tmp_path)

    cfg = _cfg("resnet50_gap", "TRM", 2048, temp_set=(2, 3))
    variables = load_student_checkpoint(path, cfg)
    model = Student(cfg)

    ctx, ctx_flat = _images(S, 64)
    tgt, tgt_flat = _images(Q, 65)
    with torch.no_grad():
        want = t2n(ref(ctx_flat, torch.tensor(LABELS), tgt_flat)["logits"])[0]
        want_ex = t2n(ref.extract_feature(ctx_flat))
    out = model.apply(variables, jnp.asarray(ctx), jnp.asarray(LABELS),
                      jnp.asarray(tgt), train=False)
    np.testing.assert_allclose(np.asarray(out["logits"]), want,
                               rtol=5e-4, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(out["context_features"]).reshape(want_ex.shape), want_ex,
        rtol=2e-4, atol=2e-4)


def test_correlation_trx_forward_matches(tmp_path):
    """CorrelationTRX (model.py:747-886): trunk → adap_max → patch mean
    (its attn_pat call is commented out) → TCT, plus the My_Loss support
    cosine ratio. Logits vs our Student(resnet18_expert + TRX); my_loss vs
    our registered my_loss distiller term is covered by the distiller
    goldens (test_reference_golden.py::test_distiller_full_dict...)."""
    nt = refexec.teacher_half()
    torch.manual_seed(66)
    ref = nt.model.CorrelationTRX(_expert_args("resnet18", 512)).eval()
    path = _save(ref, tmp_path)

    cfg = _cfg("resnet18_expert", "TRX", 512)
    variables = load_student_checkpoint(path, cfg)
    model = Student(cfg)

    ctx, ctx_flat = _images(S, 67)
    tgt, tgt_flat = _images(Q, 68)
    with torch.no_grad():
        out_ref = ref(ctx_flat, torch.tensor(LABELS), tgt_flat)
    want = t2n(out_ref["logits"])[0]
    got = model.apply(variables, jnp.asarray(ctx), jnp.asarray(LABELS),
                      jnp.asarray(tgt), train=False)["logits"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-3)


def test_cnn_strm_forward_matches(tmp_path):
    """CNN_STRM (model.py:3123-3344): trunk → adap_max → patch attention →
    patch mean, then the DistanceLoss (post_pat) and fr_enrich+TCT (fr)
    heads. vs Student(cnn_strm + strmclassifiers) through
    load_cnn_strm_checkpoint (identity lift; the reference's DistanceLoss
    weights live in a plain list and are ABSENT from its checkpoints, so
    clsW is copied from the live module)."""
    nt = refexec.teacher_half()
    torch.manual_seed(71)
    args = _expert_args("resnet18", 512)
    ref = nt.model.CNN_STRM(args).eval()
    # .eval() never reaches the DistanceLoss heads — they live in a plain
    # python LIST (model.py:3153), so the released post_pat logits keep
    # TRAIN-mode dropout at eval (pinned in
    # test_cnn_strm_distance_dropout_never_disabled). Deterministic golden:
    # put them in eval explicitly; our eval path is deterministic by design.
    for dl in ref.new_dist_loss_post_pat:
        dl.eval()
    path = _save(ref, tmp_path)

    # "strmbackbone" = STRMBackbone(depth=18, num_fc=1): the 512-dim analog
    # of the reference's resnet18 CNN_STRM (trans_linear_in_dim sets out_dim)
    cfg = _cfg("strmbackbone", "strmclassifiers", 512)
    variables = load_cnn_strm_checkpoint(path, cfg)
    model = Student(cfg)
    init_v = model.init(jax.random.key(0),
                        jnp.zeros((S, T, IMG, IMG, 3), jnp.float32),
                        jnp.asarray(LABELS),
                        jnp.zeros((Q, T, IMG, IMG, 3), jnp.float32),
                        train=False)
    clsW = ref.new_dist_loss_post_pat[0].clsW
    params = {**variables["params"]}
    params["classifier"] = {
        **params["classifier"],
        "distance": {"clsW": {"kernel": t2n(clsW.weight).T.copy(),
                              "bias": t2n(clsW.bias).copy()}},
    }
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(jax.tree_util.tree_map(
            lambda x: x, dict(init_v["params"])))
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    ctx, ctx_flat = _images(S, 72)
    tgt, tgt_flat = _images(Q, 73)
    with torch.no_grad():
        want = ref(ctx_flat, torch.tensor(LABELS), tgt_flat)
    got = model.apply(variables, jnp.asarray(ctx), jnp.asarray(LABELS),
                      jnp.asarray(tgt), train=False)["logits"]
    np.testing.assert_allclose(np.asarray(got["fr"]),
                               t2n(want["logits"])[0],
                               rtol=5e-4, atol=5e-3, err_msg="fr")
    np.testing.assert_allclose(np.asarray(got["pat"]),
                               t2n(want["logits_post_pat"])[0],
                               rtol=5e-4, atol=5e-3, err_msg="pat")


def test_cnn_strm_distance_dropout_never_disabled():
    """Executing proof of the quirk above: the released CNN_STRM's
    logits_post_pat differ across two identical eval-mode forwards (the
    list-held DistanceLoss keeps dropout active), while the module-held fr
    path is deterministic."""
    nt = refexec.teacher_half()
    torch.manual_seed(73)
    ref = nt.model.CNN_STRM(_expert_args("resnet18", 512)).eval()
    assert ref.new_dist_loss_post_pat[0].training  # .eval() didn't reach it
    ctx, ctx_flat = _images(S, 74)
    tgt, tgt_flat = _images(Q, 74)
    with torch.no_grad():
        a = ref(ctx_flat, torch.tensor(LABELS), tgt_flat)
        b = ref(ctx_flat, torch.tensor(LABELS), tgt_flat)
    assert not np.allclose(t2n(a["logits_post_pat"]),
                           t2n(b["logits_post_pat"]), atol=1e-6)
    np.testing.assert_allclose(t2n(a["logits"]), t2n(b["logits"]), rtol=1e-6)


def test_arr50_classification_matches(tmp_path):
    """Action_Recognition_Resnet50 (model.py:3345-3372): convnet (avgpool
    retained) → frame-mean → fc clip logits, plus the per-frame GAP
    extract_feature. vs our ActionRecognitionNet trunk/GAP through
    load_pretrain_init's convnet.-prefix ingestion (whose numeric-key depth
    probe this golden caught rejecting genuine artifacts)."""
    from litemkd_tpu.tools.torch_import import load_pretrain_init

    nt = refexec.teacher_half()
    torch.manual_seed(75)
    ref = nt.model.Action_Recognition_Resnet50(
        _expert_args("resnet50", 2048)).eval()
    path = _save(ref, tmp_path)

    cfg = _cfg("resnet50_gap", "TRX", 2048)
    warm = load_pretrain_init(path, cfg, "resnet50")
    net = ActionRecognitionNet(num_classes=7, depth=50,
                               compute_dtype=jnp.float32)
    clips, flat = _images(3, 76)
    clips_t = torch.tensor(clips.transpose(0, 1, 4, 2, 3))  # (B, T, 3, H, W)
    init_v = net.init(jax.random.key(0), jnp.asarray(clips), train=False)
    variables = {"params": {**init_v["params"], "trunk": warm["params"]["trunk"]},
                 "batch_stats": warm["batch_stats"]}
    with torch.no_grad():
        want = t2n(ref(clips_t))                     # (B, num_classes)
        want_ex = t2n(ref.extract_feature(flat))     # per-frame GAP
    sd = load_state_dict(path)
    feats = np.asarray(net.apply(variables, jnp.asarray(clips), train=False,
                                 method=net.features))
    got = feats.mean(axis=1) @ sd["fc.weight"].T + sd["fc.bias"]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(feats.reshape(3 * T, 2048), want_ex,
                               rtol=2e-4, atol=2e-4)


def test_s3d_forward_matches_reference_videoaxis(tmp_path):
    """S3D (model.py:2720-2818) FULL forward exact golden via the
    ``s3d_videoaxis`` backbone: the released t_tr omits batch_first, so it
    attends across the clip/video axis at each frame position (and the
    TrainablePE stays per-frame — ``pe[:, :x.size(1)]`` indexes dim 1 either
    way); the variant reproduces that exactly, so a reference-trained S3D
    skeleton expert replays its own logits here. Input geometry keeps the
    reference's ``reshape(-1, seq_len, d)`` an identity (one skeleton frame
    per video frame). The time-axis ``s3d`` backbone stays the default."""
    nt = refexec.teacher_half()
    torch.manual_seed(78)
    args = _expert_args("s3d", 64)
    ref = nt.model.S3D(args).eval()
    path = _save(ref, tmp_path)

    cfg = _cfg("s3d_videoaxis", "TRX", 64)
    variables = load_skeleton_expert_checkpoint(path, cfg)
    model = Student(cfg)

    r = np.random.default_rng(79)
    ctx = r.normal(size=(S, T, 17, 3)).astype(np.float32)
    tgt = r.normal(size=(Q, T, 17, 3)).astype(np.float32)
    with torch.no_grad():
        want = t2n(ref(torch.tensor(ctx), torch.tensor(LABELS),
                       torch.tensor(tgt))["logits"])[0]
    got = model.apply(variables, jnp.asarray(ctx), jnp.asarray(LABELS),
                      jnp.asarray(tgt), train=False)["logits"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-3)


def test_trx_forward_is_broken_as_released():
    """run.py's TRX training path is dead code: forward feeds the TCT
    (N·T, D, 16)-shaped tensors (no patch mean/permute, model.py:694-706 in
    the forward body) and returns logits_post_pat=zeros((1)), which TRXLoss
    then indexes out of range — executing proof for the round-2 note that
    our expert presets implement the evident intent instead."""
    nt = refexec.teacher_half()
    torch.manual_seed(81)
    ref = nt.model.TRX(_expert_args("resnet18", 512)).eval()
    ctx, ctx_flat = _images(S, 82)
    tgt, tgt_flat = _images(Q, 83)
    try:
        with torch.no_grad():
            out = ref(ctx_flat, torch.tensor(LABELS), tgt_flat)
        # if the garbage-shape TCT happens to run, the loss-side crash is
        # the zeros((1)) logits_post_pat the released TRXLoss indexes
        assert tuple(out["logits_post_pat"].shape) == (1,)
    except (RuntimeError, IndexError):
        pass  # TCT rejects the unreshaped (N·T, D, 16) input outright


def test_tsf_score_fusion_matches_reference(tmp_path):
    """TSF (model.py:1154-1191, score_fusion_run.py's model): one TrxBranch
    per modality, logits combined a·m1 + b·m2 + c·m3. vs our ScoreFusion
    with the reference's branch weights imported per modality."""
    from litemkd_tpu.tools.torch_import import load_composed_checkpoint
    from litemkd_tpu.train.teacher_steps import make_mfm

    nt = refexec.teacher_half()
    torch.manual_seed(85)
    args = refexec.teacher_args(shot=SHOT, query_per_class=QPC, seq_len=T,
                                m1="rgb", m2="depth", m3="flow",
                                a=0.5, b=1.25, c=2.0)
    ref = nt.model.TSF(args).eval()
    path = _save(ref, tmp_path)

    cfg = _cfg("feature", "TRX", 2048)
    cfg = cfg.replace(model=cfg.model.__class__(
        **{**cfg.model.__dict__, "modalities": ("rgb", "depth", "flow"),
           "trans_linear_out_dim": 1152}))
    variables = load_composed_checkpoint(path, cfg, "tsf")
    model = make_mfm(cfg, kind="tsf", batched=False,
                     score_weights=(0.5, 1.25, 2.0))

    r = np.random.default_rng(86)
    ctx = {m: r.normal(size=(S, T, 2048)).astype(np.float32)
           for m in ("rgb", "depth", "flow")}
    tgt = {m: r.normal(size=(Q, T, 2048)).astype(np.float32)
           for m in ("rgb", "depth", "flow")}
    with torch.no_grad():
        want = t2n(ref({m: torch.tensor(v) for m, v in ctx.items()},
                       torch.tensor(LABELS),
                       {m: torch.tensor(v) for m, v in tgt.items()})
                   ["logits"])[0]
    got = np.asarray(model.apply(
        variables, {m: jnp.asarray(v) for m, v in ctx.items()},
        jnp.asarray(LABELS), {m: jnp.asarray(v) for m, v in tgt.items()},
        False)["logits"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-3)


def test_baseline_forward_matches_reference(tmp_path):
    """Baseline (model.py:3373-3455): full torchvision resnet50 with
    fc=Identity (GAP via the model's own avgpool) → frame-mean embeddings →
    per-class MEAN cdist (not min, not squared), negated. vs our
    Student(resnet50_gap + e_dist) through the expert-checkpoint import
    (top-level resnet.* named keys, no TCT sets)."""
    nt = refexec.teacher_half()
    torch.manual_seed(88)
    ref = nt.model.Baseline(_expert_args("resnet50", 2048)).eval()
    path = _save(ref, tmp_path)

    # Baseline hardcodes 8-frame clips (reshape(-1, 8, 2048), model.py:3399)
    t8 = 8
    cfg = _cfg("resnet50_gap", "e_dist", 2048)
    cfg = cfg.replace(episode=cfg.episode.__class__(
        **{**cfg.episode.__dict__, "seq_len": t8}))
    variables = load_student_checkpoint(path, cfg)
    from litemkd_tpu.models import Student as _S
    model = _S(cfg)

    r = np.random.default_rng(89)
    ctx = r.random(size=(S, t8, IMG, IMG, 3)).astype(np.float32)
    tgt = r.random(size=(Q, t8, IMG, IMG, 3)).astype(np.float32)
    ctx_flat = torch.tensor(
        ctx.reshape(S * t8, IMG, IMG, 3).transpose(0, 3, 1, 2))
    tgt_flat = torch.tensor(
        tgt.reshape(Q * t8, IMG, IMG, 3).transpose(0, 3, 1, 2))
    with torch.no_grad():
        want = t2n(ref(ctx_flat, torch.tensor(LABELS), tgt_flat)["logits"])
    got = np.asarray(model.apply(variables, jnp.asarray(ctx),
                                 jnp.asarray(LABELS), jnp.asarray(tgt),
                                 train=False)["logits"])
    # conditioning note: trunk GAP features match to ~1e-4 (verified), but
    # random-init embeddings of different videos are nearly parallel, so the
    # head's distances are small differences of large vectors — fp32 conv
    # noise amplifies to ~1% on the logits. 2e-2 rel still rules out any
    # structural error (wrong pooling/mean/prototype order shifts logits
    # by O(1)).
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-3)


def test_teacher_ctx_forward_matches_reference_videoaxis(tmp_path):
    """Teacher-half CTX (model.py:2938-3014) FULL forward exact golden via
    ``classifier="CTX_videoaxis"`` + ``load_teacher_ctx_checkpoint``: the
    released TimeTransformer omits the transpose the compiled student-half
    CTX performs (video-axis attention) and never applies its ``f1`` — both
    reproduced by the variant, so a reference-trained teacher CTX replays
    its own logits here; the time-axis ``CTX`` head stays the default.
    Geometry notes: the class hardcodes 2048-dim TimeTransformer /
    CrossTransformer inputs (only --method resnet50 is coherent) and its
    ``reshape(-1, 512, 16)`` patch pooling is algebraically the plain
    per-channel patch mean (see load_teacher_ctx_checkpoint)."""
    from litemkd_tpu.tools.torch_import import load_teacher_ctx_checkpoint

    nt = refexec.teacher_half()
    torch.manual_seed(95)
    args = _expert_args("resnet50", 2048)
    args.mode = "x"
    ref = nt.model.CTX(args).eval()
    path = _save(ref, tmp_path)

    cfg = _cfg("resnet50_student", "CTX_videoaxis", 2048)
    variables = load_teacher_ctx_checkpoint(path, cfg)
    model = Student(cfg)

    ctx, ctx_flat = _images(S, 96)
    tgt, tgt_flat = _images(Q, 97)
    with torch.no_grad():
        want = t2n(ref(ctx_flat, torch.tensor(LABELS), tgt_flat, "x")
                   ["logits"])[0]
    got = model.apply(variables, jnp.asarray(ctx), jnp.asarray(LABELS),
                      jnp.asarray(tgt), train=False)["logits"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=1e-3)


def test_cli_and_dispatch_ingest_videoaxis_artifacts(tmp_path):
    """Product surface for the video-axis importers: (a) a teacher-half CTX
    .pt evaluates through ``cli.test -m`` (load_student_checkpoint routes on
    the time_trans keys); (b) an S3D .pt routes to the skeleton importer
    from the same dispatch."""
    from litemkd_tpu.cli import test as cli_test
    from litemkd_tpu.tools.torch_import import load_student_checkpoint

    nt = refexec.teacher_half()
    torch.manual_seed(98)
    args = _expert_args("resnet50", 2048)
    args.mode = "x"
    ctx_ref = nt.model.CTX(args).eval()
    ctx_path = str(tmp_path / "ctx.pt")
    torch.save({"model_state_dict": ctx_ref.state_dict()}, ctx_path)

    s = cli_test.main([
        "--dataset", "synthetic", "--way", str(WAY), "--shot", str(SHOT),
        "--query_per_class", str(QPC), "--query_per_class_test", "1",
        "--seq_len", str(T), "--img_size", str(IMG),
        "--model_backbone", "resnet50_student",
        "--model_classifier", "CTX_videoaxis",
        "--trans_linear_in_dim", "2048", "--trans_linear_out_dim", "128",
        "-m", ctx_path, "--num_test_tasks", "2"])
    assert s["n_tasks"] == 2

    torch.manual_seed(99)
    s3d_ref = nt.model.S3D(_expert_args("s3d", 64)).eval()
    s3d_path = str(tmp_path / "s3d.pt")
    torch.save({"model_state_dict": s3d_ref.state_dict()}, s3d_path)
    cfg = _cfg("s3d_videoaxis", "TRX", 64)
    v1 = load_student_checkpoint(s3d_path, cfg)
    v2 = load_skeleton_expert_checkpoint(s3d_path, cfg)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
