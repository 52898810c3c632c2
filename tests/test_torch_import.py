"""Torch-checkpoint importer tests: functional equivalence torch ↔ flax.

Uses the from-scratch torch models in tools/torch_cpu_baseline.py as the
weight source (renamed to torchvision conventions), so the test checks the
whole chain: torch forward == flax forward with imported weights.
"""
import sys, os
import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from torch_cpu_baseline import ResNet18Trunk, TCT as TorchTCT  # noqa: E402

from litemkd_tpu.models import ResNetTrunk
from litemkd_tpu.ops import TemporalCrossTransformer
from litemkd_tpu.tools import import_resnet_trunk, import_tct
from litemkd_tpu import preset


def _baseline_to_torchvision_names(tm: ResNet18Trunk):
    """Map the baseline trunk's state dict to torchvision resnet18 names."""
    sd = {}
    raw = tm.state_dict()
    ren = {"stem.0": "conv1", "stem.1": "bn1"}
    for i in range(8):
        stage, blk = i // 2 + 1, i % 2
        ren[f"layers.{i}.c1"] = f"layer{stage}.{blk}.conv1"
        ren[f"layers.{i}.b1"] = f"layer{stage}.{blk}.bn1"
        ren[f"layers.{i}.c2"] = f"layer{stage}.{blk}.conv2"
        ren[f"layers.{i}.b2"] = f"layer{stage}.{blk}.bn2"
        ren[f"layers.{i}.down.0"] = f"layer{stage}.{blk}.downsample.0"
        ren[f"layers.{i}.down.1"] = f"layer{stage}.{blk}.downsample.1"
    for k, v in raw.items():
        for old, new in sorted(ren.items(), key=lambda kv: -len(kv[0])):
            if k.startswith(old + "."):
                k = new + k[len(old):]
                break
        sd[k] = v.numpy()
    return sd


def test_resnet_trunk_import_matches_torch_forward():
    torch.manual_seed(0)
    tm = ResNet18Trunk().eval()
    sd = _baseline_to_torchvision_names(tm)
    params, stats = import_resnet_trunk(sd, depth=18)

    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    trunk = ResNetTrunk(depth=18, compute_dtype=jnp.float32)
    got = trunk.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_expert_features_match_torch_extract_feature():
    """ActionRecognitionNet.expert_features ≡ the reference expert dump
    (model.py:679-703): trunk → AdaptiveMaxPool2d((4,4)) → mean over the 16
    patches. The dump math is NOT the GAP pooling of the classification
    path (model.py:3357) — the trees extract_feature.py writes use this."""
    from litemkd_tpu.models.backbones.classifier_net import ActionRecognitionNet

    torch.manual_seed(9)
    tm = ResNet18Trunk().eval()
    sd = _baseline_to_torchvision_names(tm)
    params, stats = import_resnet_trunk(sd, depth=18)

    B, T = 2, 3
    x = np.random.default_rng(1).random((B, T, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        xt = torch.tensor(x.reshape(-1, 64, 64, 3)).permute(0, 3, 1, 2)
        f = tm(xt)                                          # (BT, 512, h, w)
        f = torch.nn.AdaptiveMaxPool2d((4, 4))(f)
        want = (f.reshape(f.shape[0], 512, 16).permute(0, 2, 1)
                .mean(dim=1).reshape(B, T, 512).numpy())

    net = ActionRecognitionNet(num_classes=2, depth=18,
                               compute_dtype=jnp.float32)
    variables = net.init(jax.random.key(0),
                         jnp.zeros((1, 1, 64, 64, 3), jnp.float32),
                         train=False)
    variables = {"params": {**variables["params"], "trunk": params},
                 "batch_stats": {"trunk": stats}}
    got = net.apply(variables, jnp.asarray(x), train=False,
                    method=net.expert_features)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_tct_import_matches_torch_forward():
    torch.manual_seed(1)
    tm = TorchTCT().eval()
    ren = {"k": "k_linear", "v": "v_linear", "ln": "norm_k"}
    sd = {f"transformers.{ren.get(k.split('.')[0], k.split('.')[0])}.{k.split('.', 1)[1]}": v.numpy()
          for k, v in tm.state_dict().items() if "." in k}
    tct_params = import_tct(sd, "transformers")

    WAY, SHOT, T, D = 5, 5, 8, 2048
    rng = np.random.default_rng(0)
    support = rng.normal(size=(WAY * SHOT, T, D)).astype(np.float32)
    labels = np.repeat(np.arange(WAY), SHOT).astype(np.int32)
    queries = rng.normal(size=(4, T, D)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(support), torch.tensor(labels).long(),
                  torch.tensor(queries)).numpy()

    m = TemporalCrossTransformer(way=WAY, shot=SHOT, seq_len=T, in_dim=D,
                                 out_dim=1152)
    # torch LayerNorm eps=1e-5 vs flax default 1e-6 — tolerance absorbs it
    got = m.apply({"params": tct_params}, jnp.asarray(support),
                  jnp.asarray(labels), jnp.asarray(queries), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=2e-2)


def test_teacher_checkpoint_roundtrip(tmp_path):
    """Write a reference-style teacher .pt (bracnch.transformers.0.* keys) and
    load it through load_teacher_checkpoint."""
    torch.manual_seed(2)
    tm = TorchTCT()
    ren = {"k": "k_linear", "v": "v_linear", "ln": "norm_k"}
    sd = {f"bracnch.transformers.0.{ren.get(k.split('.')[0], k.split('.')[0])}.{k.split('.', 1)[1]}": v
          for k, v in tm.state_dict().items() if "." in k}
    path = str(tmp_path / "teacher.pt")
    torch.save({"iteration": 123, "model_state_dict": sd}, path)

    from litemkd_tpu.tools import load_teacher_checkpoint
    cfg = preset("student_fc2sup_dist")
    tvars = load_teacher_checkpoint(path, cfg)
    tct = tvars["params"]["classifier"]["transformers"]
    assert tct["k_linear"]["kernel"].shape == (4096, 1152)
    assert tct["norm_k"]["scale"].shape == (1152,)


def test_full_student_pipeline_matches_torch():
    """Golden end-to-end parity: resnet18_2fc backbone + TRX_2fcsup head with
    shared weights — torch forward vs flax forward on one episode (eval mode)."""
    import torch.nn.functional as F
    from torch_cpu_baseline import (StudentBackbone2FC, TCT as TorchTCT,
                                    support_dk)
    from litemkd_tpu import preset
    from litemkd_tpu.models import Student
    from litemkd_tpu.tools import import_backbone_2fc, import_tct
    import jax.numpy as jnp

    torch.manual_seed(3)
    tb = StudentBackbone2FC().eval()
    tt = TorchTCT().eval()

    # export torch weights under reference-style names
    sd = {}
    for k, v in _baseline_to_torchvision_names(tb.trunk).items():
        sd[f"resnet.{k}"] = v
    for head in ("fc1", "fc2"):
        for p in ("weight", "bias"):
            sd[f"{head}.{p}"] = getattr(tb, head).state_dict()[p].numpy()
    ren = {"k": "k_linear", "v": "v_linear", "ln": "norm_k"}
    for k, v in tt.state_dict().items():
        if "." not in k:
            continue
        root, rest = k.split(".", 1)
        sd[f"transformers.{ren.get(root, root)}.{rest}"] = v.numpy()

    cfg = preset("student_fc2sup_dist")
    cfg = cfg.replace(episode=cfg.episode.__class__(
        way=5, shot=5, query_per_class=1, seq_len=8, img_size=64),
        model=cfg.model.__class__(compute_dtype="float32"))
    bb = import_backbone_2fc(sd, depth=18)
    variables = {
        "params": {"backbone": bb["params"],
                   "classifier": {"transformers": import_tct(sd, "transformers")}},
        "batch_stats": {"backbone": bb["batch_stats"]},
    }

    rng = np.random.default_rng(0)
    S, Q, T = 25, 5, 8
    ctx = rng.random((S, T, 64, 64, 3)).astype(np.float32)
    tgt = rng.random((Q, T, 64, 64, 3)).astype(np.float32)
    labels = np.repeat(np.arange(5), 5).astype(np.int32)

    # torch forward (NCHW, flattened frames)
    with torch.no_grad():
        tc = torch.tensor(ctx.reshape(S * T, 64, 64, 3)).permute(0, 3, 1, 2)
        tq = torch.tensor(tgt.reshape(Q * T, 64, 64, 3)).permute(0, 3, 1, 2)
        c1, c2 = tb(tc)
        q1, q2 = tb(tq)
        t_kl = tt(c1, torch.tensor(labels).long(), q1).numpy()
        t_ce = tt(c2, torch.tensor(labels).long(), q2).numpy()
        t_sup = support_dk(c2, torch.tensor(labels).long()).numpy()

    model = Student(cfg)
    out = model.apply(variables, jnp.asarray(ctx), jnp.asarray(labels),
                      jnp.asarray(tgt), train=False)
    logits = out["logits"]
    np.testing.assert_allclose(np.asarray(logits["kl"]), t_kl, rtol=2e-2,
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(logits["ce"]), t_ce, rtol=2e-2,
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(logits["sup"]), t_sup, rtol=2e-2,
                               atol=2e-2)
    # and predictions agree exactly
    np.testing.assert_array_equal(
        np.argmax(np.asarray(logits["kl"]) + np.asarray(logits["ce"]), -1),
        np.argmax(t_kl + t_ce, -1))


@pytest.mark.parametrize("backbone,classifier", [
    ("resnet18_2fc", "TRX_2fcsup"),
    ("mobilenetv3_large_2fc", "TRX_2fcsup"),
    ("resnet18_student", "CTX"),   # compiled-head layout incl. time_trans
])
def test_torch_export_roundtrip(tmp_path, backbone, classifier):
    """export_student_checkpoint → load_student_checkpoint returns the same
    trunk/fc/classifier weights (the jax→torch→jax interop loop; the CTX
    case locks the full compiled-head layout, time_trans included)."""
    import jax
    import jax.numpy as jnp
    from litemkd_tpu import preset
    from litemkd_tpu.data import SyntheticEpisodeSource
    from litemkd_tpu.train import create_train_state
    from litemkd_tpu.tools.torch_export import export_student_checkpoint
    from litemkd_tpu.tools.torch_import import load_student_checkpoint

    base = preset("tiny")
    cfg = base.replace(model=base.model.__class__(
        backbone=backbone, classifier=classifier,
        trans_linear_in_dim=32, trans_linear_out_dim=24))
    src = SyntheticEpisodeSource(cfg, n_classes=6, seed=0,
                                 with_teacher_feats=False)
    batch = src.sample_batch(np.random.default_rng(0), 2)
    state, _ = create_train_state(cfg, jax.random.key(0), batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    path = str(tmp_path / "student.pt")
    sd = export_student_checkpoint(variables, cfg, path, iteration=7)
    # every reference loader is a strict load_state_dict and every reference
    # TCT registers its pe buffer at int(1.5*seq_len) (TRX.py:57) — any other
    # exported shape fails to load in the reference codebase
    pe_keys = [k for k in sd if k.endswith("pe.pe")]
    assert pe_keys
    for k in pe_keys:
        assert sd[k].shape[1] == int(1.5 * cfg.episode.seq_len), k
    if classifier == "TRX_2fcsup":
        # student classifiers hold their TCT directly (TRX_2fcsup.py:202) —
        # an indexed .0 key set fails the reference's strict load_student
        assert "classifier.transformers.k_linear.weight" in sd

    restored = load_student_checkpoint(path, cfg)
    want_flat = jax.tree_util.tree_leaves_with_path(variables)
    got = restored
    # compare every leaf that the reference layout round-trips (all of them
    # for resnet18_2fc + single-TCT heads)
    def flat(d, prefix=""):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out.update(flat(v, prefix + k + "/"))
            else:
                out[prefix + k] = np.asarray(v)
        return out

    want_p = flat(jax.tree_util.tree_map(np.asarray, variables["params"]))
    got_p = flat(got["params"])
    assert set(got_p) == set(want_p), (
        set(got_p) ^ set(want_p))
    for k in want_p:
        np.testing.assert_allclose(got_p[k], want_p[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)
    want_s = flat(jax.tree_util.tree_map(np.asarray, variables["batch_stats"]))
    got_s = flat(got["batch_stats"])
    assert set(got_s) == set(want_s)
    for k in want_s:
        np.testing.assert_allclose(got_s[k], want_s[k], rtol=1e-6, err_msg=k)


def test_torch_export_teacher_roundtrip(tmp_path):
    import jax
    from litemkd_tpu import preset
    from litemkd_tpu.data import SyntheticEpisodeSource
    from litemkd_tpu.train import create_train_state
    from litemkd_tpu.tools.torch_export import export_teacher_checkpoint
    from litemkd_tpu.tools.torch_import import load_teacher_checkpoint

    base = preset("tiny")
    cfg = base.replace(model=base.model.__class__(
        trans_linear_in_dim=32, trans_linear_out_dim=24))
    src = SyntheticEpisodeSource(cfg, n_classes=6, seed=0,
                                 with_teacher_feats=True)
    batch = src.sample_batch(np.random.default_rng(0), 2)
    _, t_vars = create_train_state(cfg, jax.random.key(0), batch)
    path = str(tmp_path / "teacher.pt")
    export_teacher_checkpoint(t_vars, cfg, path)
    restored = load_teacher_checkpoint(path, cfg)
    want = t_vars["params"]["classifier"]["transformers"]
    if "k_linear" not in want:
        want = want[sorted(k for k in want if k.startswith("tct_"))[0]]
    got = restored["params"]["classifier"]["transformers"]
    for mod in ("k_linear", "v_linear", "norm_k"):
        for leaf in got[mod]:
            np.testing.assert_allclose(np.asarray(got[mod][leaf]),
                                       np.asarray(want[mod][leaf]), rtol=1e-6)


# ---------------------------------------------------------------------------
# MobileNetV3 import: from-scratch torch transcription with torchvision's
# module naming (features.N.block.M...) as the weight source
# ---------------------------------------------------------------------------

def _tv_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _TorchSE(torch.nn.Module):
    """torchvision SqueezeExcitation: 1x1-conv fc1/fc2, hardsigmoid scale."""

    def __init__(self, ch, squeeze):
        super().__init__()
        self.fc1 = torch.nn.Conv2d(ch, squeeze, 1)
        self.fc2 = torch.nn.Conv2d(squeeze, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.nn.functional.relu(self.fc1(s))
        s = torch.nn.functional.hardsigmoid(self.fc2(s))
        return x * s


def _cba(cin, cout, k, s, groups=1, hs=True, act=True):
    layers = [torch.nn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups,
                              bias=False),
              torch.nn.BatchNorm2d(cout, eps=1e-3)]
    if act:
        layers.append(torch.nn.Hardswish() if hs else torch.nn.ReLU())
    return torch.nn.Sequential(*layers)


class _TorchIR(torch.nn.Module):
    def __init__(self, cin, k, e, o, se, hs, s):
        super().__init__()
        layers = []
        if e != cin:
            layers.append(_cba(cin, e, 1, 1, hs=hs))
        layers.append(_cba(e, e, k, s, groups=e, hs=hs))
        if se:
            layers.append(_TorchSE(e, _tv_divisible(e / 4)))
        layers.append(_cba(e, o, 1, 1, act=False))
        self.block = torch.nn.Sequential(*layers)
        self.use_res = s == 1 and cin == o

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class TorchMobileNetV3(torch.nn.Module):
    def __init__(self, variant="large"):
        super().__init__()
        from litemkd_tpu.models.backbones.mobilenet import (_LARGE, _SMALL,
                                                            _LAST_CH)
        specs = _LARGE if variant == "large" else _SMALL
        feats = [_cba(3, 16, 3, 2, hs=True)]
        cin = 16
        for (k, e, o, se, hs, s) in specs:
            feats.append(_TorchIR(cin, k, e, o, se, hs, s))
            cin = o
        feats.append(_cba(cin, _LAST_CH[variant], 1, 1, hs=True))
        self.features = torch.nn.Sequential(*feats)

    def forward(self, x):
        return self.features(x)


@pytest.mark.parametrize("variant", ["large", "small"])
def test_mobilenet_trunk_import_matches_torch_forward(variant):
    from litemkd_tpu.models.backbones.mobilenet import MobileNetV3Trunk
    from litemkd_tpu.tools import import_mobilenet_trunk

    torch.manual_seed(0)
    tm = TorchMobileNetV3(variant).eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    g = torch.Generator().manual_seed(1)
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.rand(m.running_mean.shape,
                                            generator=g) - 0.5)
            m.running_var.copy_(torch.rand(m.running_var.shape,
                                           generator=g) + 0.5)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = import_mobilenet_trunk(sd, variant)

    x = np.random.default_rng(2).random((2, 64, 64, 3), np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    trunk = MobileNetV3Trunk(variant, compute_dtype=jnp.float32)
    got = trunk.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)


def test_mobilenet_student_checkpoint_import(tmp_path):
    """A reference-layout mobile_large_2fc checkpoint (backbone.mobile.0.* +
    fc1/fc2 + TRX head) loads into the flax mobilenet student."""
    from litemkd_tpu.tools.torch_import import load_student_checkpoint
    from litemkd_tpu.models import BatchedStudent
    from litemkd_tpu import preset

    torch.manual_seed(3)
    tm = TorchMobileNetV3("large")
    sd = {}
    for k, v in tm.state_dict().items():
        assert k.startswith("features.")
        sd["backbone.mobile.0." + k[len("features."):]] = v
    for head in ("fc1", "fc2"):
        lin = torch.nn.Linear(960, 64)
        sd[f"backbone.{head}.weight"] = lin.weight.detach()
        sd[f"backbone.{head}.bias"] = lin.bias.detach()
    # TRX_2fcsup head at the test dims (in 2·64 tuple-pairs → dk 32)
    for name, lin in (("k_linear", torch.nn.Linear(128, 32)),
                      ("v_linear", torch.nn.Linear(128, 32)),
                      ("norm_k", torch.nn.LayerNorm(32)),
                      ("norm_v", torch.nn.LayerNorm(32))):
        for p, v in lin.state_dict().items():
            # student classifiers assign their TCT directly — no ModuleList
            # index in real reference checkpoints (TRX_2fcsup.py:202)
            sd[f"classifier.transformers.{name}.{p}"] = v
    path = tmp_path / "student.pt"
    torch.save({"model_state_dict": sd}, path)

    base = preset("tiny")
    cfg = base.replace(model=base.model.__class__(**{
        **base.model.__dict__, "backbone": "mobilenetv3_large_2fc",
        "trans_linear_in_dim": 64, "trans_linear_out_dim": 32}))
    variables = load_student_checkpoint(str(path), cfg)
    ep = cfg.episode
    model = BatchedStudent(cfg)
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.integers(0, 255, (1, ep.n_support, ep.seq_len,
                                            ep.img_size, ep.img_size, 3),
                                   dtype=np.uint8))
    tgt = jnp.asarray(rng.integers(0, 255, (1, ep.n_queries(True), ep.seq_len,
                                            ep.img_size, ep.img_size, 3),
                                   dtype=np.uint8))
    labels = jnp.asarray(np.tile(np.repeat(np.arange(ep.way), ep.shot),
                                 (1, 1)).astype(np.int32))
    out = model.apply(variables, ctx, labels, tgt, train=False)
    merged = np.asarray(out["logits"]["kl"])
    assert merged.shape == (1, ep.n_queries(True), ep.way)
    assert np.isfinite(merged).all()


# ---------------------------------------------------------------------------
# MFM fusion-teacher import: reference-named torch modules as weight source
# ---------------------------------------------------------------------------

class _TorchTrainablePE(torch.nn.Module):
    """Reference TrainablePositionalEncoding (model.py:1135-1153)."""

    def __init__(self, t, d):
        super().__init__()
        self.position_embeddings = torch.nn.Embedding(t, d)
        self.LayerNorm = torch.nn.LayerNorm(d)

    def forward(self, x):
        ids = torch.arange(x.shape[1])
        return self.LayerNorm(x + self.position_embeddings(ids)[None])


class _TorchTwoFusion(torch.nn.Module):
    """Reference TwoTransforFusion (model.py:1361-1393), eval-mode ops."""

    def __init__(self, t, d, depth, n_streams=2, nhead=None):
        super().__init__()
        self.n = n_streams
        for i in range(n_streams):
            setattr(self, f"positionEncoding{i + 1}", _TorchTrainablePE(t, d))
        layer = torch.nn.TransformerEncoderLayer(
            n_streams * d, nhead or (3 if n_streams == 3 else 2),
            batch_first=True)
        self.transformer_encoder = torch.nn.TransformerEncoder(layer, depth)
        self.f1 = torch.nn.Linear(n_streams * d, d)

    def forward(self, *streams):
        enc = [getattr(self, f"positionEncoding{i + 1}")(s)
               for i, s in enumerate(streams)]
        return self.f1(self.transformer_encoder(torch.cat(enc, -1)))


def test_stream_fusion_import_matches_torch():
    """import_stream_fusion: reference Two/ThreeTransforFusion weights →
    our fusion modules, forward parity in eval mode."""
    from litemkd_tpu.models.teacher import TwoStreamFusion, ThreeStreamFusion
    from litemkd_tpu.tools.torch_import import import_stream_fusion
    import jax

    T_, D_, DEPTH = 4, 32, 2
    torch.manual_seed(5)
    for n, flax_cls in ((2, TwoStreamFusion), (3, ThreeStreamFusion)):
        holder = torch.nn.Module()
        holder.fusion = _TorchTwoFusion(T_, D_, DEPTH, n_streams=n)
        holder.eval()
        sd = {k: v.detach().numpy() for k, v in holder.state_dict().items()}
        params = import_stream_fusion(sd, "fusion", n, D_, DEPTH)

        rng = np.random.default_rng(n)
        streams = [rng.standard_normal((5, T_, D_)).astype(np.float32)
                   for _ in range(n)]
        with torch.no_grad():
            want = holder.fusion(*[torch.from_numpy(s) for s in streams]
                                 ).numpy()
        m = flax_cls(seq_len=T_, d=D_, depth=DEPTH)
        got = m.apply({"params": params}, *[jnp.asarray(s) for s in streams],
                      False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


class _TorchCompiledCTX(torch.nn.Module):
    """Transcription of the compiled-only classifiers/CTX.pyc head (read via
    tools/pyc_reader.py): Time_Transformer = trainable PE → transpose →
    2-layer nhead-8 TransformerEncoder (NOT batch_first — after the
    transpose it attends over time) → f1 Linear (+ eval-no-op dropouts),
    applied to both sides, then TemporalCrossTransformer_gai = the shipped
    TCT (TRX.py:75-150) over single-frame tuples: sinusoidal PE, norm_k on
    both key streams, norm_v defined but UNUSED, -||diff||²/seq_len."""

    def __init__(self, t, d, dk, way):
        super().__init__()
        import math
        self.way, self.dk, self.t = way, dk, t
        self.positionEncoding = _TorchTrainablePE(t, d)
        layer = torch.nn.TransformerEncoderLayer(d, 8)
        self.transformer_encoder = torch.nn.TransformerEncoder(layer, 2)
        self.f1 = torch.nn.Linear(d, d)
        self.k_linear = torch.nn.Linear(d, dk)
        self.v_linear = torch.nn.Linear(d, dk)
        self.norm_k = torch.nn.LayerNorm(dk)
        self.norm_v = torch.nn.LayerNorm(dk)   # the unused-norm_v quirk
        pe = torch.zeros(t, d)
        pos = torch.arange(t).unsqueeze(1).float()
        div = torch.exp(torch.arange(0, d, 2).float()
                        * -(math.log(1e4) / d))
        pe[:, 0::2] = torch.sin(pos * div) * 0.1
        pe[:, 1::2] = torch.cos(pos * div) * 0.1
        self.register_buffer("sin_pe", pe)

    def _time(self, x):                        # (N,T,D) → (N,T,D)
        x = self.positionEncoding(x)
        f = self.transformer_encoder(x.transpose(0, 1))
        return self.f1(f).transpose(0, 1)      # CTX.forward transposes back

    def forward(self, ctx, labels, tgt):
        import math
        s, q = self._time(ctx) + self.sin_pe, self._time(tgt) + self.sin_pe
        s_k, q_k = self.norm_k(self.k_linear(s)), self.norm_k(self.k_linear(q))
        s_v, q_v = self.v_linear(s), self.v_linear(q)
        out = torch.zeros(q.shape[0], self.way)
        for c in range(self.way):
            idx = (labels == c).nonzero().reshape(-1)
            ck, cv = s_k[idx], s_v[idx]                           # (S,T,dk)
            scores = torch.einsum("qud,svd->qusv", q_k, ck) \
                / math.sqrt(self.dk)
            att = torch.softmax(
                scores.reshape(q.shape[0], self.t, -1), dim=-1)
            att = att.reshape(q.shape[0], self.t, -1, self.t)
            proto = torch.einsum("qusv,svd->qud", att, cv)
            diff = q_v - proto
            out[:, c] = -(torch.norm(diff, dim=[-2, -1]) ** 2) / self.t
        return out


def test_ctx_import_matches_torch_forward():
    """import_ctx_classifier: a reference-layout CTX student classifier
    (classifier.time_trans.* + classifier.transformers.*) loads into
    CTXClassifier with full forward parity — previously the TCT alone would
    import, silently leaving time_trans at random init."""
    from litemkd_tpu.models.classifiers.ctx import CTXClassifier
    from litemkd_tpu.tools import import_ctx_classifier

    WAY_, SHOT_, T_, D_, DK_ = 3, 2, 4, 32, 16
    torch.manual_seed(7)
    tm = _TorchCompiledCTX(T_, D_, DK_, WAY_).eval()
    sd = {}
    for k, v in tm.state_dict().items():
        if k == "sin_pe":
            continue   # parameterless sinusoidal buffer
        where = ("time_trans" if k.startswith(
            ("positionEncoding", "transformer_encoder", "f1"))
            else "transformers")
        sd[f"classifier.{where}.{k}"] = v.numpy()
    params = import_ctx_classifier(sd)

    rng = np.random.default_rng(8)
    ctx = rng.standard_normal((WAY_ * SHOT_, T_, D_)).astype(np.float32)
    tgt = rng.standard_normal((4, T_, D_)).astype(np.float32)
    labels = np.repeat(np.arange(WAY_), SHOT_).astype(np.int32)
    with torch.no_grad():
        want = tm(torch.from_numpy(ctx), torch.from_numpy(labels).long(),
                  torch.from_numpy(tgt)).numpy()

    head = CTXClassifier(way=WAY_, shot=SHOT_, seq_len=T_, in_dim=D_,
                         out_dim=DK_)
    got = head.apply({"params": params}, jnp.asarray(ctx),
                     jnp.asarray(labels), jnp.asarray(tgt), False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_load_mfm_checkpoint_runs_extraction(tmp_path):
    """A reference-layout ThreeTRXShiftLoopTime .pt loads into MFMTeacher and
    fused-feature extraction numerically matches the reference's
    extract_feature math (model.py:1648-1663: three_fusion over the raw
    trio + pair branches with BOTH depth and flow LEFT-rolled — note the
    released forward identity-shifts flow instead; the dump path rolls it)."""
    from litemkd_tpu import preset
    from litemkd_tpu.tools.torch_import import load_mfm_checkpoint
    from litemkd_tpu.train.teacher_steps import make_mfm

    T_, D_, DEPTH = 4, 32, 1
    torch.manual_seed(6)
    holder = torch.nn.Module()
    holder.three_fusion = _TorchTwoFusion(T_, D_, DEPTH, n_streams=3)
    holder.fusion = _TorchTwoFusion(T_, D_, DEPTH, n_streams=2)
    sd = {k: v.detach() for k, v in holder.state_dict().items()}
    for name, lin in (("k_linear", torch.nn.Linear(2 * D_, 16)),
                      ("v_linear", torch.nn.Linear(2 * D_, 16)),
                      ("norm_k", torch.nn.LayerNorm(16)),
                      ("norm_v", torch.nn.LayerNorm(16))):
        for p, v in lin.state_dict().items():
            sd[f"bracnch.transformers.0.{name}.{p}"] = v
    path = str(tmp_path / "mfm.pt")
    torch.save({"model_state_dict": sd}, path)

    base = preset("tiny")
    cfg = base.replace(model=base.model.__class__(**{
        **base.model.__dict__, "trans_linear_in_dim": D_,
        "trans_linear_out_dim": 16, "trans_num": DEPTH}))
    variables = load_mfm_checkpoint(path, cfg)
    model = make_mfm(cfg, batched=False)
    rng = np.random.default_rng(0)
    feats = {m: rng.standard_normal((3, T_, D_)).astype(np.float32)
             for m in cfg.model.modalities}
    fused = model.apply(variables, {m: jnp.asarray(v)
                                    for m, v in feats.items()},
                        method=model.extract)
    assert fused.shape == (3, T_, D_)

    holder.eval()
    with torch.no_grad():
        rgb, depth, flow = (torch.from_numpy(feats[m])
                            for m in cfg.model.modalities)
        roll = lambda x: torch.cat((x[:, 1:], x[:, :1]), 1)
        want = (holder.three_fusion(rgb, depth, flow)
                + holder.fusion(rgb, roll(depth))
                + holder.fusion(rgb, roll(flow))).numpy()
    np.testing.assert_allclose(np.asarray(fused), want, rtol=2e-4, atol=2e-4)


def test_mfm_export_import_roundtrip(tmp_path):
    """export_mfm_checkpoint → load_mfm_checkpoint preserves every MFMTeacher
    parameter (the jax→torch→jax loop for the fusion teacher)."""
    from litemkd_tpu import preset
    from litemkd_tpu.train.teacher_steps import make_mfm
    from litemkd_tpu.tools.torch_export import export_mfm_checkpoint
    from litemkd_tpu.tools.torch_import import load_mfm_checkpoint

    T_, D_ = 4, 32
    base = preset("tiny")
    cfg = base.replace(model=base.model.__class__(**{
        **base.model.__dict__, "trans_linear_in_dim": D_,
        "trans_linear_out_dim": 16, "trans_num": 1}))
    model = make_mfm(cfg, batched=False)
    rng = np.random.default_rng(0)
    feats = lambda n: {m: jnp.asarray(rng.standard_normal(
        (n, T_, D_)).astype(np.float32)) for m in cfg.model.modalities}
    labels = jnp.zeros((cfg.episode.n_support,), jnp.int32)
    variables = model.init(jax.random.key(0), feats(cfg.episode.n_support),
                           labels, feats(cfg.episode.n_queries(True)), False)
    path = str(tmp_path / "mfm.pt")
    export_mfm_checkpoint(variables, cfg, path, iteration=9)
    back = load_mfm_checkpoint(path, cfg)

    def flat(d, prefix=""):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out.update(flat(v, prefix + k + "/"))
            else:
                out[prefix + k] = np.asarray(v)
        return out

    want = flat(jax.tree_util.tree_map(np.asarray,
                                       dict(variables["params"])))
    got = flat(back["params"])
    assert set(got) == set(want), set(got) ^ set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)


def test_load_mfm_checkpoint_guards_geometry(tmp_path):
    """A trans_num/temp_set mismatch between cfg and the checkpoint raises
    instead of silently truncating encoder layers (wrong features)."""
    from litemkd_tpu import preset
    from litemkd_tpu.tools.torch_import import load_mfm_checkpoint

    T_, D_ = 4, 32
    torch.manual_seed(7)
    holder = torch.nn.Module()
    holder.three_fusion = _TorchTwoFusion(T_, D_, 2, n_streams=3)
    holder.fusion = _TorchTwoFusion(T_, D_, 2, n_streams=2)
    sd = {k: v.detach() for k, v in holder.state_dict().items()}
    for name, lin in (("k_linear", torch.nn.Linear(2 * D_, 16)),
                      ("v_linear", torch.nn.Linear(2 * D_, 16)),
                      ("norm_k", torch.nn.LayerNorm(16))):
        for p, v in lin.state_dict().items():
            sd[f"bracnch.transformers.0.{name}.{p}"] = v
    path = str(tmp_path / "mfm2.pt")
    torch.save({"model_state_dict": sd}, path)

    base = preset("tiny")
    mk = lambda **kw: base.replace(model=base.model.__class__(**{
        **base.model.__dict__, "trans_linear_in_dim": D_,
        "trans_linear_out_dim": 16, **kw}))
    # depth-2 checkpoint with trans_num=1 config → loud error
    with pytest.raises(ValueError, match="more encoder layers"):
        load_mfm_checkpoint(path, mk(trans_num=1))
    # matching depth loads
    v = load_mfm_checkpoint(path, mk(trans_num=2))
    assert "three_fusion" in v["params"]
    # seq_len mismatch → loud error
    cfg = mk(trans_num=2)
    cfg = cfg.replace(episode=cfg.episode.__class__(**{
        **cfg.episode.__dict__, "seq_len": 8}))
    with pytest.raises(ValueError, match="positional table"):
        load_mfm_checkpoint(path, cfg)


# ---------------------------------------------------------------------------
# Raw torchvision model-zoo layouts: the pretrained=True artifacts the
# reference downloads (resnet18_2fc.py:29, moblienetv3.py). Weight arrival
# must be a file-copy + --init_checkpoint away.
# ---------------------------------------------------------------------------

def _rand_bn(sd, prefix, c, rng):
    sd[f"{prefix}.weight"] = rng.standard_normal(c).astype(np.float32)
    sd[f"{prefix}.bias"] = rng.standard_normal(c).astype(np.float32)
    sd[f"{prefix}.running_mean"] = rng.standard_normal(c).astype(np.float32)
    sd[f"{prefix}.running_var"] = (np.abs(rng.standard_normal(c)) + 0.5
                                   ).astype(np.float32)
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(7, np.int64)


def _resnet_zoo_sd(depth):
    """A state dict with torchvision resnet{18,34,50}'s exact downloaded key
    layout (incl. fc head and num_batches_tracked) and random values."""
    rng = np.random.default_rng(depth)
    r = lambda *s: rng.standard_normal(s).astype(np.float32)
    sd = {"conv1.weight": r(64, 3, 7, 7)}
    _rand_bn(sd, "bn1", 64, rng)
    stages = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}[depth]
    widths = (64, 128, 256, 512)
    exp = 4 if depth == 50 else 1
    cin = 64
    for i, (n, w) in enumerate(zip(stages, widths)):
        for b in range(n):
            p = f"layer{i + 1}.{b}"
            stride_block = b == 0 and i > 0
            if depth == 50:
                sd[f"{p}.conv1.weight"] = r(w, cin, 1, 1)
                _rand_bn(sd, f"{p}.bn1", w, rng)
                sd[f"{p}.conv2.weight"] = r(w, w, 3, 3)
                _rand_bn(sd, f"{p}.bn2", w, rng)
                sd[f"{p}.conv3.weight"] = r(w * exp, w, 1, 1)
                _rand_bn(sd, f"{p}.bn3", w * exp, rng)
            else:
                sd[f"{p}.conv1.weight"] = r(w, cin, 3, 3)
                _rand_bn(sd, f"{p}.bn1", w, rng)
                sd[f"{p}.conv2.weight"] = r(w, w, 3, 3)
                _rand_bn(sd, f"{p}.bn2", w, rng)
            if b == 0 and (stride_block or cin != w * exp):
                sd[f"{p}.downsample.0.weight"] = r(w * exp, cin, 1, 1)
                _rand_bn(sd, f"{p}.downsample.1", w * exp, rng)
            cin = w * exp
    sd["fc.weight"] = r(1000, 512 * exp)
    sd["fc.bias"] = r(1000)
    return sd


def _mobilenet_zoo_sd(variant):
    """torchvision mobilenet_v3_{large,small} downloaded layout: the
    transcription's features.* names + the classifier head."""
    torch.manual_seed(hash(variant) % 2 ** 31)
    tm = TorchMobileNetV3(variant)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    rng = np.random.default_rng(0)
    width = {"large": (960, 1280), "small": (576, 1024)}[variant]
    sd["classifier.0.weight"] = rng.standard_normal(
        (width[1], width[0])).astype(np.float32)
    sd["classifier.0.bias"] = rng.standard_normal(width[1]).astype(np.float32)
    sd["classifier.3.weight"] = rng.standard_normal(
        (1000, width[1])).astype(np.float32)
    sd["classifier.3.bias"] = rng.standard_normal(1000).astype(np.float32)
    return sd


@pytest.mark.parametrize("name,backbone", [
    ("resnet18", "resnet18_2fc"),
    ("resnet50", "resnet50_2fc"),
    ("mobilenet_v3_large", "mobilenetv3_large_2fc"),
    ("mobilenet_v3_small", "mobilenetv3_small_2fc"),
])
def test_torchvision_zoo_layout_ingests(tmp_path, name, backbone):
    """load_student_checkpoint on a raw zoo file (bare state dict, fc/classifier
    heads, num_batches_tracked) yields trunk-only partial variables whose
    leaves match the source arrays."""
    from litemkd_tpu.tools import detect_torchvision_zoo

    if name.startswith("resnet"):
        sd = _resnet_zoo_sd(int(name[6:]))
        kind = "resnet"
    else:
        sd = _mobilenet_zoo_sd(name.split("_")[-1])
        kind = "mobilenet"
    assert detect_torchvision_zoo(sd) == kind
    path = str(tmp_path / f"{name}.pth")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)

    from litemkd_tpu.tools import load_student_checkpoint
    base = preset("tiny")
    cfg = base.replace(model=base.model.__class__(**{
        **base.model.__dict__, "backbone": backbone}))
    v = load_student_checkpoint(path, cfg)
    trunk = v["params"]["backbone"]["trunk"]
    # partial: no fc heads, no classifier — the template keeps its init
    assert "fc1" not in v["params"]["backbone"]
    assert "classifier" not in v["params"]
    if kind == "resnet":
        np.testing.assert_allclose(
            trunk["conv1"]["kernel"],
            np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
        np.testing.assert_allclose(
            v["batch_stats"]["backbone"]["trunk"]["bn1"]["var"],
            sd["bn1.running_var"])
    else:
        np.testing.assert_allclose(
            trunk["stem"]["kernel"],
            np.transpose(sd["features.0.0.weight"], (2, 3, 1, 0)))


def test_torchvision_zoo_depth_mismatch_raises(tmp_path):
    sd = _resnet_zoo_sd(18)
    path = str(tmp_path / "resnet18.pth")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)
    from litemkd_tpu.tools import load_torchvision_trunk
    base = preset("tiny")
    cfg50 = base.replace(model=base.model.__class__(**{
        **base.model.__dict__, "backbone": "resnet50_2fc"}))
    with pytest.raises(ValueError, match="resnet50"):
        load_torchvision_trunk(path, cfg50)
    cfg_mb = base.replace(model=base.model.__class__(**{
        **base.model.__dict__, "backbone": "mobilenetv3_large_2fc"}))
    with pytest.raises(ValueError, match="cannot warm-start"):
        load_torchvision_trunk(path, cfg_mb)


def test_cli_train_warmstarts_from_zoo_file(tmp_path):
    """--init_checkpoint with a raw torchvision resnet18 zoo file: trunk
    weights arrive, fc heads + classifier keep their fresh init (the
    reference's pretrained=True + new Linear heads recipe)."""
    from litemkd_tpu.cli import train as cli_train

    sd = _resnet_zoo_sd(18)
    path = str(tmp_path / "resnet18-zoo.pth")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)
    state = cli_train.main([
        "--preset", "tiny", "--dataset", "synthetic",
        "--model_backbone", "resnet18_2fc", "--trans_linear_in_dim", "64",
        "--trans_linear_out_dim", "32", "--training_iterations", "2",
        "--tasks_per_batch", "2", "-c", str(tmp_path / "ck"),
        "--print_freq", "0", "--init_checkpoint", path])
    assert "fc1" in state.params["backbone"]
    assert "classifier" in state.params
    assert int(state.episodes_seen) == 2


# ---------------------------------------------------------------------------
# timm DeiT zoo layout (model_distillation's pretrained=True path,
# teacher/code/model.py:2142-2157)

class _TorchDeiTAttn(torch.nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.qkv = torch.nn.Linear(dim, dim * 3)
        self.proj = torch.nn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(b, n, 3, h, d // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = torch.softmax(q @ k.transpose(-2, -1) / (d // h) ** 0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, d)
        return self.proj(out)


class _TorchDeiTMlp(torch.nn.Module):
    def __init__(self, dim, ratio):
        super().__init__()
        self.fc1 = torch.nn.Linear(dim, dim * ratio)
        self.fc2 = torch.nn.Linear(dim * ratio, dim)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class _TorchDeiTBlock(torch.nn.Module):
    def __init__(self, dim, heads, ratio):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.attn = _TorchDeiTAttn(dim, heads)
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TorchDeiTMlp(dim, ratio)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _TorchPatchEmbed(torch.nn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = torch.nn.Conv2d(3, dim, patch, patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class TorchDeiT(torch.nn.Module):
    """timm ``deit_small_distilled_patch16_224`` transcription with timm's
    exact state-dict key layout (cls_token/dist_token/pos_embed,
    patch_embed.proj, blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,
    mlp.fc2}, norm); eval forward = mean of cls+dist tokens."""

    def __init__(self, img=224, patch=16, dim=384, depth=12, heads=6):
        super().__init__()
        self.patch_embed = _TorchPatchEmbed(dim, patch)
        n_tok = (img // patch) ** 2
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.dist_token = torch.nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = torch.nn.Parameter(torch.randn(1, n_tok + 2, dim) * 0.02)
        self.blocks = torch.nn.ModuleList(
            [_TorchDeiTBlock(dim, heads, 4) for _ in range(depth)])
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        x = self.patch_embed(x)
        b = x.shape[0]
        x = torch.cat([self.cls_token.expand(b, -1, -1),
                       self.dist_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return (x[:, 0] + x[:, 1]) / 2


def test_deit_zoo_layout_import_matches_torch_forward():
    """import_deit_trunk ingests the timm deit_small zoo layout and the
    resulting ViTClassifier matches the torch eval forward (reference's
    model_distillation trunk, model.py:2142-2157)."""
    from litemkd_tpu.models.backbones.classifier_net import ViTClassifier
    from litemkd_tpu.tools.torch_import import import_deit_trunk

    torch.manual_seed(0)
    tm = TorchDeiT().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # zoo files also carry the distilled heads the importer must ignore
    sd["head.weight"] = np.zeros((1000, 384), np.float32)
    sd["head.bias"] = np.zeros((1000,), np.float32)
    sd["head_dist.weight"] = np.zeros((1000, 384), np.float32)
    sd["head_dist.bias"] = np.zeros((1000,), np.float32)
    trunk = import_deit_trunk(sd)

    m = ViTClassifier(num_classes=7, compute_dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(1, 224, 224, 3)).astype(np.float32)
    variables = m.init(jax.random.key(0), jnp.asarray(x), train=False)
    params = {**variables["params"], **trunk}     # keep the fresh fc

    feat_t = tm(torch.tensor(x).permute(0, 3, 1, 2)).detach().numpy()
    fc = params["fc"]
    want = feat_t @ np.asarray(fc["kernel"]) + np.asarray(fc["bias"])

    got = m.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_load_pretrain_init_deit_and_resnet(tmp_path):
    """load_pretrain_init handles a saved model_distillation (convnet.*
    prefix) and a raw resnet zoo file, returning head-free partials."""
    from litemkd_tpu.tools.torch_import import load_pretrain_init
    from litemkd_tpu.train.teacher_steps import create_pretrain_state

    cfg = preset("tiny")
    torch.manual_seed(1)
    tm = TorchDeiT(img=cfg.episode.img_size)
    sd = {f"convnet.{k}": v for k, v in tm.state_dict().items()}
    sd["fc.weight"] = torch.zeros(3, 384)   # model_distillation's own head
    sd["fc.bias"] = torch.zeros(3)
    p = tmp_path / "model_distillation.pt"
    torch.save({"model_state_dict": sd}, p)

    init = load_pretrain_init(str(p), cfg, "deit_small")
    assert "fc" not in init["params"]
    clips = jnp.zeros((1, 2, cfg.episode.img_size, cfg.episode.img_size, 3))
    state, model = create_pretrain_state(cfg, jax.random.key(0), 3, clips,
                                         arch="deit_small",
                                         init_variables=init)
    got = np.asarray(state.params["cls_token"])
    np.testing.assert_allclose(got, tm.cls_token.detach().numpy(), rtol=1e-6)

    from torch_cpu_baseline import ResNet18Trunk
    tv = {k: torch.tensor(v) for k, v in
          _baseline_to_torchvision_names(ResNet18Trunk()).items()}
    p2 = tmp_path / "resnet18_zoo.pth"
    torch.save(tv, p2)
    init2 = load_pretrain_init(str(p2), cfg, "resnet18")
    assert set(init2) == {"params", "batch_stats"}
    state2, _ = create_pretrain_state(cfg, jax.random.key(0), 3, clips,
                                      arch="resnet18", init_variables=init2)
    np.testing.assert_allclose(
        np.asarray(state2.params["trunk"]["conv1"]["kernel"]),
        np.transpose(tv["conv1.weight"].numpy(), (2, 3, 1, 0)), rtol=1e-6)

    # depth mismatch must raise, not warm-start the wrong architecture:
    # resnet34 basic blocks truncate shape-compatibly into resnet18, so a
    # silent load would train from wrong weights (same guard as
    # load_torchvision_trunk)
    with pytest.raises(ValueError, match="resnet18"):
        load_pretrain_init(str(p2), cfg, "resnet34")
    with pytest.raises(ValueError, match="resnet18"):
        load_pretrain_init(str(p2), cfg, "resnet50")

    # the reference's OWN artifacts use Sequential indices under a prefix —
    # pretrain saves convnet.N.* (model.py:3351, pretrain.py:173), experts
    # save resnet.N.* (model.py:558); both warm-start the trunk and
    # deep-merge over the expert-extraction net (cli.extract -m foo.pt)
    from litemkd_tpu.models.backbones.classifier_net import ActionRecognitionNet
    from litemkd_tpu.utils.tree import deep_merge_variables
    attr_to_seq = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
                   "layer3": "6", "layer4": "7"}
    for prefix in ("convnet", "resnet"):
        seq = {}
        for k, v in tv.items():
            root = k.split(".")[0]
            seq[f"{prefix}.{attr_to_seq[root]}{k[len(root):]}"] = v
        p3 = tmp_path / f"{prefix}_artifact.pt"
        torch.save({"model_state_dict": seq}, p3)
        init3 = load_pretrain_init(str(p3), cfg, "resnet18")
        np.testing.assert_allclose(
            np.asarray(init3["params"]["trunk"]["conv1"]["kernel"]),
            np.transpose(tv["conv1.weight"].numpy(), (2, 3, 1, 0)), rtol=1e-6)
        net = ActionRecognitionNet(num_classes=2, depth=18,
                                   compute_dtype=jnp.float32)
        base = net.init(jax.random.key(0),
                        jnp.zeros((1, 1, 32, 32, 3), jnp.float32), train=False)
        merged = deep_merge_variables(base, init3)
        assert "fc" in merged["params"]   # head keeps its fresh init


def test_load_expert_checkpoint(tmp_path):
    """A run.py expert artifact (raw model state dict, model.py:558 —
    resnet.N.* Sequential trunk + transformers.{i} ModuleList + params the
    released forward never uses) loads into our expert preset (trunk
    backbone + TRX_multi head) and runs an episode."""
    from litemkd_tpu.models import Student
    from litemkd_tpu.tools import load_student_checkpoint

    torch.manual_seed(11)
    attr_to_seq = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
                   "layer3": "6", "layer4": "7"}
    sd = {}
    for k, v in _baseline_to_torchvision_names(ResNet18Trunk()).items():
        root = k.split(".")[0]
        sd[f"resnet.{attr_to_seq[root]}{k[len(root):]}"] = torch.tensor(v)
    D_, DK_ = 512, 32
    for i, ss in enumerate((2, 3)):
        for name, lin in (("k_linear", torch.nn.Linear(D_ * ss, DK_)),
                          ("v_linear", torch.nn.Linear(D_ * ss, DK_)),
                          ("norm_k", torch.nn.LayerNorm(DK_)),
                          ("norm_v", torch.nn.LayerNorm(DK_))):
            for p, v in lin.state_dict().items():
                sd[f"transformers.{i}.{name}.{p}"] = v
    # dead weight the released forward never touches (model.py:606-634)
    sd["attn_pat.query_proj.weight"] = torch.zeros(D_, D_)
    path = str(tmp_path / "expert.pt")
    torch.save({"iteration": 5, "model_state_dict": sd}, path)

    base = preset("tiny")
    cfg = base.replace(model=base.model.__class__(
        backbone="resnet18_expert", classifier="TRX_multi",
        trans_linear_in_dim=D_, trans_linear_out_dim=DK_, temp_set=(2, 3)))
    variables = load_student_checkpoint(path, cfg)
    t = variables["params"]["classifier"]["transformers"]
    assert set(t) == {"tct_2", "tct_3"}
    assert t["tct_2"]["k_linear"]["kernel"].shape == (2 * D_, DK_)
    assert t["tct_3"]["k_linear"]["kernel"].shape == (3 * D_, DK_)

    ep = cfg.episode
    rng = np.random.default_rng(4)
    ctx = jnp.asarray(rng.random((ep.n_support, ep.seq_len, ep.img_size,
                                  ep.img_size, 3)).astype(np.float32))
    tgt = ctx[:ep.n_queries(True)]
    labels = jnp.asarray(np.repeat(np.arange(ep.way), ep.shot)
                         .astype(np.int32))
    out = Student(cfg).apply(variables, ctx, labels, tgt, train=False)
    assert out["logits"].shape == (ep.n_queries(True), ep.way)
    assert np.isfinite(np.asarray(out["logits"])).all()

    # a temp_set mismatch must fail loudly, not scramble set order
    bad = base.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "temp_set": (2,)}))
    with pytest.raises(ValueError, match="temp_set"):
        load_student_checkpoint(path, bad)


def test_multiset_tct_export_order_and_resnet34(tmp_path):
    """Multi-temp_set heads export EVERY TCT set as transformers.{i} in
    temp_set order (not lexically-sorted-first-only), and resnet34 students
    export all 3/4/6/3 blocks; a depth-mismatched student import raises
    instead of silently truncating."""
    from litemkd_tpu.models import Student
    from litemkd_tpu.tools.torch_export import export_student_checkpoint
    from litemkd_tpu.tools.torch_import import load_student_checkpoint

    base = preset("tiny")
    ep = base.episode
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.integers(0, 255, (ep.n_support, ep.seq_len,
                                            ep.img_size, ep.img_size, 3),
                                   dtype=np.uint8))
    tgt = ctx[:ep.n_queries(True)]
    labels = jnp.asarray(np.repeat(np.arange(ep.way), ep.shot).astype(np.int32))

    # --- multi-set TCT ordering (TRM/TRX_multi head, temp_set (3, 2)) ---
    mcfg = base.replace(model=base.model.__class__(
        backbone="resnet18_student", classifier="TRX_multi",
        trans_linear_in_dim=base.model.trans_linear_in_dim,
        trans_linear_out_dim=base.model.trans_linear_out_dim,
        temp_set=(3, 2), trans_num=1))
    mvars = Student(mcfg).init(jax.random.key(0), ctx, labels, tgt,
                               train=False)
    sd = export_student_checkpoint(mvars, mcfg, str(tmp_path / "ms.pt"))
    t = mvars["params"]["classifier"]["transformers"]
    np.testing.assert_allclose(
        sd["classifier.transformers.0.k_linear.weight"],
        np.asarray(t["tct_3"]["k_linear"]["kernel"]).T, rtol=1e-6)
    np.testing.assert_allclose(
        sd["classifier.transformers.1.k_linear.weight"],
        np.asarray(t["tct_2"]["k_linear"]["kernel"]).T, rtol=1e-6)

    # --- resnet34 student depth: export all (3,4,6,3) blocks, import back ---
    cfg = base.replace(model=base.model.__class__(
        backbone="resnet34_2fc", classifier="TRX_2fcsup",
        trans_linear_in_dim=base.model.trans_linear_in_dim,
        trans_linear_out_dim=base.model.trans_linear_out_dim, trans_num=1))
    variables = Student(cfg).init(jax.random.key(0), ctx, labels, tgt,
                                  train=False)
    path = str(tmp_path / "s34.pt")
    sd = export_student_checkpoint(variables, cfg, path)
    # the 18-depth fallback dropped layer1.2 etc. (torchvision Sequential
    # index 4 == layer1)
    assert "backbone.resnet.4.2.conv1.weight" in sd or \
        "backbone.resnet.layer1.2.conv1.weight" in sd, sorted(sd)[:8]

    v = load_student_checkpoint(path, cfg)
    np.testing.assert_allclose(
        np.asarray(v["params"]["backbone"]["trunk"]["layer1_2"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["backbone"]["trunk"]["layer1_2"]["conv1"]["kernel"]),
        rtol=1e-6)
    # ...and a depth-mismatched import is rejected loudly
    cfg18 = cfg.replace(model=cfg.model.__class__(**{
        **cfg.model.__dict__, "backbone": "resnet18_2fc"}))
    with pytest.raises(ValueError, match="resnet34"):
        load_student_checkpoint(path, cfg18)


def test_importer_guards_from_advice_r4(tmp_path):
    """ADVICE r4 regression guards: (a) the 'tsf' composed importer rejects a
    non-3-tuple modalities config instead of silently zip-truncating; (b)
    load_cnn_strm_checkpoint raises a descriptive error on an artifact with
    no transformers.* keys instead of returning a None params leaf."""
    from litemkd_tpu.tools.torch_import import (load_composed_checkpoint,
                                                load_cnn_strm_checkpoint)
    base = preset("mfm_teacher")
    cfg2 = base.replace(model=base.model.__class__(**{
        **base.model.__dict__, "modalities": ("rgb", "depth")}))
    p = str(tmp_path / "x.pt")
    torch.save({"model_state_dict": {}}, p)
    with pytest.raises(ValueError, match="3-modality"):
        load_composed_checkpoint(p, cfg2, "tsf")

    # a trunk-only artifact (resnet.* keys, no transformers.*) must be
    # rejected by the CNN_STRM importer, not produce a malformed tree
    tm = ResNet18Trunk()
    sd = {f"resnet.{k}": v for k, v in
          _baseline_to_torchvision_names(tm).items()}
    sd.update({"attn_pat.gamma": torch.zeros(1),
               "attn_pat.query_proj.weight": torch.zeros(2048, 2048)})
    p2 = str(tmp_path / "trunk_only.pt")
    torch.save({"model_state_dict": sd}, p2)
    with pytest.raises(ValueError, match="transformers"):
        load_cnn_strm_checkpoint(p2, preset("expert_strm"))
