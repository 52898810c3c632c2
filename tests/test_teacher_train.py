"""Teacher-side pipeline: MFM training → fused feature extraction → student
feature store consumption, on a tiny on-disk fixture. Mirrors the reference
chain multi_fusion.py → extract_multi_feature.py → video_reader.py."""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from litemkd_tpu import preset
from litemkd_tpu.data.features import MultiModalFeatureStore, FeatureStore
from litemkd_tpu.data.multimodal import MultiModalEpisodeSampler
from litemkd_tpu.train.teacher_steps import (create_mfm_train_state,
                                             make_mfm_train_step,
                                             make_mfm_eval_step,
                                             create_pretrain_state,
                                             make_pretrain_step)
from litemkd_tpu.tools.extract import extract_mfm_features

WAY, SHOT, QPC, T, D = 3, 2, 2, 4, 32
N_CLASSES, VIDS = 5, 7
MODS = ("rgb", "depth", "flow")


@pytest.fixture(scope="module")
def cfg():
    base = preset("tiny")
    return base.replace(
        episode=base.episode.__class__(way=WAY, shot=SHOT, query_per_class=QPC,
                                       query_per_class_test=1, seq_len=T,
                                       img_size=16),
        model=base.model.__class__(trans_linear_in_dim=D,
                                   trans_linear_out_dim=24, trans_num=1,
                                   modalities=MODS),
        train=base.train.__class__(tasks_per_batch=2, training_iterations=4,
                                   num_test_tasks=2, sch=(100,)),
    )


@pytest.fixture(scope="module")
def feature_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mmfeat")
    rng = np.random.default_rng(0)
    protos = rng.normal(size=(N_CLASSES, T, D)).astype(np.float32)
    train_lines, test_lines = [], []
    for c in range(N_CLASSES):
        cname = f"class{c:02d}"
        for v in range(VIDS):
            vname = f"vid_{c:02d}_{v:02d}"
            for mi, m in enumerate(MODS):
                if m == "depth" and v == 0:
                    continue  # exercise missing-modality zero-fill
                d = root / m / cname / vname
                d.mkdir(parents=True, exist_ok=True)
                feat = protos[c] + 0.1 * rng.normal(size=(T, D)) + mi
                np.save(d / "feature.npy", feat.astype(np.float32))
            (train_lines if v < 4 else test_lines).append(f"{cname}/{vname}")
    ann = root / "splits"
    ann.mkdir()
    (ann / "trainlist03.txt").write_text("\n".join(train_lines) + "\n")
    (ann / "testlist03.txt").write_text("\n".join(test_lines) + "\n")
    return root


def test_mfm_training_and_extraction(cfg, feature_root, tmp_path):
    paths = {m: str(feature_root / m) for m in MODS}
    store = MultiModalFeatureStore(paths, str(feature_root / "splits"), 3, T, D)
    sampler = MultiModalEpisodeSampler(cfg, store)
    rng = np.random.default_rng(0)
    batch = sampler.sample_batch(rng, 2, train=True)
    assert set(batch.support_clips) == set(MODS)
    assert batch.support_clips["rgb"].shape == (2, WAY * SHOT, T, D)

    state = create_mfm_train_state(cfg, jax.random.key(0), batch)
    step = jax.jit(make_mfm_train_step(cfg))
    losses = []
    for _ in range(4):
        b = sampler.sample_batch(rng, 2, train=True)
        state, m = step(state, b)
        losses.append(float(m["task_loss"]))
    assert np.isfinite(losses).all()

    ev = jax.jit(make_mfm_eval_step(cfg))
    accs = ev({"params": state.params}, sampler.sample_batch(rng, 2, train=False))
    assert accs.shape == (2,)

    # extraction writes the student-consumable fused tree
    out = str(tmp_path / "fused")
    n = extract_mfm_features(cfg, store, {"params": state.params}, out,
                             store.class_names, batch_size=8)
    assert n == len(store.train_split) + len(store.test_split)

    fused_store = FeatureStore(out, str(feature_root / "splits"), 3, T, D)
    rec = fused_store.train_split.get(0, 0)
    feat = fused_store.load(rec)
    assert feat.shape == (T, D)
    assert np.isfinite(feat).all()


def test_extract_side_selects_fusion_path(cfg, feature_root, tmp_path):
    """Side-asymmetric faithful presets fuse support and query differently
    (reference model.py:2192-2204 adds the 3-stream branch to the support
    fusion only); ``side`` picks which path the dump tools run, and
    side-symmetric teachers reject a query-side request."""
    from litemkd_tpu.train.teacher_steps import make_mfm

    kind = "TwoCombinationTemTroShiftTRX_faithful"
    paths = {m: str(feature_root / m) for m in MODS}
    store = MultiModalFeatureStore(paths, str(feature_root / "splits"), 3, T, D)
    model = make_mfm(cfg, batched=False, kind=kind)
    ep = cfg.episode
    mk = lambda n: {m: jnp.asarray(np.random.default_rng(1).normal(
        size=(n, T, D)).astype(np.float32)) for m in MODS}
    labels = jnp.zeros((ep.n_support,), jnp.int32)
    v = model.init(jax.random.key(0), mk(ep.n_support), labels,
                   mk(ep.n_queries(False)), False)

    outs = {}
    for side in (0, 1):
        out = str(tmp_path / f"side{side}")
        extract_mfm_features(cfg, store, v, out, store.class_names,
                             batch_size=8, fusion_kind=kind, side=side)
        fused_store = FeatureStore(out, str(feature_root / "splits"), 3, T, D)
        outs[side] = fused_store.load(fused_store.train_split.get(0, 0))
    assert np.isfinite(outs[0]).all() and np.isfinite(outs[1]).all()
    assert not np.allclose(outs[0], outs[1])

    with pytest.raises(ValueError, match="side-symmetric"):
        extract_mfm_features(cfg, store, v, str(tmp_path / "bad"),
                             store.class_names, fusion_kind="mfm", side=1)


def test_missing_modality_zero_filled(cfg, feature_root):
    paths = {m: str(feature_root / m) for m in MODS}
    store = MultiModalFeatureStore(paths, str(feature_root / "splits"), 3, T, D)
    # vid_*_00 has no depth tree entry
    rec = next(r for r in store.train_split.videos_for_class(0)
               if r.video_id.endswith("_00"))
    depth = store.load(rec, "depth", True)
    np.testing.assert_array_equal(depth, np.zeros((T, D), np.float32))
    rgb = store.load(rec, "rgb", True)
    assert np.abs(rgb).sum() > 0


def test_pretrain_step(cfg):
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.integers(0, 255, size=(4, T, 16, 16, 3),
                                     dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 5, size=4).astype(np.int32))
    state, model = create_pretrain_state(cfg, jax.random.key(0), 5, clips)
    step = jax.jit(make_pretrain_step(cfg, model))
    state, metrics = step(state, clips, labels)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0


def test_two_road_training_step(cfg):
    """ThreeFusionTwoRoad teacher trains via the same mfm step machinery."""
    from litemkd_tpu.cli.train_teacher import SyntheticMultiModalSource
    src = SyntheticMultiModalSource(cfg, n_classes=8, seed=0)
    batch = src.sample_batch(np.random.default_rng(0), 2)
    state = create_mfm_train_state(cfg, jax.random.key(0), batch,
                                   kind="two_road")
    step = jax.jit(make_mfm_train_step(cfg, kind="two_road"))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["task_loss"]))


def test_pretrain_vit_arch(cfg):
    """deit_small pretrain arch (model_distillation equivalent) steps on clips."""
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.integers(0, 255, (2, T, 16, 16, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 4, (2,), dtype=np.int32))
    from litemkd_tpu.train.teacher_steps import (create_pretrain_state,
                                                 make_pretrain_step)
    state, model = create_pretrain_state(
        cfg, jax.random.key(0), 4, clips, arch="deit_small")
    # tiny ViT for the test
    from litemkd_tpu.models.backbones.classifier_net import ViTClassifier
    model = ViTClassifier(num_classes=4, img_size=16, patch=8, dim=16,
                          depth=1, heads=2)
    v = model.init(jax.random.key(0), clips, train=False)
    import optax
    tx = optax.sgd(1e-2, momentum=0.9)
    from litemkd_tpu.train.steps import TrainState
    from flax.core import FrozenDict
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       episodes_seen=jnp.zeros((), jnp.int32),
                       params=v["params"], batch_stats=FrozenDict(),
                       opt_state=tx.init(v["params"]),
                       rng=jax.random.key(1), tx=tx)
    step = jax.jit(make_pretrain_step(cfg, model))
    state, metrics = step(state, clips, labels)
    assert np.isfinite(float(metrics["loss"]))


def test_tsf_branch_graft(cfg, tmp_path):
    """Per-branch expert checkpoint grafting (score_fusion_run.py workflow):
    a separately-trained TRX expert's head lands in the TSF branch params."""
    from litemkd_tpu.train.checkpoint import CheckpointManager
    from litemkd_tpu.train.steps import create_train_state
    from litemkd_tpu.train.teacher_steps import (create_mfm_train_state,
                                                 load_tsf_branches)
    from litemkd_tpu.data import SyntheticEpisodeSource
    from litemkd_tpu.cli.train_teacher import SyntheticMultiModalSource

    # "expert": feature-backbone + TRX head student pipeline
    ecfg = cfg.replace(model=cfg.model.__class__(
        backbone="feature", classifier="TRX",
        trans_linear_in_dim=D, trans_linear_out_dim=24))
    src = SyntheticEpisodeSource(ecfg, n_classes=6, seed=0,
                                 with_teacher_feats=True)
    batch = src.sample_batch(np.random.default_rng(0), 2)
    batch = batch._replace(support_clips=batch.support_feats,
                           query_clips=batch.query_feats)
    est, _ = create_train_state(ecfg, jax.random.key(0), batch)
    ck = CheckpointManager(str(tmp_path / "expert"))
    ck.save(est)

    mm = SyntheticMultiModalSource(cfg, n_classes=6, seed=0)
    tbatch = mm.sample_batch(np.random.default_rng(0), 2)
    tstate = create_mfm_train_state(cfg, jax.random.key(1), tbatch, kind="tsf")
    new_params = load_tsf_branches(tstate.params,
                                   {"rgb": str(tmp_path / "expert")})
    got = jax.tree_util.tree_leaves(new_params["branch_rgb"])
    want = jax.tree_util.tree_leaves(est.params["classifier"])
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32))
    # untouched branches stay intact
    for m in ("depth", "flow"):
        a = jax.tree_util.tree_leaves(new_params[f"branch_{m}"])
        b = jax.tree_util.tree_leaves(tstate.params[f"branch_{m}"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # a RELEASED run.py expert .pt grafts too (the artifact kind the
    # reference's --rgb/skeleton/flow_test_model_path actually consumed)
    import torch
    dk = cfg.model.trans_linear_out_dim
    sd = {}
    for name, lin in (("k_linear", torch.nn.Linear(2 * D, dk)),
                      ("v_linear", torch.nn.Linear(2 * D, dk)),
                      ("norm_k", torch.nn.LayerNorm(dk)),
                      ("norm_v", torch.nn.LayerNorm(dk))):
        for p, v in lin.state_dict().items():
            sd[f"transformers.0.{name}.{p}"] = v
    pt = str(tmp_path / "expert.pt")
    torch.save({"model_state_dict": sd}, pt)
    new2 = load_tsf_branches(tstate.params, {"flow": pt},
                             temp_set=cfg.model.temp_set)
    np.testing.assert_allclose(
        np.asarray(new2["branch_flow"]["transformers"]["tct_2"]
                   ["k_linear"]["kernel"], np.float32),
        sd["transformers.0.k_linear.weight"].numpy().T, rtol=1e-6)


def test_all_fusion_presets_trace(cfg):
    """Every registered fusion kind builds through make_mfm and its train
    step traces (abstract eval — no execution) on tiny shapes, including the
    OTAM-head variants and the faithful quirk presets."""
    from litemkd_tpu.models.teacher import FUSION_PRESETS
    from litemkd_tpu.cli.train_teacher import SyntheticMultiModalSource
    from litemkd_tpu.train.teacher_steps import (create_mfm_train_state,
                                                 make_mfm_train_step)

    src = SyntheticMultiModalSource(cfg, n_classes=6, seed=0)
    batch = src.sample_batch(np.random.default_rng(0), 2)
    n_mod = len(cfg.model.modalities)
    kinds = ["mfm", "tsf", "dga", "dga2", "two_road",
             "otam:ThreeTRXShiftLoopTime"]
    kinds += [name for name, branches in FUSION_PRESETS.items()
              if max(i for _, idxs, *_ in branches for i in idxs) < n_mod]
    for kind in kinds:
        state = create_mfm_train_state(cfg, jax.random.key(0), batch,
                                       kind=kind)
        step = make_mfm_train_step(cfg, kind=kind)
        out = jax.eval_shape(step, state, batch)
        assert out[1]["task_loss"].shape == (), kind


def test_teacher_cli_test_only(cfg, feature_root, tmp_path):
    """train_teacher --test_only evaluates a saved fusion teacher standalone
    (reference multi_fusion.py --test_model_only / test_only.py)."""
    from litemkd_tpu.cli import train_teacher as cli_tt

    ck = str(tmp_path / "ck_mfm")
    common = ["--way", str(WAY), "--shot", str(SHOT),
              "--query_per_class", str(QPC), "--query_per_class_test", "1",
              "--seq_len", str(T), "--img_size", "32",
              "--trans_linear_in_dim", str(D), "--trans_linear_out_dim", "16",
              "--dataset", "hmdb", "--split", "3",
              "--traintestlist", str(feature_root / "splits"),
              "--feature_root", str(feature_root),
              "--modalities", *MODS, "--trans_num", "1", "--print_freq", "0"]
    cli_tt.main(common + ["--training_iterations", "4",
                          "--tasks_per_batch", "2", "-c", ck])
    s = cli_tt.main(common + ["--test_only", "-m", ck,
                              "--num_test_tasks", "4"])
    assert s["n_tasks"] == 4
    assert 0.0 <= s["accuracy"] <= 100.0


def test_pretrain_checkpoints_every_epoch(tmp_path):
    """episodes_seen (the orbax save key) must advance during pretraining:
    when it stayed 0, orbax's should_save silently skipped every epoch save
    after the first, so a 50-epoch run persisted only epoch-1 weights."""
    from litemkd_tpu.train.checkpoint import CheckpointManager
    from litemkd_tpu.train.teacher_steps import (create_pretrain_state,
                                                 make_pretrain_step)

    cfg = preset("tiny")
    sz = cfg.episode.img_size
    clips = jnp.zeros((2, 2, sz, sz, 3), jnp.uint8)
    labels = jnp.asarray([0, 1], jnp.int32)
    state, model = create_pretrain_state(cfg, jax.random.key(0), 3, clips)
    step = jax.jit(make_pretrain_step(cfg, model))
    s1, _ = step(state, clips, labels)
    s2, _ = step(s1, clips, labels)
    assert int(s1.episodes_seen) == 2 and int(s2.episodes_seen) == 4

    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(s1)
    ckpt.save(s2)                      # must NOT be skipped
    assert ckpt.latest_step() == 4


def test_teacher_resume_continues_episode_stream(cfg, feature_root, tmp_path):
    """The teacher CLI's prefetched stream is keyed by absolute step, so a
    resumed run continues the data sequence instead of replaying batches 0..k
    (mirrors test_train_step.test_resume_continues_episode_stream for the
    run_training loop)."""
    import dataclasses
    from litemkd_tpu.cli import train_teacher as cli_teacher

    geo = ["--dataset", "synthetic", "--way", str(WAY), "--shot", str(SHOT),
           "--query_per_class", str(QPC), "--query_per_class_test", "1",
           "--seq_len", str(T), "--trans_linear_in_dim", str(D),
           "--trans_linear_out_dim", "24", "--trans_num", "1",
           "--tasks_per_batch", "2", "--print_freq", "0",
           "--save_freq", "2"]

    def params_of(state):
        return jax.tree_util.tree_map(np.asarray, state.params)

    full = cli_teacher.main(geo + ["--training_iterations", "8",
                                   "-c", str(tmp_path / "full")])
    cli_teacher.main(geo + ["--training_iterations", "4",
                            "-c", str(tmp_path / "res")])
    rest = cli_teacher.main(geo + ["--training_iterations", "8",
                                   "-c", str(tmp_path / "res"), "-r"])
    assert int(rest.step) == int(full.step) == 4
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6),
        params_of(full), params_of(rest))


def test_pretrain_dual_lr_groups_and_steplr(cfg):
    """The reference pretrain uses TWO SGD groups — convnet at lr_1, fc at
    lr_2, momentum 0.9 (pretrain.py:31-32) — with StepLR(10, 0.1) stepped at
    epoch start (pretrain.py:33-38,108-109). lr_1=0 must freeze the trunk
    while the head trains; the schedule decays epoch e by 0.1**((e+1)//10)."""
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.integers(0, 255, size=(4, T, 16, 16, 3),
                                     dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 5, size=4).astype(np.int32))
    state, model = create_pretrain_state(cfg, jax.random.key(0), 5, clips,
                                         lr_groups=(0.0, 0.01),
                                         steps_per_epoch=1)
    step = jax.jit(make_pretrain_step(cfg, model))
    trunk_before = jax.tree_util.tree_map(np.asarray, state.params["trunk"])
    new_state, metrics = step(state, clips, labels)
    assert np.isfinite(float(metrics["loss"]))
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, trunk_before,
        jax.tree_util.tree_map(np.asarray, new_state.params["trunk"]))
    fc_moved = np.abs(np.asarray(new_state.params["fc"]["kernel"])
                      - np.asarray(state.params["fc"]["kernel"])).max()
    assert fc_moved > 0

    # StepLR factor as create_pretrain_state builds it: epochs 0-8 at 1×,
    # 9-18 at 0.1× (the torch step-at-epoch-start quirk), 19-28 at 0.01×
    spe = 1
    factor = lambda s: 0.1 ** ((s // spe + 1) // 10)
    assert factor(0) == 1.0 and factor(8) == 1.0
    np.testing.assert_allclose([factor(9), factor(19)], [0.1, 0.01])
