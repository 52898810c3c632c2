"""Aux subsystem tests: saliency, skeleton preprocessing, TSF training,
dataset shrinker."""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from litemkd_tpu import preset
from litemkd_tpu.data.skeleton import (pad_null_frames, center_spine,
                                       rotate_to_canonical, preprocess_skeleton)
from litemkd_tpu.models.backbones.classifier_net import ActionRecognitionNet
from litemkd_tpu.utils.saliency import backbone_grad_cam

T, D = 4, 32


def test_grad_cam_shapes_and_range():
    net = ActionRecognitionNet(num_classes=3, depth=18,
                               compute_dtype=jnp.float32)
    clips = jnp.zeros((1, T, 32, 32, 3), jnp.uint8)
    variables = net.init(jax.random.key(0), clips, train=False)
    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(2, 32, 32, 3), dtype=np.uint8))
    cam = backbone_grad_cam(variables, images, class_idx=1, n_classes=3,
                            depth=18)
    assert cam.shape == (2, 1, 1)  # 32px → 1x1 trunk map
    assert (cam >= 0).all() and (cam <= 1.0 + 1e-6).all()


def test_cam_cli_writes_overlay(tmp_path):
    """One command, one jpg — the reference's ``python heatmap_vis.py``
    workflow (heatmap_vis.py:24-49) through ``cli.figures cam``."""
    from litemkd_tpu.cli import figures as cli_figures
    src = str(tmp_path / "in.jpg")
    out = str(tmp_path / "cam.jpg")
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (48, 56, 3), dtype=np.uint8)).save(src)
    cli_figures.main(["cam", "--image", src, "--out", out,
                      "--img_size", "32", "--num_classes", "5"])
    overlay = np.asarray(Image.open(out))
    assert overlay.shape == (32, 32, 3) and overlay.dtype == np.uint8


def test_skeleton_preprocess():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(2, 3, 10, 25, 2)).astype(np.float32)
    data[:, :, 6:, :, :] = 0.0       # trailing null frames
    data[1, :, :, :, 1] = 0.0        # one body missing entirely
    padded = pad_null_frames(data)
    assert np.abs(padded[0, :, 6:, :, 0]).sum() > 0   # replayed frames
    assert np.abs(padded[1, :, :, :, 1]).sum() == 0   # empty body stays empty
    centered = center_spine(padded)
    np.testing.assert_allclose(centered[:, :, :6, 1, 0], 0.0, atol=1e-6)
    rotated = rotate_to_canonical(centered)
    # rotation preserves bone lengths
    b0 = padded[0, :, 0, 2, 0] - padded[0, :, 0, 3, 0]
    full = preprocess_skeleton(data)
    assert full.shape == data.shape
    assert np.isfinite(full).all()


def test_tsf_training_step():
    base = preset("tiny")
    cfg = base.replace(model=base.model.__class__(
        trans_linear_in_dim=D, trans_linear_out_dim=24, trans_num=1,
        modalities=("rgb", "depth", "flow")))
    from litemkd_tpu.cli.train_teacher import SyntheticMultiModalSource
    from litemkd_tpu.train.teacher_steps import (create_mfm_train_state,
                                                 make_mfm_train_step)
    src = SyntheticMultiModalSource(cfg, n_classes=8, seed=0)
    rng = np.random.default_rng(0)
    batch = src.sample_batch(rng, 2)
    state = create_mfm_train_state(cfg, jax.random.key(0), batch, kind="tsf",
                                   score_weights=(1.0, 0.5, 0.5))
    step = jax.jit(make_mfm_train_step(cfg, kind="tsf",
                                       score_weights=(1.0, 0.5, 0.5)))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["task_loss"]))


def test_shrink_dataset(tmp_path):
    from litemkd_tpu.tools.shrink_dataset import shrink
    src = tmp_path / "src"
    for f in range(20):
        d = src / "classA" / "vid1"
        d.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.full((8, 8, 3), f, np.uint8)).save(d / f"{f:05d}.jpg")
    n = shrink(str(src), str(tmp_path / "dst"), n_frames=8)
    assert n == 1
    out = sorted(os.listdir(tmp_path / "dst" / "classA" / "vid1"))
    assert len(out) == 8


def test_figures(tmp_path):
    from litemkd_tpu.tools.figures import (draw_skeleton_3d, modality_grid,
                                           skeleton_clip_grid)
    # modality grid over a tiny frame tree (huatu.py layout)
    rng = np.random.default_rng(0)
    for modality in ("rgb", "depth"):
        d = tmp_path / "tiny" / f"{modality}_l8" / "classA" / "vid1"
        d.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, (16, 20, 3), dtype=np.uint8)
                        ).save(d / "00000.jpg")
    out = modality_grid(str(tmp_path), [("tiny", "classA", "vid1")],
                        modalities=("rgb", "depth"),
                        out_path=str(tmp_path / "grid.pdf"), img_size=32)
    assert os.path.getsize(out) > 0
    # H36M skeleton plots (3d_visualization.py)
    pose = rng.normal(size=(17, 3))
    out = draw_skeleton_3d(pose, str(tmp_path / "pose.jpg"))
    assert os.path.getsize(out) > 0
    clip = rng.normal(size=(3, 17, 3))
    out = skeleton_clip_grid(clip, str(tmp_path / "clip.jpg"))
    assert os.path.getsize(out) > 0
    # CLI round-trip for the skeleton subcommand
    from litemkd_tpu.cli.figures import main as figures_main
    np.save(tmp_path / "sk.npy", clip)
    figures_main(["skeleton", "--npy", str(tmp_path / "sk.npy"),
                  "--out", str(tmp_path / "cli_pose.jpg"), "--frame", "1"])
    assert os.path.getsize(tmp_path / "cli_pose.jpg") > 0


def test_vit_classifier():
    """DeiT-small-style ViT (model_distillation equivalent) trains a step."""
    from litemkd_tpu.models.backbones.classifier_net import ViTClassifier
    import optax
    rng = np.random.default_rng(1)
    m = ViTClassifier(num_classes=5, img_size=32, patch=8, dim=32, depth=2,
                      heads=2)
    x = jnp.asarray(rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8))
    yl = jnp.asarray(rng.integers(0, 5, (4,), dtype=np.int32))
    v = m.init(jax.random.key(0), x, train=False)
    logits = m.apply(v, x, train=False)
    assert logits.shape == (4, 5)

    def loss(p):
        lg = m.apply({"params": p}, x, train=False)
        return optax.softmax_cross_entropy_with_integer_labels(lg, yl).mean()

    g = jax.grad(loss)(v["params"])
    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)))


def test_pipeline_bench_tool(capsys):
    from litemkd_tpu.tools.pipeline_bench import main as bench_main
    bench_main(["--episodes", "1", "--img", "40", "--way", "2", "--shot", "1",
                "--frames", "2"])
    out = capsys.readouterr().out
    assert "PIL decode" in out


def test_aot_fingerprint_ignores_native_binaries():
    """The AOT source fingerprint hashes sources (.py/.cpp), never build
    artifacts: libclipdec.so is gitignored and built lazily on first
    data-plane use, so including it made the fingerprint depend on whether
    some prior run had built it — a fresh checkout's rewarm went stale the
    moment a test build produced the .so (2026-08-21, cost a full chip
    rewarm). Lock the invariant: dropping a new .so into the package must
    not move the fingerprint."""
    import importlib
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    try:
        bench = importlib.import_module("bench")
    finally:
        sys.path.remove(repo)
    probe = os.path.join(repo, "litemkd_tpu", "native",
                         "zz_fingerprint_probe.so")
    assert not os.path.exists(probe)
    bench._SOURCE_SHA = None
    before = bench._source_sha()
    with open(probe, "wb") as f:
        f.write(b"\x7fELF not a real library")
    try:
        bench._SOURCE_SHA = None
        assert bench._source_sha() == before
    finally:
        os.remove(probe)
        bench._SOURCE_SHA = None


@pytest.mark.slow
def test_bench_driver_contract(tmp_path):
    """The driver runs ``python bench.py`` at the end of every round and
    parses its stdout as ONE JSON line {metric, value, unit, vs_baseline} —
    lock that contract in-suite (tiny preset, 2 steps, history redirected
    to a tmp file so real-chip rows aren't polluted)."""
    import json as _json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               BENCH_PRESET="tiny", BENCH_MODE="train", BENCH_STEPS="2",
               BENCH_EPISODES_PER_STEP="2", BENCH_MICRO_BATCH="0",
               BENCH_PALLAS="0",
               BENCH_AOT_DIR=str(tmp_path / "aot"),
               BENCH_HISTORY_FILE=str(tmp_path / "hist.jsonl"))
    proc = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                          env=env, capture_output=True, text=True,
                          timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln]
    rec = _json.loads(lines[-1])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["metric"] == "train_episodes_per_sec_per_chip"
    assert rec["value"] > 0
    assert rec["vs_baseline"] is None      # no torch baseline for tiny
    hist = _json.loads((tmp_path / "hist.jsonl").read_text())
    assert hist["preset"] == "tiny" and hist["steps"] == 2

    # --check contract (the round close-out gate): the train artifact the
    # run above serialized is warm, the other five modes are not → exit 1
    # naming them; nonsense flags must not silently no-op
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--check"],
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "train        ok" in proc.stderr
    assert "STALE" in proc.stderr and "teacher" in proc.stderr


def test_profile_cli_smoke(tmp_path, capsys):
    """cli.profile traces one step and prints an op-time summary (SURVEY §5.1
    — the tracing subsystem the reference lacks). On the CPU backend the
    XProf trace still materializes under plugins/profile/."""
    from litemkd_tpu.cli.profile import main as profile_main

    out = tmp_path / "trace"
    profile_main(["--preset", "tiny", "--dataset", "synthetic",
                  "--tasks_per_batch", "2", "--micro_batch", "0",
                  "--out", str(out)])
    text = capsys.readouterr().out
    assert "device op time" in text or "no trace files found" in text
    assert (out / "plugins" / "profile").exists()

    # the pretrain hot path traces too (resnet50 at tiny geometry)
    out2 = tmp_path / "trace_pre"
    profile_main(["--preset", "tiny", "--dataset", "synthetic",
                  "--path", "pretrain", "--batch_size", "2",
                  "--out", str(out2)])
    assert (out2 / "plugins" / "profile").exists()


def test_flops_cli_smoke(capsys):
    """cli.flops (reference flops.py) reports params + forward GFLOPs."""
    from litemkd_tpu.cli.flops import main as flops_main

    out = flops_main(["--preset", "tiny", "--dataset", "synthetic"])
    text = capsys.readouterr().out
    assert "GFLOPs/episode" in text and "params" in text
    assert out["params"] > 0 and out["gflops"] > 0


def test_gen_fixed_split_cli_synthetic(tmp_path):
    """cli.gen_fixed_split works on the synthetic dataset (it used to crash —
    the synthetic source has no videos/features stores) and the emitted file
    replays deterministically through the sampler's spec path."""
    from litemkd_tpu import preset
    from litemkd_tpu.cli.gen_fixed_split import main as gen_main
    from litemkd_tpu.data import SyntheticEpisodeSource, load_fixed_episodes

    out = tmp_path / "fixed.json"
    gen_main(["--preset", "tiny", "--dataset", "synthetic",
              "--n_episodes", "3", "--out", str(out)])
    specs = load_fixed_episodes(str(out))
    assert len(specs) == 3

    cfg = preset("tiny")
    src = SyntheticEpisodeSource(cfg, n_classes=16, seed=0)
    a = src.sample_batch(np.random.default_rng(1), 3, train=False, specs=specs)
    b = src.sample_batch(np.random.default_rng(2), 3, train=False, specs=specs)
    # fixed specs pin the episode CONTENT (clips), not the label shuffle
    np.testing.assert_array_equal(
        np.sort(a.support_clips.reshape(3, -1), axis=-1),
        np.sort(b.support_clips.reshape(3, -1), axis=-1))


def test_fixed_episode_formats_replay_identically_on_synthetic(tmp_path):
    """Both fixed-episode formats (native JSON and the reference's
    global-video_idx yaml schema) generate AND replay on the synthetic
    dataset through the real CLIs, with identical eval results — the
    reference schema's offsets invert exactly against the synthetic
    sources' nominal split()."""
    from litemkd_tpu.cli.gen_fixed_split import main as gen_main
    from litemkd_tpu.cli.test import main as test_main

    native, ref = tmp_path / "fixed.json", tmp_path / "fixed.yaml"
    common = ["--preset", "tiny", "--dataset", "synthetic",
              "--n_episodes", "2", "--seed", "7"]
    gen_main(common + ["--out", str(native)])
    gen_main(common + ["--out", str(ref), "--format", "reference"])

    run = ["--preset", "tiny", "--dataset", "synthetic"]
    s_native = test_main(run + ["--fixed_episode_file", str(native)])
    s_ref = test_main(run + ["--fixed_episode_file", str(ref)])
    assert s_native["n_tasks"] == s_ref["n_tasks"] == 2
    assert s_native["accuracy"] == s_ref["accuracy"]


def test_fixed_episode_replay_through_teacher_cli(tmp_path):
    """gen_fixed_split-produced files (both formats) replay through
    train_teacher --test_only: the synthetic multi-modal source's class
    count matches the generator's 16-class index (a 12-class default used
    to reject most generated specs with 'references class 13')."""
    from litemkd_tpu.cli.gen_fixed_split import main as gen_main
    from litemkd_tpu.cli.train_teacher import main as teacher_main

    native, ref = tmp_path / "fixed.json", tmp_path / "fixed.yaml"
    common = ["--preset", "tiny", "--dataset", "synthetic",
              "--n_episodes", "2", "--seed", "7"]
    gen_main(common + ["--out", str(native)])
    gen_main(common + ["--out", str(ref), "--format", "reference"])

    run = ["--preset", "tiny", "--dataset", "synthetic", "--test_only",
           "--debug"]
    s_native = teacher_main(run + ["--fixed_episode_file", str(native)])
    s_ref = teacher_main(run + ["--fixed_episode_file", str(ref)])
    assert s_native["n_tasks"] == s_ref["n_tasks"] == 2
    assert s_native["accuracy"] == s_ref["accuracy"]


def test_task_confusion_maps_real_classes():
    """task_confusion == reference utils.py:123-127: argmax over logits,
    indexed into the episode's real-class list; unbatched and batched."""
    from litemkd_tpu.utils.metrics import task_confusion

    logits = np.array([[0.1, 0.9, 0.0],
                       [2.0, 0.0, 0.0],
                       [0.0, 0.1, 0.7]], np.float32)       # preds 1, 0, 2
    classes = np.array([17, 4, 99], np.int32)
    np.testing.assert_array_equal(np.asarray(task_confusion(logits, classes)),
                                  [4, 17, 99])
    # batched: (E, Q, way) with per-episode class lists
    blogits = np.stack([logits, logits[::-1]])             # preds e1: 2, 0, 1
    bclasses = np.array([[17, 4, 99], [5, 6, 7]], np.int32)
    got = np.asarray(task_confusion(blogits, bclasses))
    np.testing.assert_array_equal(got, [[4, 17, 99], [7, 5, 6]])


def test_episode_meta_real_labels_consistent():
    """Sampler meta: real_query_labels == classes[query_labels] and classes
    hold exactly `way` distinct real ids per episode."""
    from litemkd_tpu.data import SyntheticEpisodeSource

    cfg = preset("tiny")
    src = SyntheticEpisodeSource(cfg, n_classes=9, seed=0)
    batch, meta = src.sample_batch(np.random.default_rng(0), 3, train=False,
                                   return_meta=True)
    assert meta.classes.shape == (3, cfg.episode.way)
    want = np.take_along_axis(meta.classes, batch.query_labels, axis=-1)
    np.testing.assert_array_equal(meta.real_query_labels, want)
    for row in meta.classes:
        assert len(set(row.tolist())) == cfg.episode.way


def test_aot_serving_artifact_roundtrip(tmp_path):
    """export_serving_artifact → load_serving_artifact: the deserialized
    StableHLO scorer (no model code) matches a direct BatchedStudent apply,
    and the manifest records the serving geometry."""
    from litemkd_tpu.tools.aot import (export_serving_artifact,
                                       load_serving_artifact, make_serving_fn)

    cfg = preset("tiny")
    ep = cfg.episode
    rng = np.random.default_rng(0)
    E, s, q = 2, ep.n_support, ep.n_queries(False)
    sup = rng.integers(0, 255, (E, s, ep.seq_len, ep.img_size, ep.img_size, 3),
                       dtype=np.uint8)
    lab = np.stack([rng.permutation(np.repeat(np.arange(ep.way), ep.shot))
                    for _ in range(E)]).astype(np.int32)
    qry = rng.integers(0, 255, (E, q, ep.seq_len, ep.img_size, ep.img_size, 3),
                       dtype=np.uint8)

    serve = make_serving_fn(cfg)
    from litemkd_tpu.models import BatchedStudent
    variables = BatchedStudent(cfg).init(jax.random.key(0), jnp.asarray(sup),
                                         jnp.asarray(lab), jnp.asarray(qry),
                                         train=False)
    want = np.asarray(serve(variables, sup, lab, qry))

    path = str(tmp_path / "model.litemkd")
    manifest = export_serving_artifact(cfg, variables, path,
                                       platforms=("cpu",), episodes=E)
    assert manifest["way"] == ep.way and manifest["episodes"] == E

    scorer, m = load_serving_artifact(path)
    got = np.asarray(scorer(sup, lab, qry))
    assert got.shape == (E, q, ep.way)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert m["input_shapes"]["support_clips"][0] == E


def test_aot_extract_artifact_roundtrip(tmp_path):
    """export_extract_artifact → load_serving_artifact: the deserialized
    fused-feature extractor (kind=extract_mfm) matches MFMTeacher.extract."""
    from litemkd_tpu.tools.aot import (export_extract_artifact,
                                       load_serving_artifact, make_extract_fn)
    from litemkd_tpu.train.teacher_steps import make_mfm

    base = preset("tiny")
    cfg = base.replace(model=base.model.__class__(**{
        **base.model.__dict__, "trans_linear_in_dim": 32,
        "trans_linear_out_dim": 24, "trans_num": 1}))
    N, T_, D_ = 3, cfg.episode.seq_len, 32
    rng = np.random.default_rng(1)
    feats = {m: rng.standard_normal((N, T_, D_)).astype(np.float32)
             for m in cfg.model.modalities}

    model = make_mfm(cfg, batched=False)
    ep = cfg.episode
    sup = {m: jnp.asarray(rng.standard_normal(
        (ep.n_support, T_, D_)).astype(np.float32)) for m in feats}
    qry = {m: jnp.asarray(rng.standard_normal(
        (ep.n_queries(True), T_, D_)).astype(np.float32)) for m in feats}
    labels = jnp.asarray(np.repeat(np.arange(ep.way), ep.shot).astype(np.int32))
    variables = model.init(jax.random.key(0), sup, labels, qry, False)
    # cli.export bundles possibly-EMPTY collections (an LN-only model has no
    # batch_stats); the flat params.npz cannot represent an empty dict, so
    # export must prune it or the artifact can never be called after loading
    variables = {**variables, "batch_stats": {}}
    want = np.asarray(make_extract_fn(cfg)(variables, feats))

    path = str(tmp_path / "extract.litemkd")
    manifest = export_extract_artifact(cfg, variables, path,
                                       platforms=("cpu",), batch=N)
    assert manifest["kind"] == "extract_mfm" and manifest["batch"] == N

    extractor, m = load_serving_artifact(path)
    got = np.asarray(extractor(feats))
    assert got.shape == (N, T_, D_)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert sorted(m["input_shapes"]) == sorted(cfg.model.modalities)


def test_demo_serves_aot_artifact(tmp_path):
    """cli.demo -m x.litemkd: the demo runner scores episodes through the
    deserialized StableHLO artifact (the model-code-free serving path)."""
    from litemkd_tpu.cli.demo import build_runner
    from litemkd_tpu.models import BatchedStudent
    from litemkd_tpu.tools.aot import export_serving_artifact

    cfg = preset("tiny")
    ep = cfg.episode
    rng = np.random.default_rng(0)
    s, q = ep.n_support, ep.n_queries(False)
    sup = jnp.asarray(rng.integers(
        0, 255, (1, s, ep.seq_len, ep.img_size, ep.img_size, 3),
        dtype=np.uint8))
    lab = jnp.asarray(np.repeat(np.arange(ep.way), ep.shot)[None].astype(np.int32))
    qry = jnp.asarray(rng.integers(
        0, 255, (1, q, ep.seq_len, ep.img_size, ep.img_size, 3),
        dtype=np.uint8))
    variables = BatchedStudent(cfg).init(jax.random.key(0), sup, lab, qry,
                                         train=False)
    path = str(tmp_path / "demo.litemkd")
    export_serving_artifact(cfg, variables, path, platforms=("cpu",),
                            episodes=1)

    rows = build_runner(cfg, checkpoint_dir=path)(seed=3)
    assert len(rows) == q
    assert all(np.isfinite(r["logits"]).all() for r in rows)
    assert all(0 <= r["predicted"] < ep.way for r in rows)

    # a wrong-kind artifact is rejected with a clear error
    import pytest as _pytest
    from litemkd_tpu.tools.aot import export_extract_artifact
    from litemkd_tpu.train.teacher_steps import make_mfm
    base = preset("tiny")
    mcfg = base.replace(model=base.model.__class__(**{
        **base.model.__dict__, "trans_linear_in_dim": 16,
        "trans_linear_out_dim": 8, "trans_num": 1}))
    model = make_mfm(mcfg, batched=False)
    feats = {m: jnp.asarray(rng.standard_normal(
        (mcfg.episode.n_support, mcfg.episode.seq_len, 16)).astype(np.float32))
        for m in mcfg.model.modalities}
    qfeats = {m: v[:mcfg.episode.n_queries(True)] for m, v in feats.items()}
    mvars = model.init(jax.random.key(1), feats,
                       jnp.asarray(np.repeat(np.arange(mcfg.episode.way),
                                             mcfg.episode.shot).astype(np.int32)),
                       qfeats, False)
    epath = str(tmp_path / "extract.litemkd")
    export_extract_artifact(mcfg, mvars, epath, platforms=("cpu",), batch=2)
    with _pytest.raises(ValueError, match="extract_mfm"):
        build_runner(cfg, checkpoint_dir=epath)


def test_prune_empty_collections():
    """aot._prune_empty drops leafless subtrees at any depth (they cannot
    survive the params.npz round trip) and keeps every real leaf."""
    from litemkd_tpu.tools.aot import _prune_empty

    tree = {"params": {"w": 1, "inner": {"deeper": {}}},
            "batch_stats": {}, "x": 0}
    assert _prune_empty(tree) == {"params": {"w": 1}, "x": 0}


def test_deep_merge_variables_strict():
    """deep_merge_variables keeps unmentioned template subtrees, applies
    override leaves, and REFUSES override keys the template doesn't have —
    flax would silently ignore the stray subtree and the warm start would be
    a logged no-op."""
    from litemkd_tpu.utils import deep_merge_variables

    template = {"params": {"backbone": {"w": 1}, "head": {"b": 2}}}
    out = deep_merge_variables(template, {"params": {"backbone": {"w": 5}}})
    assert out == {"params": {"backbone": {"w": 5}, "head": {"b": 2}}}

    with pytest.raises(KeyError, match="params/bakbone"):
        deep_merge_variables(template, {"params": {"bakbone": {"w": 5}}})
    with pytest.raises(KeyError, match="subtree"):
        deep_merge_variables(template, {"params": {"backbone": 3}})


def test_confusion_tool(tmp_path):
    """figures confusion: per-task JSONL (cli.test --per_task_log schema) →
    real-class confusion matrix, per-class accuracy, most-confused pairs —
    the reference test.py:115-316 analysis path as a first-class tool."""
    import json
    from litemkd_tpu.tools.confusion import (read_task_log,
                                             confusion_from_records,
                                             per_class_accuracy, most_confused)
    from litemkd_tpu.cli.figures import main as figures_main

    log = tmp_path / "tasks.jsonl"
    recs = [
        {"task": 0, "accuracy": 2 / 3, "classes": [7, 3, 9],
         "real_labels": [7, 3, 9], "real_preds": [7, 3, 3]},
        {"task": 1, "accuracy": 1.0, "classes": [9, 3, 7],
         "real_labels": [9, 9], "real_preds": [9, 9]},
    ]
    log.write_text("\n".join(json.dumps(r) for r in recs) + "\n")

    m, ids = confusion_from_records(read_task_log(str(log)))
    assert ids == [3, 7, 9]
    # true 9 predicted 3 once; true 9 correct twice; true 3/7 correct once
    np.testing.assert_array_equal(m, [[1, 0, 0], [0, 1, 0], [1, 0, 2]])
    acc = per_class_accuracy(m)
    np.testing.assert_allclose(acc, [1.0, 1.0, 2 / 3])
    assert most_confused(m, ids) == [(9, 3, 1)]

    out = figures_main(["confusion", "--log", str(log),
                        "--out", str(tmp_path / "m.csv"),
                        "--png", str(tmp_path / "m.png")])
    assert os.path.getsize(out) > 0
    assert os.path.getsize(tmp_path / "m.png") > 0
    header = open(out).readline().strip().split(",")
    assert header[1:] == ["3", "7", "9"]
