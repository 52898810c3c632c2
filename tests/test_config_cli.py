"""Config roundtrip, CLI flag mapping, and prefetcher tests."""
import json
import numpy as np
import pytest

from litemkd_tpu import Config, preset
from litemkd_tpu.config import DistillConfig


def test_config_json_roundtrip():
    cfg = preset("student_fc2sup_dist")
    blob = json.loads(cfg.to_json())
    cfg2 = Config.from_dict(blob)
    assert cfg2.episode == cfg.episode
    assert cfg2.model == cfg.model
    assert cfg2.train == cfg.train
    assert cfg2.distill == cfg.distill


def test_presets_exist():
    for name in ["student_fc2sup_dist", "student_plain", "mfm_teacher",
                 "student_mobilenet", "expert_trx", "expert_strm",
                 "expert_baseline", "expert_skeleton_trx", "tiny"]:
        cfg = preset(name)
        if name.startswith("expert_"):
            # the expert stage trains without a fused teacher: run.py's
            # --loss variants (TRXLoss default / CELoss for Baseline /
            # the STRM joint), qpc 4
            assert cfg.distill.name in ("TRXLoss", "CELoss", "strm_expert")
            assert cfg.episode.query_per_class == 4


def test_cli_flag_mapping():
    """Reference-style flags land in the right config fields."""
    import argparse
    from litemkd_tpu.cli.common import add_common_args, add_train_args, build_config
    p = argparse.ArgumentParser()
    add_common_args(p)
    add_train_args(p)
    args = p.parse_args([
        "--way", "3", "--shot", "2", "--seq_len", "4",
        "--model_backbone", "resnet18_2fc", "--model_classifier", "TRX_2fcsup",
        "--distill_name", "fc_2_sup_dist", "--temperature", "2.5",
        "--dataset", "hmdb", "--split", "3",
        "-lr", "5e-5", "--tasks_per_batch", "4", "--sch", "100", "200",
        "-c", "/tmp/x", "--temp_set", "2",
    ])
    cfg = build_config(args)
    assert cfg.episode.way == 3 and cfg.episode.shot == 2
    assert cfg.episode.seq_len == 4
    assert cfg.model.backbone == "resnet18_2fc"
    assert cfg.distill.name == "fc_2_sup_dist"
    assert cfg.distill.temperature == 2.5
    assert cfg.data.dataset == "hmdb"
    assert cfg.data.traintestlist.endswith("hmdb_ARN")
    assert cfg.train.learning_rate == 5e-5
    assert cfg.train.tasks_per_batch == 4
    assert cfg.train.sch == (100, 200)
    assert cfg.train.checkpoint_dir == "/tmp/x"


def test_cli_debug_disables_checkpointing():
    import argparse
    from litemkd_tpu.cli.common import add_common_args, add_train_args, build_config
    p = argparse.ArgumentParser()
    add_common_args(p)
    add_train_args(p)
    args = p.parse_args(["--debug", "-c", "/tmp/x", "--dataset", "synthetic"])
    cfg = build_config(args)
    assert cfg.train.checkpoint_dir is None


def test_cli_synthetic_noise_threading():
    """--synthetic_noise (the synthetic-dataset difficulty knob behind the
    protocol-scale eval row, BENCH_HISTORY mode=protocol_eval) reaches the
    sampler; omitting it keeps the preset default."""
    import argparse
    from litemkd_tpu.cli.common import (add_common_args, add_train_args,
                                        build_config, build_sampler)
    p = argparse.ArgumentParser()
    add_common_args(p)
    add_train_args(p)
    args = p.parse_args(["--dataset", "synthetic",
                         "--synthetic_noise", "4.0", "--debug"])
    cfg = build_config(args)
    assert cfg.data.synthetic_noise == 4.0
    assert build_sampler(cfg).noise == 4.0

    args = p.parse_args(["--dataset", "synthetic", "--debug"])
    cfg = build_config(args)
    assert cfg.data.synthetic_noise == 0.3
    assert build_sampler(cfg).noise == 0.3


def test_prefetcher_orders_and_completes():
    from litemkd_tpu.data import Prefetcher, SyntheticEpisodeSource
    cfg = preset("tiny")
    src = SyntheticEpisodeSource(cfg, n_classes=6, seed=0)
    rng = np.random.default_rng(0)
    seen = []
    fetch = Prefetcher(lambda i: src.sample_batch(rng, 1), n_batches=5, depth=2)
    for batch in fetch:
        seen.append(batch.support_labels.shape)
    assert len(seen) == 5


def test_prefetcher_propagates_worker_errors():
    from litemkd_tpu.data import Prefetcher

    def boom(i):
        if i == 2:
            raise RuntimeError("decode failed")
        from litemkd_tpu.data import SyntheticEpisodeSource
        cfg = preset("tiny")
        return SyntheticEpisodeSource(cfg, n_classes=6, seed=0).sample_batch(
            np.random.default_rng(i), 1)

    fetch = Prefetcher(boom, n_batches=5, depth=2)
    with pytest.raises(RuntimeError, match="decode failed"):
        for _ in fetch:
            pass


def test_distill_config_defaults_match_reference():
    """The cfg dict defaults of options.py:51-60."""
    d = DistillConfig()
    assert d.temperature == 4.0
    assert d.soft_loss_weight == 2.0
    assert d.hard_loss_weight == 1.0
    assert d.soft_loss_weight_support == 1.0
    assert d.fcwsl_aerfa == 0.5


def test_cli_model_flags_survive_build_config():
    """build_config must not silently reset ModelConfig fields it doesn't
    map from flags (pallas_bn was once dropped), and the perf flags map."""
    import argparse
    from litemkd_tpu import preset
    from litemkd_tpu.cli.common import add_common_args, add_train_args, build_config

    p = argparse.ArgumentParser()
    add_common_args(p)
    add_train_args(p)

    # flag → config
    args = p.parse_args(["--preset", "tiny", "--pallas_bn", "--freeze_bn",
                         "--pallas_tct"])
    cfg = build_config(args)
    assert cfg.model.pallas_bn and cfg.model.freeze_bn and cfg.model.use_pallas

    # preset value survives a flagless parse for EVERY model field
    base = preset("tiny")
    src = base.replace(model=base.model.__class__(**{
        **base.model.__dict__, "pallas_bn": True, "freeze_bn": True,
        "use_pallas": True, "remat": True, "shirt_num": 2}))
    import litemkd_tpu.cli.common as common
    orig = common.preset
    common.preset = lambda name, **kw: src if name == "tiny" else orig(name, **kw)
    try:
        cfg = build_config(p.parse_args(["--preset", "tiny"]))
    finally:
        common.preset = orig
    assert cfg.model.__dict__ == src.model.__dict__


def test_backbone_only_warmstart_keeps_classifier(tmp_path):
    """--init_checkpoint with a backbone-only torch file (pretrained trunks,
    no TRX keys) merges over the initialized template instead of dropping
    the classifier params."""
    import torch
    import sys, os as _os
    sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tools"))
    from torch_cpu_baseline import ResNet18Trunk
    from test_torch_import import _baseline_to_torchvision_names
    from litemkd_tpu.cli import train as cli_train

    torch.manual_seed(0)
    sd = {}
    for k, v in _baseline_to_torchvision_names(ResNet18Trunk()).items():
        sd[f"backbone.resnet.{k}"] = torch.tensor(v)
    lin = torch.nn.Linear(512, 64)
    for head in ("fc1", "fc2"):
        sd[f"backbone.{head}.weight"] = lin.weight.detach()
        sd[f"backbone.{head}.bias"] = lin.bias.detach()
    path = str(tmp_path / "trunks.pt")
    torch.save({"model_state_dict": sd}, path)

    state = cli_train.main([
        "--preset", "tiny", "--dataset", "synthetic",
        "--model_backbone", "resnet18_2fc", "--trans_linear_in_dim", "64",
        "--trans_linear_out_dim", "32", "--training_iterations", "2",
        "--tasks_per_batch", "2", "-c", str(tmp_path / "ck"),
        "--print_freq", "0", "--init_checkpoint", path])
    # classifier params exist (template preserved) and training ran
    assert "classifier" in state.params
    assert int(state.episodes_seen) == 2


def test_cli_test_per_task_log(tmp_path):
    """--per_task_log emits one JSON record per task with the real-class
    prediction mapping (reference test.py:232 + utils.py task_confusion):
    the per-record accuracy must equal the fraction of real_preds matching
    real_labels, and every prediction must be one of the episode's classes."""
    import json
    from litemkd_tpu.cli import test as cli_test

    log = tmp_path / "tasks.jsonl"
    summary = cli_test.main([
        "--preset", "tiny", "--dataset", "synthetic",
        "--num_test_tasks", "5", "--per_task_log", str(log)])
    records = [json.loads(l) for l in log.read_text().splitlines()]
    assert len(records) == 5 == summary["n_tasks"]
    assert [r["task"] for r in records] == list(range(5))
    for r in records:
        classes = set(r["classes"])
        assert set(r["real_preds"]) <= classes
        assert set(r["real_labels"]) <= classes
        hits = np.mean([p == l for p, l in
                        zip(r["real_preds"], r["real_labels"])])
        np.testing.assert_allclose(r["accuracy"], hits, atol=1e-6)


def test_checkpoint_carries_its_config(tmp_path):
    """Eval/export CLIs use the config.json saved next to a checkpoint as
    their base: a non-default-geometry run (tiny preset here) evaluates and
    exports without re-specifying any geometry flag; explicit flags still
    override; the recorded checkpoint_dir is cleared so an eval never
    collides with the original run's directory guard."""
    from litemkd_tpu.cli import train as cli_train
    from litemkd_tpu.cli import test as cli_test
    from litemkd_tpu.cli.common import load_saved_config

    ck = str(tmp_path / "ck")
    cli_train.main([
        "--preset", "tiny", "--dataset", "synthetic",
        "--training_iterations", "2", "--tasks_per_batch", "2",
        "-c", ck, "--print_freq", "0"])

    base = load_saved_config(ck)
    assert base is not None
    assert base.model.trans_linear_in_dim == preset("tiny").model.trans_linear_in_dim
    assert base.train.checkpoint_dir is None        # never write back
    assert load_saved_config(None, str(tmp_path / "nope")) is None

    # no --preset / geometry flags: the checkpoint's own config drives eval
    summary = cli_test.main(["-m", ck, "--num_test_tasks", "2"])
    assert summary["n_tasks"] == 2


def test_deferred_host_sync_semantics():
    """DeferredHostSync absorbs in push order with exactly one item pending,
    flush drains it (idempotently), and interleaved flushes (the checkpoint /
    mid-train-eval barriers) never reorder or drop items."""
    from litemkd_tpu.data import DeferredHostSync

    seen = []
    d = DeferredHostSync(lambda *item: seen.append(item))
    d.flush()                       # empty flush is a no-op
    assert seen == []
    d.push(1, "a")
    assert seen == []               # one item pending, nothing absorbed yet
    d.push(2, "b")
    assert seen == [(1, "a")]       # push absorbs the previous item
    d.flush()
    assert seen == [(1, "a"), (2, "b")]
    d.flush()                       # double flush absorbs nothing twice
    assert seen == [(1, "a"), (2, "b")]
    d.push(3, "c")                  # reusable after flush
    d.flush()
    assert seen == [(1, "a"), (2, "b"), (3, "c")]


def test_teacher_and_expert_presets_never_decay_lr():
    """run.py:140 and multi_fusion.py:287-291 default --sch to [1000000] and
    no released script overrides it — the teacher-half stages train at a
    CONSTANT lr, unlike the student's 20k/40k milestones. The presets must
    not inherit the student default."""
    from litemkd_tpu.config import preset
    for name in ("mfm_teacher", "expert_trx", "expert_strm",
                 "expert_baseline", "expert_skeleton_trx"):
        cfg = preset(name)
        assert min(cfg.train.sch) > cfg.train.training_iterations, name
    assert preset("mfm_teacher").train.training_iterations == 50_015
