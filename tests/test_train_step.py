"""End-to-end train-step tests on the tiny synthetic config."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from litemkd_tpu import preset
from litemkd_tpu.data import SyntheticEpisodeSource
from litemkd_tpu.train import (create_train_state, make_train_step,
                               make_eval_step)


@pytest.fixture(scope="module")
def setup():
    cfg = preset("tiny")
    source = SyntheticEpisodeSource(cfg, n_classes=8, seed=0, noise=0.2)
    rng = np.random.default_rng(0)
    batch = source.sample_batch(rng, cfg.train.tasks_per_batch)
    state, t_vars = create_train_state(cfg, jax.random.key(0), batch)
    step = jax.jit(make_train_step(cfg))
    return cfg, source, state, t_vars, step


def test_train_step_runs_and_updates(setup):
    cfg, source, state, t_vars, step = setup
    rng = np.random.default_rng(1)
    batch = source.sample_batch(rng, cfg.train.tasks_per_batch)
    new_state, metrics = step(state, t_vars, batch)
    assert int(new_state.step) == int(state.step) + 1
    assert int(new_state.episodes_seen) == cfg.train.tasks_per_batch
    assert np.isfinite(float(metrics["task_loss"]))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0
    # params actually changed
    old = jax.tree_util.tree_leaves(state.params)[0]
    new = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_loss_decreases_over_steps(setup):
    cfg, source, state, t_vars, step = setup
    rng = np.random.default_rng(2)
    losses = []
    for i in range(8):
        batch = source.sample_batch(rng, cfg.train.tasks_per_batch)
        state, metrics = step(state, t_vars, batch)
        losses.append(float(metrics["task_loss"]))
    assert np.isfinite(losses).all()
    # distillation on separable synthetic data should make progress
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) + 1e-3


def test_eval_step(setup):
    cfg, source, state, t_vars, step = setup
    eval_step = jax.jit(make_eval_step(cfg))
    rng = np.random.default_rng(3)
    batch = source.sample_batch(rng, 4, train=False)
    accs = eval_step(state.variables, batch)
    assert accs.shape == (4,)
    assert ((np.asarray(accs) >= 0) & (np.asarray(accs) <= 1)).all()


def test_ce_only_training_without_teacher():
    base = preset("tiny")
    cfg = base.replace(
        distill=base.distill.__class__(name="ce"),
        model=base.model.__class__(
            backbone="resnet18_student", classifier="TRX",
            trans_linear_in_dim=base.model.trans_linear_in_dim,
            trans_linear_out_dim=base.model.trans_linear_out_dim,
            trans_num=1),
    )
    source = SyntheticEpisodeSource(cfg, n_classes=8, seed=0,
                                    with_teacher_feats=False)
    rng = np.random.default_rng(0)
    batch = source.sample_batch(rng, 2)
    state, t_vars = create_train_state(cfg, jax.random.key(0), batch)
    assert t_vars is None
    step = jax.jit(make_train_step(cfg))
    state, metrics = step(state, t_vars, batch)
    assert np.isfinite(float(metrics["task_loss"]))


def test_expert_strm_training_without_teacher():
    """The CNN_STRM expert stage (run.py:330-337 joint CE: fr + 0.1·pat,
    scripts/*/trx/*_strm.sh) trains at tiny geometry with no teacher — the
    combo behind the expert_strm preset."""
    base = preset("tiny")
    cfg = base.replace(
        distill=base.distill.__class__(name="strm"),
        model=base.model.__class__(
            backbone="cnn_strm", classifier="strmclassifiers",
            trans_linear_in_dim=base.model.trans_linear_in_dim,
            trans_linear_out_dim=base.model.trans_linear_out_dim,
            trans_num=1),
    )
    source = SyntheticEpisodeSource(cfg, n_classes=8, seed=0,
                                    with_teacher_feats=False)
    rng = np.random.default_rng(0)
    batch = source.sample_batch(rng, 2)
    state, t_vars = create_train_state(cfg, jax.random.key(0), batch)
    assert t_vars is None
    step = jax.jit(make_train_step(cfg))
    state, metrics = step(state, t_vars, batch)
    assert np.isfinite(float(metrics["task_loss"]))
    assert np.isfinite(float(metrics["pat_loss"]))


def test_lr_schedule_decays():
    from litemkd_tpu.train import multistep_lr
    sched = multistep_lr(1e-4, (2000, 4000), 0.1, episodes_per_step=16)
    assert np.isclose(float(sched(0)), 1e-4)
    assert np.isclose(float(sched(2000 // 16 + 1)), 1e-5)
    assert np.isclose(float(sched(4000 // 16 + 1)), 1e-6)


def test_watch_metrics():
    """cfg.train.watch adds global and per-module grad/param norms to the
    step metrics (the wandb.watch analog, trainwandb.py:52)."""
    base = preset("tiny")
    cfg = base.replace(train=base.train.__class__(**{
        **base.train.__dict__, "watch": True}))
    src = SyntheticEpisodeSource(cfg, n_classes=6, seed=0)
    rng = np.random.default_rng(0)
    batch = src.sample_batch(rng, 2)
    state, t_vars = create_train_state(cfg, jax.random.key(0), batch)
    step = jax.jit(make_train_step(cfg))
    _, metrics = step(state, t_vars, batch)
    for key in ("grad_norm", "param_norm", "grad_norm/backbone",
                "grad_norm/classifier", "param_norm/backbone",
                "param_norm/classifier"):
        assert key in metrics, sorted(metrics)
        v = float(metrics[key])
        assert np.isfinite(v) and v > 0, (key, v)


def test_watch_flag_maps_to_config():
    import argparse
    from litemkd_tpu.cli.common import (add_common_args, add_train_args,
                                        build_config)
    p = argparse.ArgumentParser()
    add_common_args(p)
    add_train_args(p)
    cfg = build_config(p.parse_args(["--preset", "tiny", "--dataset",
                                     "synthetic", "--watch"]))
    assert cfg.train.watch is True
    cfg = build_config(p.parse_args(["--preset", "tiny", "--dataset",
                                     "synthetic"]))
    assert cfg.train.watch is False


def test_resume_continues_episode_stream(tmp_path):
    """--resume_from_checkpoint must CONTINUE the training data stream, not
    replay batches 0..k a second time: the per-step rng is keyed by absolute
    step (train/loop.py produce), so full-run batches k.. match a resumed
    run's batches exactly."""
    import dataclasses
    from litemkd_tpu.train import run_training
    from litemkd_tpu.utils import MetricsLogger

    base = preset("tiny")

    class Recording:
        def __init__(self, src):
            self.src, self.sums = src, []

        def sample_batch(self, rng, n, train=True, **kw):
            b = self.src.sample_batch(rng, n, train=train, **kw)
            if train and n > 1:
                self.sums.append(float(np.sum(b.support_clips.astype(np.int64))))
            return b

    def mk(iters, ckpt_dir, resume):
        return base.replace(train=dataclasses.replace(
            base.train, tasks_per_batch=2, training_iterations=iters,
            test_iters=(), checkpoint_dir=ckpt_dir,
            resume_from_checkpoint=resume, save_freq=10 ** 6))

    src = SyntheticEpisodeSource(base, n_classes=8, seed=0)
    full = Recording(src)
    run_training(mk(8, str(tmp_path / "full"), False), full,
                 MetricsLogger(print_freq=0))
    half = Recording(src)
    run_training(mk(4, str(tmp_path / "res"), False), half,
                 MetricsLogger(print_freq=0))
    rest = Recording(src)
    run_training(mk(8, str(tmp_path / "res"), True), rest,
                 MetricsLogger(print_freq=0))

    assert full.sums[:2] == half.sums          # same prefix stream
    assert rest.sums == full.sums[2:]          # resume continues, not replays
