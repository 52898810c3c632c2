"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from litemkd_tpu import preset, MeshConfig
from litemkd_tpu.data import SyntheticEpisodeSource
from litemkd_tpu.parallel import (make_mesh, shard_variables, shard_batch,
                                  variables_shardings, batch_shardings)
from litemkd_tpu.train import create_train_state, make_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=4, model=2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    assert mesh.shape["data"] == len(jax.devices())


def test_dp_tp_train_step_matches_single_device():
    cfg = preset("tiny")
    src = SyntheticEpisodeSource(cfg, n_classes=8, seed=0)
    rng = np.random.default_rng(0)
    batch = src.sample_batch(rng, 8)   # divisible by data axis
    state, t_vars = create_train_state(cfg, jax.random.key(0), batch)
    step = make_train_step(cfg)

    # single-device reference
    s1, m1 = jax.jit(step)(state, t_vars, batch)

    # dp=4 x tp=2 mesh
    mesh = make_mesh(MeshConfig(data=4, model=2))
    sh_state = state.replace(
        params=shard_variables(state.params, mesh),
        batch_stats=shard_variables(state.batch_stats, mesh),
        opt_state=shard_variables(state.opt_state, mesh),
    )
    sh_tvars = shard_variables(t_vars, mesh)
    sh_batch = shard_batch(batch, mesh)
    with jax.set_mesh(mesh):
        s2, m2 = jax.jit(step)(sh_state, sh_tvars, sh_batch)

    assert np.isfinite(float(m2["task_loss"]))
    np.testing.assert_allclose(float(m1["task_loss"]), float(m2["task_loss"]),
                               rtol=2e-3)
    # parameters after one step agree between single-device and sharded runs
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-3,
                               atol=1e-5)


def test_mfm_dp_tp_step_matches_single_device():
    """The MFM fusion-teacher train step (Adam over encoder stacks) produces
    the same loss/params on a dp4×tp2 mesh as on one device — the teacher
    CLI's cfg.mesh path (train/teacher_steps.py + parallel/mesh.py)."""
    from litemkd_tpu.cli.train_teacher import SyntheticMultiModalSource
    from litemkd_tpu.train import create_mfm_train_state, make_mfm_train_step

    base = preset("tiny")
    cfg = base.replace(model=base.model.__class__(**{
        **base.model.__dict__, "trans_linear_in_dim": 32,
        "trans_linear_out_dim": 16, "trans_num": 1}))
    src = SyntheticMultiModalSource(cfg, n_classes=8, seed=0)
    batch = src.sample_batch(np.random.default_rng(0), 8)
    state = create_mfm_train_state(cfg, jax.random.key(0), batch)
    step = make_mfm_train_step(cfg)

    s1, m1 = jax.jit(step)(state, batch)

    mesh = make_mesh(MeshConfig(data=4, model=2))
    sh_state = state.replace(
        params=shard_variables(state.params, mesh),
        opt_state=shard_variables(state.opt_state, mesh),
    )
    sh_batch = shard_batch(batch, mesh)
    with jax.set_mesh(mesh):
        s2, m2 = jax.jit(step)(sh_state, sh_batch)

    assert np.isfinite(float(m2["task_loss"]))
    np.testing.assert_allclose(float(m1["task_loss"]), float(m2["task_loss"]),
                               rtol=2e-3)
    for p1, p2 in zip(jax.tree_util.tree_leaves(s1.params)[:3],
                      jax.tree_util.tree_leaves(s2.params)[:3]):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-3,
                                   atol=1e-5)


def test_tp_shards_wide_projections():
    cfg = preset("tiny")
    src = SyntheticEpisodeSource(cfg, n_classes=8, seed=0)
    batch = src.sample_batch(np.random.default_rng(0), 4)
    state, _ = create_train_state(cfg, jax.random.key(0), batch)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    sh = variables_shardings(state.params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    tp_sharded = [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, s in flat if "model" in str(s.spec)
    ]
    assert any("k_linear" in p for p in tp_sharded), tp_sharded


def test_multihost_input_assembly_single_process_equivalence():
    """global_batch_from_local == shard_batch in the 1-process case, and the
    assembled batch drives a sharded train step (multi-host input design)."""
    from litemkd_tpu.parallel import (global_batch_from_local,
                                      local_episode_count, host_rng)
    cfg = preset("tiny")
    src = SyntheticEpisodeSource(cfg, n_classes=8, seed=0)
    n_local = local_episode_count(8)     # 1 process → full batch
    assert n_local == 8
    batch = src.sample_batch(host_rng(0, step=0), n_local)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    g = global_batch_from_local(batch, mesh)
    s = shard_batch(batch, mesh)
    for a, b in zip(g, s):
        if a is None:
            assert b is None
            continue
        assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    state, t_vars = create_train_state(cfg, jax.random.key(0), batch)
    sh_state = state.replace(
        params=shard_variables(state.params, mesh),
        batch_stats=shard_variables(state.batch_stats, mesh),
        opt_state=shard_variables(state.opt_state, mesh),
    )
    with jax.set_mesh(mesh):
        s2, m2 = jax.jit(make_train_step(cfg))(sh_state,
                                               shard_variables(t_vars, mesh), g)
    assert np.isfinite(float(m2["task_loss"]))

    # per-process RNG streams are disjoint per step
    a = host_rng(0, step=0).integers(0, 1 << 30, 4)
    b = host_rng(0, step=1).integers(0, 1 << 30, 4)
    assert not np.array_equal(a, b)


def test_run_training_shards_over_mesh(tmp_path):
    """The CLI-facing training loop consumes cfg.mesh: with a multi-device
    mesh and a divisible batch it shards state + batches and still trains."""
    from litemkd_tpu.train import run_training
    from litemkd_tpu.utils.logging import MetricsLogger

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    base = preset("tiny")
    cfg = base.replace(
        mesh=MeshConfig(data=4, model=2),
        train=base.train.__class__(**{**base.train.__dict__,
                                      "tasks_per_batch": 8,
                                      "training_iterations": 16,
                                      "checkpoint_dir": None}))
    src = SyntheticEpisodeSource(cfg, n_classes=8, seed=0)
    logs = []
    logger = MetricsLogger(print_freq=0)
    logger.info = lambda msg: logs.append(msg)
    state, _, _ = run_training(cfg, src, logger)
    assert int(state.episodes_seen) == 16
    assert any("sharding over mesh" in m for m in logs), logs


def test_run_eval_sharded_matches_unsharded():
    """Eval over a dp mesh returns the same per-episode accuracies as the
    plain path (remainder chunks that don't divide the data axis replicate)."""
    from litemkd_tpu.train import run_eval, create_train_state

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = preset("tiny")
    src = SyntheticEpisodeSource(cfg, n_classes=8, seed=0)
    batch = src.sample_batch(np.random.default_rng(0), 2)
    state, _ = create_train_state(cfg, jax.random.key(0), batch)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    # 20 tasks with batch_size 8 → two full sharded chunks + one remainder 4
    plain = run_eval(cfg, state.variables, src, n_tasks=20, seed=5)
    sharded = run_eval(cfg, state.variables, src, n_tasks=20, seed=5,
                       mesh=mesh)
    assert sharded["n_tasks"] == plain["n_tasks"] == 20
    np.testing.assert_allclose(sharded["accuracy"], plain["accuracy"],
                               atol=1e-4)


def test_dp_mesh_with_micro_batch_matches_single_device():
    """lax.scan grad accumulation (micro_batch) composes with dp sharding:
    the scan reshapes the sharded episode axis, so verify the numerics stay
    equal to the single-device result."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    base = preset("tiny")
    cfg = base.replace(train=base.train.__class__(
        **{**base.train.__dict__, "micro_batch": 2}))
    src = SyntheticEpisodeSource(cfg, n_classes=8, seed=0)
    batch = src.sample_batch(np.random.default_rng(0), 8)
    state, t_vars = create_train_state(cfg, jax.random.key(0), batch)
    step = make_train_step(cfg)
    s1, m1 = jax.jit(step)(state, t_vars, batch)

    mesh = make_mesh(MeshConfig(data=4, model=1), devices=jax.devices()[:4])
    sh_state = state.replace(
        params=shard_variables(state.params, mesh),
        batch_stats=shard_variables(state.batch_stats, mesh),
        opt_state=shard_variables(state.opt_state, mesh))
    with jax.set_mesh(mesh):
        s2, m2 = jax.jit(step)(sh_state, shard_variables(t_vars, mesh),
                               shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m1["task_loss"]), float(m2["task_loss"]),
                               rtol=2e-3)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-3,
                               atol=1e-5)


def test_sharded_state_checkpoint_roundtrip(tmp_path):
    """Orbax saves a mesh-sharded TrainState and restores it into a fresh
    (unsharded) template — the resume path of a multi-device run."""
    from litemkd_tpu.train import run_training
    from litemkd_tpu.utils.logging import MetricsLogger

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    base = preset("tiny")
    cfg = base.replace(
        mesh=MeshConfig(data=8, model=1),
        train=base.train.__class__(**{**base.train.__dict__,
                                      "tasks_per_batch": 8,
                                      "training_iterations": 16,
                                      "checkpoint_dir": str(tmp_path / "ck")}))
    src = SyntheticEpisodeSource(cfg, n_classes=8, seed=0)
    state, _, _ = run_training(cfg, src, MetricsLogger(print_freq=0))
    assert int(state.episodes_seen) == 16

    cfg2 = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "training_iterations": 32,
           "resume_from_checkpoint": True}))
    state2, _, _ = run_training(cfg2, src, MetricsLogger(print_freq=0))
    assert int(state2.episodes_seen) == 32
