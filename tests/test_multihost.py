"""True multi-process multihost input assembly.

Round-1 coverage only exercised parallel/multihost.py at process_count==1,
where global_batch_from_local reduces to shard_batch. This launches TWO real
processes (jax.distributed over localhost, 4 virtual CPU devices each), has
each draw its disjoint episode shard from the process-folded RNG stream, glue
the global batch with jax.make_array_from_process_local_data, and run one
jitted train step over the cross-process 8-device mesh — then asserts the
metrics equal a single-process run over the concatenation of both shards.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")
GLOBAL_E = 8


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(n_local_devices):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append(f"--xla_force_host_platform_device_count={n_local_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _expected_single_process():
    """The same global batch assembled in-process: concat of both processes'
    host_rng shards, one train step on this suite's 8-device mesh."""
    from litemkd_tpu import preset, MeshConfig
    from litemkd_tpu.data import SyntheticEpisodeSource
    from litemkd_tpu.parallel import make_mesh, shard_variables, shard_batch
    from litemkd_tpu.train import create_train_state, make_train_step

    cfg = preset("tiny")
    src = SyntheticEpisodeSource(cfg, n_classes=8, seed=0)
    shards = [src.sample_batch(np.random.default_rng((cfg.train.seed, p, 0)),
                               GLOBAL_E // 2, train=True) for p in (0, 1)]
    batch = jax.tree_util.tree_map(
        lambda a, b: np.concatenate([a, b], axis=0), *shards)
    checksums = {
        "support_clips": batch.support_clips.astype(np.float32).sum(
            axis=tuple(range(1, batch.support_clips.ndim))).tolist(),
        "query_clips": batch.query_clips.astype(np.float32).sum(
            axis=tuple(range(1, batch.query_clips.ndim))).tolist(),
        "support_labels": (batch.support_labels
                           * (1 + np.arange(batch.support_labels.shape[1]))
                           ).sum(axis=1).astype(np.float32).tolist(),
    }

    mesh = make_mesh(MeshConfig(data=8, model=1))
    init_batch = jax.tree_util.tree_map(lambda x: x[:1], batch)
    state, t_vars = create_train_state(cfg, jax.random.key(0), init_batch,
                                       episodes_per_step=GLOBAL_E)
    state = state.replace(
        params=shard_variables(state.params, mesh),
        batch_stats=shard_variables(state.batch_stats, mesh),
        opt_state=shard_variables(state.opt_state, mesh))
    t_vars = shard_variables(t_vars, mesh)
    batch = shard_batch(batch, mesh)
    step = jax.jit(make_train_step(cfg))
    with jax.set_mesh(mesh):
        _, metrics = step(state, t_vars, batch)
    return {"task_loss": float(metrics["task_loss"]),
            "accuracy": float(metrics["accuracy"]),
            "checksums": checksums}


@pytest.mark.slow
def test_two_process_assembly_matches_single_process(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh env")
    port = _free_port()
    out = str(tmp_path / "metrics.json")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--process_id", str(i),
             "--num_processes", "2", "--port", str(port), "--out", out,
             "--global_episodes", str(GLOBAL_E)],
            env=_worker_env(4), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for p, stdout in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{stdout}"
    with open(out) as f:
        got = json.load(f)
    assert got["process_count"] == 2
    assert got["global_devices"] == 8
    assert got["step"] == 1

    want = _expected_single_process()
    # the global batch must be BYTE-IDENTICAL to the single-process concat
    # (uint8 per-episode sums are exact in f32; episode order preserved)
    for k in want["checksums"]:
        np.testing.assert_array_equal(got["checksums"][k],
                                      want["checksums"][k], err_msg=k)
    # with identical content, the remaining delta is bf16 reduction ordering
    # across the different device/process partitioning (~3e-4 observed)
    np.testing.assert_allclose(got["task_loss"], want["task_loss"], rtol=1e-3)
    np.testing.assert_allclose(got["accuracy"], want["accuracy"], atol=1e-6)
