"""Worker for the true multi-process multihost test (not a pytest module).

Launched twice by tests/test_multihost.py with JAX_PLATFORMS=cpu and 4 virtual
devices per process: initializes jax.distributed, draws this process's
disjoint episode shard exactly like run_training's multihost branch
(train/loop.py), assembles the global data-sharded batch via
global_batch_from_local, runs ONE jitted train step over the global mesh, and
(on process 0) writes the metrics to --out.

Usage:
    python multihost_worker.py --process_id 0 --num_processes 2 \
        --port 9911 --out /tmp/metrics.json
"""
import argparse
import json

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--global_episodes", type=int, default=8)
    args = p.parse_args()

    import jax
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id)
    jax.config.update("jax_default_matmul_precision", "highest")

    from litemkd_tpu import preset, MeshConfig
    from litemkd_tpu.data import SyntheticEpisodeSource
    from litemkd_tpu.parallel import (make_mesh, shard_variables,
                                      local_episode_count, host_rng,
                                      global_batch_from_local)
    from litemkd_tpu.train import create_train_state, make_train_step

    cfg = preset("tiny")
    mesh = make_mesh(MeshConfig(data=len(jax.devices()), model=1))

    src = SyntheticEpisodeSource(cfg, n_classes=8, seed=0)
    local_e = local_episode_count(args.global_episodes)
    local = src.sample_batch(host_rng(cfg.train.seed, 0), local_e, train=True)

    # deterministic identical init on every process; replicate over the mesh
    init_batch = jax.tree_util.tree_map(lambda x: x[:1], local)
    state, t_vars = create_train_state(cfg, jax.random.key(0), init_batch,
                                       episodes_per_step=args.global_episodes)
    state = state.replace(
        params=shard_variables(state.params, mesh),
        batch_stats=shard_variables(state.batch_stats, mesh),
        opt_state=shard_variables(state.opt_state, mesh))
    t_vars = shard_variables(t_vars, mesh)

    batch = global_batch_from_local(local, mesh)

    # PER-EPISODE content checksums of the GLOBAL batch (uint8 sums are exact
    # in f32; episode order preserved) — lets the test prove the assembly is
    # byte-identical to a single-process concat before attributing any metric
    # delta to bf16 reduction ordering
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    def checksums(b):
        return {
            "support_clips": jnp.sum(b.support_clips.astype(jnp.float32),
                                     axis=tuple(range(1, b.support_clips.ndim))),
            "query_clips": jnp.sum(b.query_clips.astype(jnp.float32),
                                   axis=tuple(range(1, b.query_clips.ndim))),
            "support_labels": jnp.sum(
                b.support_labels * (1 + jnp.arange(b.support_labels.shape[1])),
                axis=1).astype(jnp.float32),
        }

    with jax.set_mesh(mesh):
        sums = jax.jit(checksums)(batch)
    sums = {k: np.asarray(multihost_utils.process_allgather(v, tiled=True)
                          ).ravel().tolist()
            for k, v in sums.items()}

    step = jax.jit(make_train_step(cfg))
    with jax.set_mesh(mesh):
        new_state, metrics = step(state, t_vars, batch)
    record = {
        "checksums": sums,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "task_loss": float(metrics["task_loss"]),
        "accuracy": float(metrics["accuracy"]),
        "step": int(new_state.step),
    }
    print(json.dumps(record))
    if args.out and jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump(record, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
