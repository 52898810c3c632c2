"""Flagship on-chip soak: sustained optimizer steps with a mid-soak
checkpoint-save → restore → continue and a mid-train eval (VERDICT r3 item 3).

Runs SOAK_STEPS (default 500) steps of the canonical ``student_fc2sup_dist``
preset (16 episodes/step fused, micro_batch 4 — the bench.py shapes, so the
persistent compile cache is hit) over device-resident synthetic episode
batches, recording episodes/sec per SOAK_WINDOW-step window and asserting
every synced loss is finite. At the midpoint it saves an orbax checkpoint,
runs one eval batch, restores the checkpoint into a fresh TrainState, verifies
the restored params match, and continues from the RESTORED state — the
failure-recovery path exercised under the real training cadence.

Timing per CLAUDE.md: dispatches are chained within a window and only the
window's last loss is hard-synced (float()), so the ~30 ms axon-tunnel RTT is
charged once per window, not per step.

    python tools/soak.py            # appends a mode="soak" row to
                                    # BENCH_HISTORY.jsonl and prints a summary
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    from litemkd_tpu import preset
    from litemkd_tpu.cli.common import enable_compilation_cache
    from litemkd_tpu.data import SyntheticEpisodeSource, device_put_batch
    from litemkd_tpu.train import (create_train_state, make_eval_step,
                                   make_train_step)
    from litemkd_tpu.train.checkpoint import CheckpointManager

    enable_compilation_cache()

    n_steps = int(os.environ.get("SOAK_STEPS", "500"))
    window = int(os.environ.get("SOAK_WINDOW", "50"))
    eps_per_step = int(os.environ.get("SOAK_EPISODES_PER_STEP", "16"))
    micro = int(os.environ.get("SOAK_MICRO_BATCH", "4"))
    ckpt_dir = os.environ.get("SOAK_CKPT_DIR",
                              f"/tmp/litemkd_soak_{os.getpid()}")

    cfg = preset("student_fc2sup_dist")
    cfg = cfg.replace(train=cfg.train.__class__(**{
        **cfg.train.__dict__, "tasks_per_batch": eps_per_step,
        "micro_batch": micro}))

    src = SyntheticEpisodeSource(cfg, n_classes=16, seed=0)
    rng = np.random.default_rng(0)
    print(f"[soak] transferring {2} train + 1 eval batches "
          f"({eps_per_step} episodes each) through the tunnel...", flush=True)
    batches = [device_put_batch(src.sample_batch(rng, eps_per_step))
               for _ in range(2)]
    eval_batch = device_put_batch(
        src.sample_batch(rng, eps_per_step, train=False))

    state, t_vars = create_train_state(cfg, jax.random.key(0), batches[0])
    step = jax.jit(make_train_step(cfg))
    eval_step = jax.jit(make_eval_step(cfg))

    t_c = time.time()
    state, metrics = step(state, t_vars, batches[0])   # compile + warmup
    warm_loss = float(metrics["task_loss"])
    print(f"[soak] compile+warmup {time.time() - t_c:.1f}s "
          f"loss={warm_loss:.4f}", flush=True)
    assert np.isfinite(warm_loss)

    mid = n_steps // 2
    windows, done = [], 0
    resumed = False
    while done < n_steps:
        n = min(window, n_steps - done, (mid - done) if done < mid else window)
        t0 = time.time()
        out = None
        for i in range(n):
            state, out = step(state, t_vars, batches[(done + i) % len(batches)])
        loss = float(out["task_loss"])                  # hard sync
        dt = time.time() - t0
        done += n
        assert np.isfinite(loss), f"non-finite loss at step {done}: {loss}"
        eps = n * eps_per_step / dt
        windows.append(eps)
        print(f"[soak] step {done:4d}/{n_steps} {eps:6.2f} eps/s "
              f"loss={loss:.4f}", flush=True)

        if done == mid and not resumed:
            resumed = True
            # mid-soak: eval, checkpoint, restore into a FRESH state, continue
            acc = np.asarray(eval_step(state.variables, eval_batch))
            assert np.isfinite(acc).all()
            print(f"[soak] mid-train eval acc={float(acc.mean()):.3f}",
                  flush=True)
            mgr = CheckpointManager(ckpt_dir, max_to_keep=1)
            mgr.save(state, teacher_vars=t_vars)
            fresh, fresh_t = create_train_state(cfg, jax.random.key(1),
                                                batches[0])
            restored, t_restored = mgr.restore(fresh, fresh_t)
            k0 = jax.tree_util.tree_leaves(state.params)[0]
            r0 = jax.tree_util.tree_leaves(restored.params)[0]
            np.testing.assert_array_equal(np.asarray(k0), np.asarray(r0))
            assert int(restored.step) == int(state.step)
            state, t_vars = restored, t_restored
            print(f"[soak] checkpoint saved+restored at step {done}; "
                  f"continuing from the RESTORED state", flush=True)

    arr = np.asarray(windows)
    summary = {
        "ts": round(time.time(), 1), "mode": "soak",
        "preset": "student_fc2sup_dist", "steps": n_steps,
        "episodes": n_steps * eps_per_step,
        "episodes_per_step": eps_per_step, "micro_batch": micro,
        "eps_mean": round(float(arr.mean()), 3),
        "eps_min": round(float(arr.min()), 3),
        "eps_max": round(float(arr.max()), 3),
        "eps_std": round(float(arr.std()), 3),
        "windows": [round(float(x), 2) for x in arr],
        "mid_soak_resume": resumed,
    }
    history = (os.environ.get("BENCH_HISTORY_FILE")
               or os.path.join(ROOT, "BENCH_HISTORY.jsonl"))
    with open(history, "a") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
