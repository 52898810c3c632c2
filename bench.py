"""Benchmark: flagship distillation training throughput on one TPU chip.

Measures steady-state episodes/sec of the full Lite-MKD student training step
(resnet18_2fc backbone + TRX_2fcsup head + fc_2_sup_dist loss, 5-way 5-shot,
8×224×224 frames) over device-resident episode batches, and compares against
the PyTorch-CPU baseline in BASELINE_LOCAL.json (produced by
``tools/torch_cpu_baseline.py`` — the same computation written in torch, run
one episode at a time like the reference's training loop).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    from litemkd_tpu.cli.common import enable_compilation_cache
    enable_compilation_cache()
    from litemkd_tpu import preset
    from litemkd_tpu.data import SyntheticEpisodeSource, device_put_batch
    from litemkd_tpu.train import create_train_state, make_train_step

    episodes_per_step = int(os.environ.get("BENCH_EPISODES_PER_STEP", "16"))
    micro = int(os.environ.get("BENCH_MICRO_BATCH", "4"))
    n_steps = int(os.environ.get("BENCH_STEPS", "10"))
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    freeze_bn = os.environ.get("BENCH_FREEZE_BN", "0") == "1"
    pallas_bn = os.environ.get("BENCH_PALLAS_BN", "0") == "1"

    bench_preset = os.environ.get("BENCH_PRESET", "student_fc2sup_dist")
    cfg = preset(bench_preset)
    # dict-splat: only override the knobs, never reset preset fields
    cfg = cfg.replace(model=cfg.model.__class__(**{**cfg.model.__dict__,
                                                   "remat": remat,
                                                   "use_pallas": use_pallas,
                                                   "freeze_bn": freeze_bn,
                                                   "pallas_bn": pallas_bn}),
                      train=cfg.train.__class__(**{
                          **cfg.train.__dict__,
                          "tasks_per_batch": episodes_per_step,
                          "micro_batch": micro}))

    src = SyntheticEpisodeSource(cfg, n_classes=16, seed=0)
    rng = np.random.default_rng(0)
    host_batch = src.sample_batch(rng, episodes_per_step)
    batch = device_put_batch(host_batch)

    state, t_vars = create_train_state(cfg, jax.random.key(0), batch)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)

    # compile + warmup
    state, metrics = step(state, t_vars, batch)
    _ = float(metrics["task_loss"])

    # per-step host read = hard sync; the axon tunnel makes trailing
    # block_until_ready unreliable for timing
    t0 = time.time()
    for _ in range(n_steps):
        state, metrics = step(state, t_vars, batch)
        _ = float(metrics["task_loss"])
    dt = time.time() - t0
    eps = n_steps * episodes_per_step / dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_LOCAL.json")
    vs = None
    # the torch-CPU baseline is the flagship computation — the ratio is
    # meaningless for other presets
    if bench_preset == "student_fc2sup_dist" and os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f).get("torch_cpu_episodes_per_sec")
        if base:
            vs = eps / base

    print(json.dumps({
        "metric": "train_episodes_per_sec_per_chip",
        "value": round(eps, 3),
        "unit": (f"episodes/s ({cfg.episode.way}-way {cfg.episode.shot}-shot, "
                 f"{cfg.model.backbone}+{cfg.model.classifier}+"
                 f"{cfg.distill.name}, {cfg.episode.img_size}px)"),
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
