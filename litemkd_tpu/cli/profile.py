"""On-device profiler: capture an XProf trace of one training step and print
an op-time summary (the runtime-tracing counterpart of cli.flops; SURVEY.md
§5.1 — the reference has no tracer at all).

    python -m litemkd_tpu.cli.profile --preset student_fc2sup_dist \
        --out /tmp/jaxtrace [--steps 1]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re

import numpy as np
import jax

from .common import enable_compilation_cache, add_common_args, build_config
from ..utils.tracing import trace


def summarize(trace_dir: str, top: int = 15) -> None:
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        print("no trace files found")
        return
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    buckets: collections.Counter = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        n = e.get("name", "?")
        # skip host-side frames and module/step-level spans (inclusive of the
        # HLO ops below them: jit_<fn>(...) and bare step numbers)
        if n.startswith(("jit_", "while", "$", "np.asarray")) or n.isdigit():
            continue
        buckets[re.sub(r"[.\d]+$", "", n)] += e["dur"]
    total = sum(buckets.values())
    print(f"device op time: {total / 1e3:.1f} ms")
    for k, d in buckets.most_common(top):
        print(f"{d / 1e3:9.1f} ms {100 * d / total:5.1f}%  {k}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--out", default="/tmp/jaxtrace")
    p.add_argument("--steps", type=int, default=1)
    p.add_argument("--tasks_per_batch", type=int, default=16)
    p.add_argument("--micro_batch", type=int, default=4)
    p.add_argument("--path", choices=("train", "eval", "teacher", "pretrain"),
                   default="train",
                   help="which hot path to trace: the student distillation "
                        "train step, the episodic eval forward, the MFM "
                        "fusion-teacher train step, or the supervised "
                        "pretraining step (--mode is taken by the "
                        "reference's experiment tag; the per-modality "
                        "EXPERT step is --path train --preset expert_trx — "
                        "it is the student pipeline without a teacher)")
    p.add_argument("--batch_size", type=int, default=8,
                   help="pretrain path only: clips per step "
                        "(pretrain.py's DataLoader batch)")
    args = p.parse_args(argv)
    enable_compilation_cache()
    cfg = build_config(args)
    cfg = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "tasks_per_batch": args.tasks_per_batch,
           "micro_batch": args.micro_batch}))

    from ..data import SyntheticEpisodeSource, device_put_batch

    if args.path == "teacher":
        from .train_teacher import SyntheticMultiModalSource
        from ..train import create_mfm_train_state, make_mfm_train_step

        src = SyntheticMultiModalSource(cfg, n_classes=16, seed=0)
        batch = device_put_batch(src.sample_batch(
            np.random.default_rng(0), cfg.train.tasks_per_batch))
        state = create_mfm_train_state(cfg, jax.random.key(0), batch)
        step = jax.jit(make_mfm_train_step(cfg), donate_argnums=0)

        def run_once():
            nonlocal state
            state, m = step(state, batch)
            _ = float(m["task_loss"])
    elif args.path == "pretrain":
        import jax.numpy as jnp
        from ..train.teacher_steps import (create_pretrain_state,
                                           make_pretrain_step)

        t, img = cfg.episode.seq_len, cfg.episode.img_size
        state, model = create_pretrain_state(
            cfg, jax.random.key(0), 64,
            jnp.zeros((1, t, img, img, 3), jnp.uint8),
            arch="resnet50", lr_groups=(1e-6, 1e-2), steps_per_epoch=1000)
        clips = jax.device_put(np.random.default_rng(0).integers(
            0, 256, (args.batch_size, t, img, img, 3), dtype=np.uint8))
        labels = jax.device_put(
            (np.arange(args.batch_size) % 64).astype(np.int32))
        pre_step = jax.jit(make_pretrain_step(cfg, model), donate_argnums=0)

        def run_once():
            nonlocal state
            state, m = pre_step(state, clips, labels)
            _ = float(m["loss"])
    elif args.path == "eval":
        from ..train import create_train_state, make_eval_step

        src = SyntheticEpisodeSource(cfg, n_classes=16, seed=0)
        batch = device_put_batch(src.sample_batch(
            np.random.default_rng(0), cfg.train.tasks_per_batch, train=False))
        st, _ = create_train_state(cfg, jax.random.key(0), batch)
        variables = st.variables
        eval_step = jax.jit(make_eval_step(cfg))

        def run_once():
            _ = np.asarray(eval_step(variables, batch)).sum()
    else:
        from ..train import create_train_state, make_train_step

        src = SyntheticEpisodeSource(cfg, n_classes=16, seed=0)
        batch = device_put_batch(src.sample_batch(
            np.random.default_rng(0), cfg.train.tasks_per_batch))
        state, t_vars = create_train_state(cfg, jax.random.key(0), batch)
        step = jax.jit(make_train_step(cfg), donate_argnums=0)

        def run_once():
            nonlocal state
            state, m = step(state, t_vars, batch)
            _ = float(m["task_loss"])

    run_once()  # compile + warmup
    with trace(args.out):
        for _ in range(args.steps):
            run_once()
    summarize(args.out)


if __name__ == "__main__":
    main()
