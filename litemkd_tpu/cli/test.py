"""Episodic evaluation entry point (reference ``test.py`` via ``test.sh``).

    python -m litemkd_tpu.cli.test --dataset ucf -m /path/ckpt            # student
    python -m litemkd_tpu.cli.test --test_model teacher --dataset ucf ... # teacher

Reports mean accuracy ×100 over num_test_tasks episodes with the 196·std/√n
confidence interval (reference test.py:271-285).
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from .common import (enable_compilation_cache, add_common_args,
                     add_test_args, build_config, build_sampler,
                     load_saved_config)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    add_test_args(p)
    args = p.parse_args(argv)
    enable_compilation_cache()
    cfg = build_config(args, base=load_saved_config(args.test_model_path))

    from ..data import load_fixed_episodes
    from ..train import (create_train_state, make_eval_step,
                         make_teacher_eval_step, run_eval, CheckpointManager)

    need_teacher = args.test_model == "teacher"
    sampler = build_sampler(cfg, need_teacher=need_teacher)

    # template state to restore into
    rng = np.random.default_rng(cfg.train.seed)
    sample = sampler.sample_batch(rng, 1, train=False)
    state, t_vars = create_train_state(cfg, jax.random.key(0), sample)
    if args.test_model_path and args.test_model_path.endswith((".pt", ".pth")):
        # a reference torch checkpoint: import it in place (trainwandb.py
        # users can evaluate their existing .pt files directly)
        if need_teacher:
            from ..tools.torch_import import load_teacher_checkpoint
            t_vars = load_teacher_checkpoint(args.test_model_path, cfg)
        else:
            from ..tools.torch_import import load_student_checkpoint
            from ..utils import deep_merge_variables
            v = load_student_checkpoint(args.test_model_path, cfg)
            # deep-merge over the template: a partial (backbone-only or raw
            # torchvision-trunk) checkpoint keeps the initialized subtrees
            state = state.replace(
                params=deep_merge_variables(state.params, v["params"]),
                batch_stats=deep_merge_variables(state.batch_stats,
                                                 v.get("batch_stats", {})))
        print(f"imported torch checkpoint {args.test_model_path}")
    elif args.test_model_path:
        ckpt = CheckpointManager(args.test_model_path)
        state, t_vars = ckpt.restore(state, t_vars)
        print(f"restored checkpoint @{int(state.episodes_seen)} episodes")

    specs = None
    if cfg.data.fixed_episode_file:
        path = cfg.data.fixed_episode_file

        def _reference_specs():
            # reference gen_fixed_split.py format (dict keyed by episode
            # index, global video_idx entries) — convert against our index
            from ..data import load_reference_fixed_episodes
            from .common import episode_index
            return load_reference_fixed_episodes(
                path, episode_index(sampler, train=False))

        if path.endswith((".yaml", ".yml")):
            specs = _reference_specs()
        else:
            try:
                specs = load_fixed_episodes(path)
            except (KeyError, TypeError, AttributeError):
                specs = _reference_specs()
        print(f"replaying {len(specs)} fixed episodes")

    with_preds = args.per_task_log is not None
    if need_teacher:
        eval_step = jax.jit(make_teacher_eval_step(cfg, with_preds=with_preds))
        variables = t_vars
    else:
        eval_step = jax.jit(make_eval_step(cfg, with_preds=with_preds))
        variables = state.variables

    mesh = None
    if cfg.mesh is not None and len(jax.devices()) > 1:
        from ..parallel import make_mesh
        m = make_mesh(cfg.mesh)
        if m.devices.size > 1:
            mesh = m
            print(f"eval sharded over mesh {dict(m.shape)}")

    task_log = None
    log_file = None
    if with_preds:
        import json
        log_file = open(args.per_task_log, "w")

        def task_log(record):
            log_file.write(json.dumps(record) + "\n")

    try:
        summary = run_eval(cfg, variables, sampler,
                           n_tasks=len(specs) if specs else cfg.train.num_test_tasks,
                           eval_step=eval_step, seed=cfg.train.seed, specs=specs,
                           mesh=mesh, task_log=task_log)
    finally:
        if log_file is not None:
            log_file.close()
    if with_preds:
        print(f"per-task records written to {args.per_task_log}")
    print(f"{cfg.data.dataset}: {summary['accuracy']:.2f} ± "
          f"{summary['confidence']:.2f} over {summary['n_tasks']} tasks")
    return summary


if __name__ == "__main__":
    main()
