"""Student distillation training entry point.

CLI counterpart of the reference's ``trainwandb.py`` (via ``train_wandb.sh``):

    python -m litemkd_tpu.cli.train --dataset ucf --model_backbone resnet18_2fc \
        --model_classifier TRX_2fcsup --distill_name fc_2_sup_dist \
        --model_teacher test_teacher_TRX_2fcsup_fixed -c /path/ckpt

Synthetic smoke run:
    python -m litemkd_tpu.cli.train --preset tiny --dataset synthetic -c /tmp/ck
"""
from __future__ import annotations

import argparse
import json

from .common import enable_compilation_cache, add_common_args, add_train_args, build_config, build_sampler
from ..utils.logging import MetricsLogger


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    add_train_args(p)
    p.add_argument("--init_checkpoint", default=None,
                   help="warm-start student weights from a reference torch "
                        ".pt (a trainwandb.py checkpoint or an exported one)")
    args = p.parse_args(argv)
    enable_compilation_cache()
    cfg = build_config(args)

    from ..train import run_training, verify_checkpoint_dir

    if cfg.train.checkpoint_dir:
        verify_checkpoint_dir(cfg.train.checkpoint_dir,
                              cfg.train.resume_from_checkpoint)

    logger = MetricsLogger(
        log_dir=None if args.debug else (cfg.train.checkpoint_dir or "log"),
        run_name=cfg.mode, print_freq=cfg.train.print_freq,
        use_wandb=args.wandb)
    logger.info(f"config:\n{cfg.to_json()}")
    from .common import save_run_config
    save_run_config(cfg)

    sampler = build_sampler(cfg, need_teacher=True)

    teacher_vars = None
    if args.teacher_checkpoint:
        from ..tools.torch_import import load_teacher_checkpoint
        teacher_vars = load_teacher_checkpoint(args.teacher_checkpoint, cfg)
        logger.info(f"loaded teacher head from {args.teacher_checkpoint}")

    student_vars = None
    if args.init_checkpoint:
        from ..tools.torch_import import load_student_checkpoint
        student_vars = load_student_checkpoint(args.init_checkpoint, cfg)
        logger.info(f"warm-started student from {args.init_checkpoint}")

    state, t_vars, history = run_training(cfg, sampler, logger,
                                          teacher_vars_init=teacher_vars,
                                          student_vars_init=student_vars)
    if history:
        logger.info("eval history: " + json.dumps(history))
    return state


if __name__ == "__main__":
    main()
