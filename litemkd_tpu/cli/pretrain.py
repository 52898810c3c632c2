"""Supervised per-modality pretraining (reference ``pretrain/pretrain.py``):
epoch-based CE training of a resnet50 classifier over all videos of a split.

    python -m litemkd_tpu.cli.pretrain --rgb_path data/kinetics/l8/rgb_l8 \
        --traintestlist data/kinetics/splits/... -c /path/ckpt --epochs 50
"""
from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from .common import enable_compilation_cache, add_common_args, add_train_args, build_config
from ..utils.logging import MetricsLogger


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    add_train_args(p)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--arch", default="resnet50",
                   help="resnet18|resnet34|resnet50 (Action_Recognition_"
                        "Resnet50) or deit_small (model_distillation ViT)")
    p.add_argument("--init_checkpoint", default=None,
                   help="warm-start trunk from a torch checkpoint: a raw "
                        "torchvision resnet zoo file, a timm "
                        "deit_small_distilled_patch16_224 zoo file, or a "
                        "saved model_distillation (the reference's "
                        "pretrained=True path, model.py:2146)")
    args = p.parse_args(argv)
    enable_compilation_cache()
    cfg = build_config(args)

    from ..data import VideoStore
    from ..train.checkpoint import CheckpointManager
    from ..train.teacher_steps import create_pretrain_state, make_pretrain_step

    vs = VideoStore(cfg.data.rgb_path, cfg.data.traintestlist, cfg.data.split,
                    cfg.episode.seq_len, cfg.episode.img_size)
    index = vs.split(True)
    records = [(r, r.class_id) for c in index.classes()
               for r in index.videos_for_class(c)]
    n_classes = len(index.classes())
    logger = MetricsLogger(log_dir=None if args.debug else cfg.train.checkpoint_dir,
                           run_name="pretrain", print_freq=cfg.train.print_freq,
                           use_wandb=args.wandb)
    logger.info(f"{len(records)} train videos over {n_classes} classes")

    rng = np.random.default_rng(cfg.train.seed)
    sample = np.stack([vs.load(records[0][0], True, rng)])
    init_vars = None
    if args.init_checkpoint:
        from ..tools.torch_import import load_pretrain_init
        init_vars = load_pretrain_init(args.init_checkpoint, cfg, args.arch)
        logger.info(f"warm-started {args.arch} trunk from "
                    f"{args.init_checkpoint}")
    state, model = create_pretrain_state(cfg, jax.random.key(cfg.train.seed),
                                         n_classes, jnp.asarray(sample),
                                         arch=args.arch,
                                         init_variables=init_vars)
    step = jax.jit(make_pretrain_step(cfg, model), donate_argnums=0)
    ckpt = CheckpointManager(cfg.train.checkpoint_dir) \
        if cfg.train.checkpoint_dir else None

    from ..data import Prefetcher
    bs = args.batch_size
    for epoch in range(args.epochs):
        order = rng.permutation(len(records))
        starts = list(range(0, len(order) - bs + 1, bs))

        def produce(i):
            # decode/augment on the prefetch thread (the reference's
            # DataLoader workers, pretrain.py's dominant CPU cost); the
            # single producer keeps the rng draw order deterministic
            chunk = [records[j] for j in order[starts[i]:starts[i] + bs]]
            clips = np.stack([vs.load(r, True, rng) for r, _ in chunk])
            labels = np.asarray([c for _, c in chunk], np.int32)
            return clips, labels

        transfer = lambda t: (jnp.asarray(t[0]), jnp.asarray(t[1]))
        # per-batch float() reads would serialize the dispatch round trip
        # with device compute; absorbing in bounded windows keeps the
        # overlap with O(window) live metric buffers and bounds how far
        # dispatch can run ahead of execution (each in-flight step pins
        # its clips batch)
        window, buf, sums = 16, [], [0.0, 0.0, 0]

        def drain():
            for m in jax.device_get(buf):
                sums[0] += float(m["loss"])
                sums[1] += float(m["accuracy"])
                sums[2] += 1
            buf.clear()

        for clips, labels in Prefetcher(produce, n_batches=len(starts),
                                        transfer=transfer):
            state, metrics = step(state, clips, labels)
            buf.append(metrics)
            if len(buf) >= window:
                drain()
        drain()
        n_b = max(sums[2], 1)
        logger.log(epoch, {"epoch_loss": sums[0] / n_b,
                           "epoch_accuracy": sums[1] / n_b},
                   force_print=True)
        if ckpt:
            ckpt.save(state)
    return state


if __name__ == "__main__":
    main()
