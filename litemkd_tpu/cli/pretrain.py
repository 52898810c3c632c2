"""Supervised per-modality pretraining (reference ``pretrain/pretrain.py``):
epoch-based CE training of a resnet50 classifier over all videos of a split,
with the reference's dual SGD groups (trunk ``--lr_1``, head ``--lr_2``,
StepLR 10/0.1 stepped at epoch start) and its keep-the-best selection
(epoch-end test-split eval, checkpoint saved only on improvement).

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
    p.add_argument("--lr_1", type=float, default=0.000001,
                   help="trunk SGD learning rate (pretrain.py:31,84)")
    p.add_argument("--lr_2", type=float, default=0.01,
                   help="classifier-head SGD learning rate (pretrain.py:32,85)")
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
    if not cfg.data.rgb_path:
        p.error("pretraining reads a frame tree: pass --rgb_path "
                "(the synthetic dataset has none)")

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
    if args.learning_rate is not None:
        logger.info("warning: --learning_rate is unused by pretrain — the "
                    "reference trains dual SGD groups (pretrain.py:31-38); "
                    "set --lr_1 (trunk) / --lr_2 (head) instead")

    rng = np.random.default_rng(cfg.train.seed)
    sample = np.stack([vs.load(records[0][0], True, rng, frame_rule="aux")])
    init_vars = None
    if args.init_checkpoint:
        from ..tools.torch_import import load_pretrain_init
        init_vars = load_pretrain_init(args.init_checkpoint, cfg, args.arch)
        logger.info(f"warm-started {args.arch} trunk from "
                    f"{args.init_checkpoint}")
    bs = args.batch_size
    # drop-last batch count, the StepLR epoch length (len(range(0, n-bs+1, bs)))
    steps_per_epoch = max((len(records) - bs) // bs + 1, 1)
    state, model = create_pretrain_state(cfg, jax.random.key(cfg.train.seed),
                                         n_classes, jnp.asarray(sample),
                                         arch=args.arch,
                                         init_variables=init_vars,
                                         lr_groups=(args.lr_1, args.lr_2),
                                         steps_per_epoch=steps_per_epoch)
    step = jax.jit(make_pretrain_step(cfg, model), donate_argnums=0)
    fwd = jax.jit(lambda v, clips: model.apply(v, clips, train=False))
    ckpt = CheckpointManager(cfg.train.checkpoint_dir) \
        if cfg.train.checkpoint_dir else None
    if ckpt and cfg.train.resume_from_checkpoint:
        state, _ = ckpt.restore(state)   # pretrain.py:40-41 --resume
        logger.info(f"resumed from step {int(state.step)}")

    # the test split drives the reference's keep-the-best selection
    # (pretrain.py:142-170: epoch-end eval, save only on improvement)
    test_index = vs.split(False)
    test_records = [(r, r.class_id) for c in test_index.classes()
                    for r in test_index.videos_for_class(c)]
    best_acc = -1.0
    if not test_records:
        # the reference crashes here (its eval loop leaves `acc` unbound);
        # degrade to save-every-epoch so a crash/resume never silently
        # rewinds to epoch-0 weights
        logger.info("warning: test split is empty — keep-the-best selection "
                    "is inactive, saving every epoch instead")

    from ..data import Prefetcher
    for epoch in range(args.epochs):
        order = rng.permutation(len(records))
        starts = list(range(0, len(order) - bs + 1, bs))

        def produce(i):
            # decode/augment on the prefetch thread (the reference's
            # DataLoader workers, pretrain.py's dominant CPU cost); the
            # single producer keeps the rng draw order deterministic
            chunk = [records[j] for j in order[starts[i]:starts[i] + bs]]
            # frame_rule="aux": the reference pretrains through AuxDataset
            # (pretrain.py:27), whose frame selection is a plain linspace
            # with no train-time randomness; the flip/crop pixel transforms
            # stay train-mode
            clips = np.stack([vs.load(r, True, rng, frame_rule="aux")
                              for r, _ in chunk])
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

        # epoch-end eval on the test split; keep the best checkpoint only
        # (pretrain.py:142-170). Exact accuracy — the reference divides by
        # 8·n_batches even when the last batch is short (pretrain.py:162).
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        right = total = 0
        for s in range(0, len(test_records), bs):
            chunk = test_records[s:s + bs]
            loaded = [vs.load(r, False, rng, frame_rule="aux") for r, _ in chunk]
            # pad the ragged tail to the full batch shape: a second leading
            # shape would trace a second fwd executable (multi-minute remote
            # compile on this tunnel); padded rows are sliced off the preds
            loaded += [loaded[-1]] * (bs - len(chunk))
            labels = np.asarray([c for _, c in chunk], np.int32)
            clips = np.stack(loaded)
            pred = np.argmax(np.asarray(fwd(variables, jnp.asarray(clips))), -1)
            right += int((pred[:len(chunk)] == labels).sum())
            total += len(chunk)
        test_acc = right / max(total, 1)
        logger.log(epoch, {"epoch_loss": sums[0] / n_b,
                           "epoch_accuracy": sums[1] / n_b,
                           "test_accuracy": test_acc},
                   force_print=True)
        if test_acc > best_acc or not test_records:
            best_acc = test_acc
            if ckpt:
                ckpt.save(state)
                logger.info(f"epoch {epoch + 1} saved (test acc {test_acc:.4f})")
    return state


if __name__ == "__main__":
    main()
