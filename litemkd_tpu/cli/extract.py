"""Feature extraction entry point.

Two modes, covering the reference's dump tools:

- expert: per-modality per-video trunk features (reference
  ``extract_feature.py``):
    python -m litemkd_tpu.cli.extract --mode_extract expert \
        --rgb_path data/hmdb/l8/rgb_l8 --traintestlist ... --out out_tree \
        [-m ckpt_dir]
- mfm: fused multi-modal features (reference ``extract_multi_feature.py``) —
  writes the tree the student's ``teacher_path`` consumes:
    python -m litemkd_tpu.cli.extract --mode_extract mfm \
        --feature_root data/hmdb/feature --modalities rgb depth flow \
        --traintestlist ... --out out_tree -m mfm_ckpt_dir
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from .common import (enable_compilation_cache, add_common_args,
                     build_config, load_saved_config)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--mode_extract", choices=["expert", "mfm"], required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--feature_root", default=None)
    p.add_argument("--modalities", nargs="+", default=None)
    p.add_argument("--test_model_path", "-m", default=None,
                   help="checkpoint dir to load weights from (optional for "
                        "expert mode: random weights then)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--arch", default="resnet50",
                   choices=["resnet18", "resnet34", "resnet50"],
                   help="expert trunk for expert mode (reference "
                        "extract_feature.py --model); feature dim follows "
                        "the trunk (512/512/2048)")
    p.add_argument("--fusion", default="mfm",
                   help="fusion teacher kind for mfm mode: mfm | dga | dga2 | "
                        "two_road | a composer preset | otam:<preset>")
    p.add_argument("--trans_num", type=int, default=None,
                   help="fusion encoder depth of the checkpointed teacher")
    p.add_argument("--shirt_num", type=int, default=None)
    p.add_argument("--extract_side", choices=["support", "query"],
                   default="support",
                   help="which fusion path side-asymmetric composer presets "
                        "dump (the released classes never defined this; "
                        "side-symmetric teachers reject 'query')")
    args = p.parse_args(argv)
    enable_compilation_cache()
    cfg = build_config(args, base=load_saved_config(args.test_model_path))
    if args.mode_extract == "expert" and not cfg.data.rgb_path:
        p.error("expert extraction reads a frame tree: pass --rgb_path "
                "(the synthetic dataset has none)")
    if args.mode_extract == "mfm" and not args.feature_root:
        p.error("mfm extraction reads per-modality feature trees: pass "
                "--feature_root")
    m = cfg.model
    cfg = cfg.replace(model=m.__class__(**{
        **m.__dict__,
        "modalities": tuple(args.modalities) if args.modalities else m.modalities,
        "trans_num": args.trans_num if args.trans_num is not None else m.trans_num,
        "shirt_num": args.shirt_num if args.shirt_num is not None else m.shirt_num,
    }))

    if args.mode_extract == "expert":
        from ..data import VideoStore
        from ..models.backbones.classifier_net import ActionRecognitionNet
        from ..tools.extract import extract_expert_features
        vs = VideoStore(cfg.data.rgb_path, cfg.data.traintestlist,
                        cfg.data.split, cfg.episode.seq_len, cfg.episode.img_size)
        depth = {"resnet18": 18, "resnet34": 34, "resnet50": 50}[args.arch]
        net = ActionRecognitionNet(num_classes=2, depth=depth,
                                   compute_dtype=jnp.dtype(cfg.model.compute_dtype))
        rng = np.random.default_rng(0)
        sample = np.zeros((1, cfg.episode.seq_len, cfg.episode.img_size,
                           cfg.episode.img_size, 3), np.uint8)
        variables = net.init(jax.random.key(0), jnp.asarray(sample), train=False)
        if args.test_model_path and os.path.isfile(args.test_model_path):
            # a torch .pt: the reference's own pretrain (convnet.*) or expert
            # (resnet.*) artifact, or a raw torchvision zoo file — the dump
            # only needs the trunk (model.py:679-703)
            from ..tools.torch_import import load_pretrain_init
            from ..utils.tree import deep_merge_variables
            warm = load_pretrain_init(args.test_model_path, cfg, args.arch)
            variables = deep_merge_variables(variables, warm)
        elif args.test_model_path:
            from ..train.checkpoint import CheckpointManager
            import orbax.checkpoint as ocp
            mngr = CheckpointManager(args.test_model_path)
            restored = mngr.mngr.restore(mngr.latest_step(),
                                         args=ocp.args.StandardRestore())
            variables = {"params": restored["params"],
                         "batch_stats": restored["batch_stats"]}
        fn = jax.jit(lambda clips: net.apply(variables, clips, train=False,
                                             method=net.expert_features))
        n = extract_expert_features(cfg, vs, fn, args.out, vs.class_names,
                                    batch_size=args.batch_size)
        print(f"extracted {n} videos → {args.out}")
    else:
        from ..data.features import MultiModalFeatureStore
        from ..tools.extract import extract_mfm_features
        from ..train.teacher_steps import make_mfm
        paths = {m: os.path.join(args.feature_root, m)
                 for m in cfg.model.modalities}
        store = MultiModalFeatureStore(paths, cfg.data.traintestlist,
                                       cfg.data.split, cfg.episode.seq_len,
                                       cfg.model.trans_linear_in_dim)
        model = make_mfm(cfg, batched=False, kind=args.fusion)
        labels = jnp.zeros((cfg.episode.n_support,), jnp.int32)
        ctx = {m: jnp.zeros((cfg.episode.n_support, cfg.episode.seq_len,
                             cfg.model.trans_linear_in_dim))
               for m in cfg.model.modalities}
        tgt = {m: jnp.zeros((cfg.episode.n_queries(False), cfg.episode.seq_len,
                             cfg.model.trans_linear_in_dim))
               for m in cfg.model.modalities}
        if args.test_model_path and args.test_model_path.endswith((".pt",
                                                                   ".pth")):
            if args.fusion != "mfm":
                p.error("torch checkpoint import supports --fusion mfm only "
                        "(the reference trains ThreeTRXShiftLoopTime)")
            # reference-trained ThreeTRXShiftLoopTime → our fast extraction
            from ..tools.torch_import import load_mfm_checkpoint
            variables = load_mfm_checkpoint(args.test_model_path, cfg)
            print(f"imported torch MFM checkpoint {args.test_model_path}")
        elif args.test_model_path:
            from ..train.checkpoint import CheckpointManager
            import orbax.checkpoint as ocp
            mngr = CheckpointManager(args.test_model_path)
            restored = mngr.mngr.restore(mngr.latest_step(),
                                         args=ocp.args.StandardRestore())
            variables = {"params": restored["params"]}
        else:
            # fresh weights only when no checkpoint was supplied — an init
            # forward of the full teacher is wasted work otherwise
            variables = model.init(jax.random.key(0), ctx, labels, tgt, False)
        n = extract_mfm_features(cfg, store, variables, args.out,
                                 store.class_names, batch_size=args.batch_size,
                                 fusion_kind=args.fusion,
                                 side=int(args.extract_side == "query"))
        print(f"extracted {n} fused videos → {args.out}")


if __name__ == "__main__":
    main()
