"""MFM fusion-teacher training (reference ``multi_fusion.py`` with
``--model ThreeTRXShiftLoopTime``).

    python -m litemkd_tpu.cli.train_teacher --feature_root data/hmdb/feature \
        --modalities rgb depth flow --traintestlist data/hmdb/splits/hmdb_ARN \
        -c /path/ckpt -lr 5e-5

Synthetic smoke run:
    python -m litemkd_tpu.cli.train_teacher --preset tiny --dataset synthetic \
        -c /tmp/ck --training_iterations 8
"""
from __future__ import annotations

import argparse

import numpy as np
import jax

from .common import (enable_compilation_cache, add_common_args,
                     add_train_args, build_config, load_saved_config)
from ..utils.logging import MetricsLogger



class SyntheticMultiModalSource:
    """In-memory multi-modal feature episodes for smoke runs/tests."""

    def __init__(self, cfg, n_classes=16, seed=0, noise=0.3):
        # n_classes default matches build_sampler's SyntheticEpisodeSource so
        # gen_fixed_split-produced files (16-class index) replay here
        from ..data.synthetic import SyntheticEpisodeSource
        self.cfg = cfg
        self.sources = {m: SyntheticEpisodeSource(
            cfg, n_classes=n_classes, seed=seed + i, noise=noise,
            with_teacher_feats=True)
            for i, m in enumerate(cfg.model.modalities)}

    def split(self, train: bool = False):
        """Nominal index for fixed-episode generation/replay — modalities
        share episode geometry, so any one source's index serves."""
        return next(iter(self.sources.values())).split(train)

    def sample_batch(self, rng, n_episodes, train=True, specs=None):
        from ..train.steps import EpisodeBatch
        # correlated class structure across modalities: reuse one sampler's
        # episode geometry, draw features per modality from shared protos.
        # specs are forwarded so --fixed_episode_file replays the SAME
        # episodes (per-modality content is deterministic per class/video)
        seed = int(rng.integers(0, 2 ** 31))
        batches = {m: s.sample_batch(np.random.default_rng(seed), n_episodes,
                                     train=train, specs=specs)
                   for m, s in self.sources.items()}
        first = next(iter(batches.values()))
        return EpisodeBatch(
            support_clips={m: b.support_feats for m, b in batches.items()},
            support_labels=first.support_labels,
            query_clips={m: b.query_feats for m, b in batches.items()},
            query_labels=first.query_labels,
        )


def build_mm_sampler(cfg, args):
    if cfg.data.dataset == "synthetic":
        return SyntheticMultiModalSource(cfg, seed=cfg.train.seed)
    import os
    from ..data.features import MultiModalFeatureStore
    from ..data.multimodal import MultiModalEpisodeSampler
    paths = {m: os.path.join(args.feature_root, m)
             for m in cfg.model.modalities}
    store = MultiModalFeatureStore(paths, cfg.data.traintestlist,
                                   cfg.data.split, cfg.episode.seq_len,
                                   cfg.model.trans_linear_in_dim)
    return MultiModalEpisodeSampler(cfg, store)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    add_train_args(p)
    p.add_argument("--feature_root", default=None,
                   help="dir containing per-modality feature trees "
                        "(<root>/<modality>/<class>/<video>/feature.npy)")
    p.add_argument("--modalities", nargs="+", default=None,
                   help="modality names, m1 first (default rgb depth flow)")
    p.add_argument("--trans_num", type=int, default=None)
    p.add_argument("--shirt_num", type=int, default=None)
    p.add_argument("--fusion", default="mfm",
                   help="mfm (ThreeTRXShiftLoopTime, bug-faithful) | tsf (score "
                        "fusion) | dga/dga2 (AdaIN) | two_road (ThreeFusionTwoRoad) "
                        "| a composer preset name (TwoTRXShuffleTime, TwoCross, "
                        "ThreeCross, TwoCombinationTRX, ThreeFusion3, "
                        "FourShiftFusion, ..., or any *_faithful variant) | "
                        "otam:<preset> for an OTAM head")
    p.add_argument("--score_weights", "-a", nargs="+", type=float, default=None,
                   help="TSF per-modality logit weights (reference --a/--b/--c)")
    p.add_argument("--branch_ckpt", action="append", default=None,
                   metavar="MODALITY=CKPT_DIR",
                   help="graft a separately-trained expert's episodic head "
                        "into a TSF branch (reference score_fusion_run.py "
                        "--rgb/skeleton/flow_test_model_path); repeatable")
    p.add_argument("--test_only", action="store_true",
                   help="evaluate a trained fusion teacher and exit "
                        "(reference multi_fusion.py --test_model_only / "
                        "test_only.py; honors --fixed_episode_file)")
    p.add_argument("--test_model_path", "-m", default=None,
                   help="checkpoint to evaluate with --test_only: orbax dir "
                        "or reference ThreeTRXShiftLoopTime .pt")
    args = p.parse_args(argv)
    enable_compilation_cache()
    cfg = build_config(args, base=load_saved_config(args.test_model_path))
    m = cfg.model
    cfg = cfg.replace(model=m.__class__(**{
        **m.__dict__,
        "trans_num": args.trans_num if args.trans_num is not None else m.trans_num,
        "shirt_num": args.shirt_num if args.shirt_num is not None else m.shirt_num,
        "modalities": tuple(args.modalities) if args.modalities else m.modalities,
    }))

    # usage errors must fire before any side effects (wandb run, log dirs,
    # config.json writes)
    if cfg.data.dataset != "synthetic" and not args.feature_root:
        p.error("teacher training reads per-modality feature trees: pass "
                "--feature_root (or --dataset synthetic for a smoke run)")

    from ..train.checkpoint import CheckpointManager, verify_checkpoint_dir
    from ..train.teacher_steps import (create_mfm_train_state,
                                       make_mfm_eval_step, make_mfm_train_step)

    if cfg.train.checkpoint_dir:
        verify_checkpoint_dir(cfg.train.checkpoint_dir,
                              cfg.train.resume_from_checkpoint)
    logger = MetricsLogger(log_dir=None if args.debug else
                           (cfg.train.checkpoint_dir or "log"),
                           run_name=args.fusion, print_freq=cfg.train.print_freq,
                           use_wandb=args.wandb)
    logger.info(f"config:\n{cfg.to_json()}")
    from .common import save_run_config
    save_run_config(cfg)

    sampler = build_mm_sampler(cfg, args)
    rng = np.random.default_rng(cfg.train.seed)
    e = cfg.train.tasks_per_batch
    # init only needs shapes — one episode, and the state slices to [:1] anyway
    first = sampler.sample_batch(rng, 1, train=True)
    state = create_mfm_train_state(cfg, jax.random.key(cfg.train.seed), first,
                                   kind=args.fusion,
                                   score_weights=args.score_weights)
    if args.branch_ckpt:
        from ..train.teacher_steps import load_tsf_branches
        bad = [s for s in args.branch_ckpt if "=" not in s]
        if bad:
            p.error(f"--branch_ckpt expects MODALITY=CKPT_DIR, got {bad}")
        pairs = dict(s.split("=", 1) for s in args.branch_ckpt)
        state = state.replace(params=load_tsf_branches(
            state.params, pairs, temp_set=cfg.model.temp_set))
        logger.info(f"grafted TSF branches from {sorted(pairs)}")

    if args.test_model_path:
        if args.test_model_path.endswith((".pt", ".pth")):
            # any reference --model <ClassName> artifact loads for the
            # matching --fusion kind (multi_fusion.py:116-120 selects classes
            # by bare name; load_composed_checkpoint holds one weight map per
            # kind, golden-tested vs the executing classes)
            from ..tools.torch_import import load_composed_checkpoint
            state = state.replace(
                params=load_composed_checkpoint(args.test_model_path, cfg,
                                                args.fusion)["params"])
            logger.info(f"imported torch {args.fusion} teacher "
                        f"{args.test_model_path}")
        else:
            state, _ = CheckpointManager(args.test_model_path).restore(state)
            logger.info(f"restored {args.test_model_path} "
                        f"@{int(state.episodes_seen)} episodes")

    if args.test_only:
        # standalone evaluation (reference multi_fusion.py --test_model_only
        # / test_only.py:358-374), honoring fixed-episode replay
        eval_step = jax.jit(make_mfm_eval_step(
            cfg, kind=args.fusion, score_weights=args.score_weights))
        specs = None
        if cfg.data.fixed_episode_file:
            from ..data import (load_fixed_episodes,
                                load_reference_fixed_episodes)
            from .common import episode_index
            path = cfg.data.fixed_episode_file
            if path.endswith((".yaml", ".yml")):
                specs = load_reference_fixed_episodes(
                    path, episode_index(sampler, train=False))
            else:
                try:
                    specs = load_fixed_episodes(path)
                except (KeyError, TypeError, AttributeError):
                    specs = load_reference_fixed_episodes(
                        path, episode_index(sampler, train=False))
            logger.info(f"replaying {len(specs)} fixed episodes")
        # run_eval brings the student loop's prefetch overlap and mesh
        # handling instead of a hand-rolled synchronous chunk loop
        from ..train.loop import run_eval
        s = run_eval(cfg, {"params": state.params}, sampler,
                     n_tasks=len(specs) if specs else cfg.train.num_test_tasks,
                     eval_step=eval_step, seed=cfg.train.seed, specs=specs)
        print(f"{cfg.data.dataset}: {s['accuracy']:.2f} ± "
              f"{s['confidence']:.2f} over {s['n_tasks']} tasks")
        return s

    ckpt = CheckpointManager(cfg.train.checkpoint_dir) \
        if cfg.train.checkpoint_dir else None
    if ckpt and cfg.train.resume_from_checkpoint and ckpt.latest_step() is not None:
        state, _ = ckpt.restore(state)
        logger.info(f"resumed at {int(state.episodes_seen)} episodes")

    # multi-device: episode batches shard over 'data', encoder/TCT
    # projections over 'model' (same rules as the student loop)
    mesh = None
    if cfg.mesh is not None and len(jax.devices()) > 1:
        from ..parallel import make_mesh, shard_variables, shard_batch
        m = make_mesh(cfg.mesh)
        if m.devices.size > 1 and e % m.shape["data"] == 0:
            mesh = m
            state = state.replace(params=shard_variables(state.params, mesh),
                                  opt_state=shard_variables(state.opt_state,
                                                            mesh))
            logger.info(f"sharding over mesh {dict(m.shape)}")
        elif m.devices.size > 1:
            if jax.process_count() > 1:
                raise ValueError(
                    f"multi-process run needs the sharded path: "
                    f"tasks_per_batch={e} does not divide the mesh data "
                    f"axis {m.shape['data']}")
            logger.info(f"mesh {dict(m.shape)} available but tasks_per_batch="
                        f"{e} does not divide the data axis — running "
                        "unsharded")

    step = jax.jit(make_mfm_train_step(cfg, kind=args.fusion,
                                       score_weights=args.score_weights),
                   donate_argnums=0)
    eval_step = jax.jit(make_mfm_eval_step(cfg, kind=args.fusion,
                                           score_weights=args.score_weights))
    n_steps = max(1, cfg.train.training_iterations // e)
    test_marks = sorted(mk for mk in cfg.train.test_iters
                        if mk > int(state.episodes_seen))
    save_every = max(1, cfg.train.save_freq // e)

    # mirrors train/loop.py's hot loop: episode assembly on a prefetch
    # thread (feature-tree loads were previously serialized with the step),
    # host-deterministic step/episode counters (teacher_steps.py:123-124:
    # step += 1, episodes_seen += batch episodes per update), and metric
    # host reads deferred one step so the next dispatch is already enqueued
    # while the previous step syncs
    from ..data import DeferredHostSync, Prefetcher
    start = int(state.step)
    step_i, episodes = start, int(state.episodes_seen)
    produce = lambda i: sampler.sample_batch(
        # step-keyed stream: a resumed run continues the data sequence
        # instead of replaying batches 0..k
        np.random.default_rng((cfg.train.seed, start + i)), e, train=True)
    transfer = (lambda b: shard_batch(b, mesh)) if mesh is not None else None
    deferred = DeferredHostSync(lambda s, m: logger.log(
        s, {k: float(v) for k, v in jax.device_get(m).items()}))

    for batch in Prefetcher(produce, n_batches=n_steps - start, depth=1,
                            transfer=transfer):
        if mesh is not None:
            with jax.set_mesh(mesh):
                state, metrics = step(state, batch)
        else:
            state, metrics = step(state, batch)
        step_i += 1
        episodes += e
        deferred.push(step_i, metrics)
        if ckpt and step_i % save_every == 0:
            deferred.flush()
            ckpt.save(state)
        while test_marks and episodes >= test_marks[0]:
            test_marks.pop(0)
            deferred.flush()
            from ..train.loop import run_eval
            s = run_eval(cfg, {"params": state.params}, sampler,
                         eval_step=eval_step, mesh=mesh)
            logger.info(f"eval @{episodes}: {s['accuracy']:.2f} ± "
                        f"{s['confidence']:.2f} ({s['n_tasks']} tasks)")
    deferred.flush()
    assert int(state.step) == step_i, \
        "host step counter drifted from the device TrainState"
    if ckpt:
        ckpt.save(state)
    return state


if __name__ == "__main__":
    main()
