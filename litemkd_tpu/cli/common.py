"""Shared CLI plumbing: flags in the spirit of the reference's ``options.py``
(same names where sensible), mapped onto the typed Config, plus the dataset
path table (``options.py:126-159``) and sampler construction.
"""
from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

from ..config import (Config, DataConfig, DistillConfig, EpisodeConfig,
                      MeshConfig, ModelConfig, TrainConfig, preset)


def machine_id() -> str:
    """Short hash of this host's CPU feature flags (see
    enable_compilation_cache); 'unknown' where /proc/cpuinfo is absent."""
    import hashlib
    import platform
    import socket
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    # no /proc/cpuinfo: fall back to a PER-HOST id — a shared constant here
    # would let two different-SIMD hosts share one XLA:CPU cache dir, which
    # is exactly the SIGILL this segment exists to prevent
    ident = f"{platform.platform()}|{platform.machine()}|{socket.gethostname()}"
    return "h" + hashlib.sha256(ident.encode()).hexdigest()[:9]


def enable_compilation_cache(path: Optional[str] = None,
                             min_compile_secs: float = 5.0) -> None:
    """Persistent XLA compilation cache — first compiles of the flagship step
    take minutes on remote-compile TPU setups; cached reruns are instant.
    Honors JAX_COMPILATION_CACHE_DIR if the user already set one. The test
    suite calls this with a lower ``min_compile_secs``: its many small CPU
    compiles individually sit under the CLI default.

    The default lives INSIDE the repo (``<repo>/.jax_cache/<machine-id>``,
    gitignored): a /tmp cache evaporates across reboots, which turns the
    next bench/CLI run into a multi-minute cold remote compile (this ate
    the round-3 driver bench budget). The machine-id segment (a hash of
    /proc/cpuinfo's feature flags) scopes the cache to hosts with identical
    SIMD features: XLA:CPU cache entries embed the compile host's features
    and SIGILL on a host that lacks them (observed live when reusing a
    cache seeded from another machine)."""
    import os as _os
    import jax
    if path is None:
        path = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__)))), ".jax_cache", machine_id())
    cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR", path)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--preset", default=None,
                   help="named preset (student_fc2sup_dist, student_plain, "
                        "mfm_teacher, student_mobilenet, expert_trx, "
                        "expert_strm, expert_baseline, expert_skeleton_trx, "
                        "tiny)")
    # episode geometry (options.py:12-25)
    p.add_argument("--way", type=int, default=None)
    p.add_argument("--shot", type=int, default=None)
    p.add_argument("--query_per_class", type=int, default=None)
    p.add_argument("--query_per_class_test", type=int, default=None)
    p.add_argument("--seq_len", type=int, default=None)
    p.add_argument("--img_size", type=int, default=None)
    # model selection (options.py:35-45)
    p.add_argument("--model_backbone", default=None)
    p.add_argument("--model_classifier", default=None)
    p.add_argument("--model_teacher", default=None)
    p.add_argument("--trans_linear_in_dim", type=int, default=None)
    p.add_argument("--trans_linear_out_dim", type=int, default=None)
    p.add_argument("--temp_set", nargs="+", type=int, default=None)
    p.add_argument("--trans_dropout", type=float, default=None)
    p.add_argument("--remat", action="store_true", default=None)
    p.add_argument("--pallas_tct", action="store_true", default=None,
                   help="fused Pallas TCT attention kernel (model.use_pallas)")
    p.add_argument("--pallas_bn", action="store_true", default=None,
                   help="Pallas-reduced BN training moments (XLA wins the A/B "
                        "on v5e; kept for experiments)")
    p.add_argument("--freeze_bn", action="store_true", default=None,
                   help="BN uses running stats during training (finetune "
                        "mode, ~15%% faster steps)")
    # distillation (options.py:40, 48-60)
    p.add_argument("--distill_name", default=None)
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--soft_loss_weight", type=float, default=None)
    p.add_argument("--hard_loss_weight", type=float, default=None)
    # data (options.py:28, 37, 126-159)
    p.add_argument("--dataset",
                   choices=["ssv2", "kinetics", "hmdb", "ucf", "synthetic"],
                   default=None)
    p.add_argument("--split", type=int, default=None)
    p.add_argument("--traintestlist", default=None)
    p.add_argument("--rgb_path", "--RGB_path", dest="rgb_path", default=None)
    p.add_argument("--teacher_path", default=None)
    p.add_argument("--num_workers", type=int, default=None)
    p.add_argument("--fixed_episode_file", default=None)
    p.add_argument("--synthetic_noise", type=float, default=None,
                   help="synthetic-dataset difficulty (noise scale around "
                        "the class prototypes; default 0.3)")
    # multi-camera datasets (reference run.py:142-146)
    p.add_argument("--cross_view", action="store_true", default=None,
                   help="support clips from a random camera view, queries "
                        "from --view")
    p.add_argument("--view", type=int, default=None,
                   help="query camera index into sorted(view_root) for "
                        "--cross_view")
    p.add_argument("--fixed_view", default=None,
                   help="pin every clip to one named camera view")
    p.add_argument("--view_root", default=None,
                   help="all_view_rgb_l8-style tree (default: sibling of "
                        "rgb_path)")
    # misc
    p.add_argument("--mode", default=None, help="experiment description tag")
    p.add_argument("--num_test_tasks", type=int, default=None)
    p.add_argument("--mesh_data", type=int, default=None)
    p.add_argument("--mesh_model", type=int, default=None)
    p.add_argument("--debug", action="store_true",
                   help="no checkpoints, no log files")
    p.add_argument("--wandb", action="store_true",
                   help="mirror metrics to wandb (reference trainwandb.py; "
                        "skipped with a notice if the package is missing)")


def add_train_args(p: argparse.ArgumentParser) -> None:
    # options.py:64-76
    p.add_argument("--checkpoint_dir", "-c", default=None)
    p.add_argument("--training_iterations", "-i", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", "-r", action="store_true")
    p.add_argument("--test_iters", nargs="+", type=int, default=None)
    p.add_argument("--learning_rate", "-lr", type=float, default=None)
    p.add_argument("--opt", choices=["adam", "sgd"], default=None)
    p.add_argument("--tasks_per_batch", type=int, default=None)
    p.add_argument("--micro_batch", type=int, default=None,
                   help="episodes per fused fwd/bwd chunk (grad accumulation)")
    p.add_argument("--save_freq", type=int, default=None)
    p.add_argument("--print_freq", type=int, default=None)
    p.add_argument("--sch", nargs="+", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--teacher_checkpoint", default=None,
                   help="teacher checkpoint (orbax dir or torch .pt)")
    p.add_argument("--watch", action="store_true", default=None,
                   help="log per-module gradient/parameter norms with the "
                        "step metrics (the wandb.watch analog, "
                        "trainwandb.py:52)")


def add_test_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--test_model_path", "-m", default=None)
    p.add_argument("--test_model", choices=["teacher", "student"],
                   default="student")
    p.add_argument("--per_task_log", default=None, metavar="PATH",
                   help="write one JSON line per task (accuracy, episode "
                        "classes, real-class labels/predictions) — the "
                        "reference's per-task analysis stream (test.py:232, "
                        "utils.py task_confusion)")


def dataset_paths(dataset: str, root: str = "data") -> dict:
    """The reference's per-dataset path table (options.py:126-159),
    normalized to <root>/<dataset>/{splits,l8/rgb_l8,feature/multi_feature}."""
    table = {
        "kinetics": dict(
            traintestlist=os.path.join(root, "kinetics/splits/kineticsTrainTestlist"),
            rgb_path=os.path.join(root, "kinetics/l8/rgb_l8"),
            teacher_path=os.path.join(root, "kinetics/feature/multi_feature")),
        "ucf": dict(
            traintestlist=os.path.join(root, "ucf101/splits/ucf_ARN"),
            rgb_path=os.path.join(root, "ucf101/l8/rgb_l8"),
            teacher_path=os.path.join(root, "ucf101/feature/multi_feature")),
        "hmdb": dict(
            traintestlist=os.path.join(root, "hmdb/splits/hmdb_ARN"),
            rgb_path=os.path.join(root, "hmdb/l8/rgb_l8"),
            teacher_path=os.path.join(root, "hmdb/feature/multi_feature")),
        "ssv2": dict(
            traintestlist=os.path.join(root, "ssv2/splits/somethingsomethingv2TrainTestlist"),
            rgb_path=os.path.join(root, "ssv2/l8/rgb_l8"),
            teacher_path=os.path.join(root, "ssv2/feature/multi_feature")),
        "synthetic": dict(traintestlist=None, rgb_path=None, teacher_path=None),
    }
    return table[dataset]


def load_saved_config(*candidates: Optional[str]) -> Optional[Config]:
    """The config ``save_run_config`` recorded next to a checkpoint, to use
    as the base for eval/export CLIs — a checkpoint then carries its own
    geometry (way/dims/backbone) instead of requiring every flag to be
    re-specified (reference analog: args.pkl, multi_fusion.py:369-371).
    Accepts checkpoint dirs or file paths (the containing dir is searched);
    returns None when no record exists (e.g. a reference .pt file)."""
    import dataclasses
    import json
    for p in candidates:
        if not p:
            continue
        d = p if os.path.isdir(p) else os.path.dirname(p)
        f = os.path.join(d, "config.json")
        if os.path.exists(f):
            with open(f) as fh:
                cfg = Config.from_dict(json.load(fh))
            # the record's checkpoint_dir names the ORIGINAL training run;
            # an eval/export CLI must never write (or refuse to start) there
            return cfg.replace(train=dataclasses.replace(
                cfg.train, checkpoint_dir=None,
                resume_from_checkpoint=False))
    return None


def build_config(args: argparse.Namespace,
                 base: Optional[Config] = None) -> Config:
    cfg = preset(args.preset) if args.preset else (base or Config())

    def pick(current, val):
        return current if val is None else val

    ep = cfg.episode
    cfg = cfg.replace(episode=EpisodeConfig(
        way=pick(ep.way, args.way), shot=pick(ep.shot, args.shot),
        query_per_class=pick(ep.query_per_class, args.query_per_class),
        query_per_class_test=pick(ep.query_per_class_test, args.query_per_class_test),
        seq_len=pick(ep.seq_len, args.seq_len),
        img_size=pick(ep.img_size, args.img_size)))

    # dict-splat keeps every ModelConfig field a flag doesn't touch (a listed
    # reconstruction silently reset fields added later, e.g. pallas_bn)
    m = cfg.model
    cfg = cfg.replace(model=ModelConfig(**{
        **m.__dict__,
        "backbone": pick(m.backbone, args.model_backbone),
        "classifier": pick(m.classifier, args.model_classifier),
        "teacher": pick(m.teacher, args.model_teacher),
        "trans_linear_in_dim": pick(m.trans_linear_in_dim,
                                    args.trans_linear_in_dim),
        "trans_linear_out_dim": pick(m.trans_linear_out_dim,
                                     args.trans_linear_out_dim),
        "temp_set": tuple(args.temp_set) if args.temp_set else m.temp_set,
        "trans_dropout": pick(m.trans_dropout, args.trans_dropout),
        "remat": pick(m.remat, args.remat),
        "use_pallas": pick(m.use_pallas, getattr(args, "pallas_tct", None)),
        "pallas_bn": pick(m.pallas_bn, getattr(args, "pallas_bn", None)),
        "freeze_bn": pick(m.freeze_bn, getattr(args, "freeze_bn", None)),
    }))

    d = cfg.distill
    cfg = cfg.replace(distill=DistillConfig(
        name=pick(d.name, args.distill_name),
        soft_loss_weight_support=d.soft_loss_weight_support,
        soft_loss_weight_query=d.soft_loss_weight_query,
        hard_loss_weight=pick(d.hard_loss_weight, args.hard_loss_weight),
        soft_loss_weight=pick(d.soft_loss_weight, args.soft_loss_weight),
        feature_loss_weight=d.feature_loss_weight,
        temperature=pick(d.temperature, args.temperature),
        fcwsl_aerfa=d.fcwsl_aerfa, fcwsl_beta=d.fcwsl_beta,
        sup_weight=d.sup_weight))

    dc = cfg.data
    dataset = pick(dc.dataset, args.dataset)
    paths = dataset_paths(dataset)
    cfg = cfg.replace(data=DataConfig(
        dataset=dataset,
        split=pick(dc.split, args.split),
        traintestlist=args.traintestlist or dc.traintestlist or paths["traintestlist"],
        rgb_path=args.rgb_path or dc.rgb_path or paths["rgb_path"],
        teacher_path=args.teacher_path or dc.teacher_path or paths["teacher_path"],
        num_workers=pick(dc.num_workers, args.num_workers),
        prefetch=dc.prefetch,
        fixed_episode_file=pick(dc.fixed_episode_file, args.fixed_episode_file),
        synthetic_noise=pick(dc.synthetic_noise, args.synthetic_noise),
        cross_view=pick(dc.cross_view, args.cross_view),
        query_view=pick(dc.query_view, args.view),
        fixed_view=pick(dc.fixed_view, args.fixed_view),
        view_root=pick(dc.view_root, args.view_root)))

    if args.mesh_data is not None or args.mesh_model is not None:
        cfg = cfg.replace(mesh=MeshConfig(
            data=args.mesh_data if args.mesh_data is not None else -1,
            model=args.mesh_model if args.mesh_model is not None else 1))

    if args.mode:
        cfg = cfg.replace(mode=args.mode)

    t = cfg.train
    if hasattr(args, "learning_rate"):
        # dict-splat like ModelConfig above: fields without flags survive
        cfg = cfg.replace(train=TrainConfig(**{
            **t.__dict__,
            "tasks_per_batch": pick(t.tasks_per_batch, args.tasks_per_batch),
            "micro_batch": pick(t.micro_batch, args.micro_batch),
            "training_iterations": pick(t.training_iterations,
                                        args.training_iterations),
            "learning_rate": pick(t.learning_rate, args.learning_rate),
            "optimizer": pick(t.optimizer, args.opt),
            "sch": tuple(args.sch) if args.sch else t.sch,
            "save_freq": pick(t.save_freq, args.save_freq),
            "print_freq": pick(t.print_freq, args.print_freq),
            "test_iters": (tuple(args.test_iters) if args.test_iters
                           else t.test_iters),
            "num_test_tasks": pick(t.num_test_tasks, args.num_test_tasks),
            "seed": pick(t.seed, args.seed),
            "checkpoint_dir": None if args.debug else pick(t.checkpoint_dir,
                                                           args.checkpoint_dir),
            "resume_from_checkpoint": bool(getattr(
                args, "resume_from_checkpoint", False)),
            "watch": pick(t.watch, getattr(args, "watch", None)),
        }))
    elif args.num_test_tasks is not None:
        cfg = cfg.replace(train=t.__class__(
            **{**t.__dict__, "num_test_tasks": args.num_test_tasks}))

    return cfg


def save_run_config(cfg: Config) -> None:
    """Write the full run config next to the checkpoints (reference:
    args.pkl, multi_fusion.py:369-371; json so it's greppable). A resume
    keeps the ORIGINAL run's record instead of clobbering it."""
    if not cfg.train.checkpoint_dir:
        return
    path = os.path.join(cfg.train.checkpoint_dir, "config.json")
    if cfg.train.resume_from_checkpoint and os.path.exists(path):
        return
    os.makedirs(cfg.train.checkpoint_dir, exist_ok=True)
    with open(path, "w") as f:
        f.write(cfg.to_json())


def episode_index(sampler, train: bool = False):
    """Resolve the Split index behind any sampler kind: video-backed
    (``videos``), feature-backed (``features``), multi-modal (``store``),
    or synthetic (which exposes a nominal ``split()`` of its own, keyed on
    (class, video-index) so fixed-episode specs replay exactly)."""
    store = (getattr(sampler, "videos", None)
             or getattr(sampler, "features", None)
             or getattr(sampler, "store", None))
    return (store if store is not None else sampler).split(train)


def build_sampler(cfg: Config, need_teacher: bool = True):
    """Construct the episode sampler for the configured dataset."""
    if cfg.data.dataset == "synthetic":
        from ..data import SyntheticEpisodeSource
        return SyntheticEpisodeSource(cfg, n_classes=16, seed=cfg.train.seed,
                                      noise=cfg.data.synthetic_noise,
                                      with_teacher_feats=need_teacher)
    from ..data import VideoStore, FeatureStore, EpisodeSampler
    video_store = None
    feature_store = None
    if cfg.data.rgb_path:
        view_root = cfg.data.view_root
        if view_root is None and (cfg.data.cross_view or cfg.data.fixed_view):
            # reference derivation: sibling of the modality tree
            # (video_reader.py:265 — dirname(path)/all_view_rgb_l8)
            view_root = os.path.join(os.path.dirname(
                cfg.data.rgb_path.rstrip("/")), "all_view_rgb_l8")
        video_store = VideoStore(cfg.data.rgb_path, cfg.data.traintestlist,
                                 cfg.data.split, cfg.episode.seq_len,
                                 cfg.episode.img_size, view_root=view_root)
    if need_teacher and cfg.data.teacher_path:
        feature_store = FeatureStore(cfg.data.teacher_path,
                                     cfg.data.traintestlist, cfg.data.split,
                                     cfg.episode.seq_len,
                                     cfg.model.trans_linear_in_dim)
    return EpisodeSampler(cfg, video_store, feature_store,
                          num_workers=cfg.data.num_workers)
