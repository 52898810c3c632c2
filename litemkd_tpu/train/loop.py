"""Training and evaluation drivers.

The structural equivalent of ``trainwandb.py:111-188`` (train loop with
periodic eval + checkpointing) and ``test.py:65-285`` (episodic eval with CI),
re-shaped for episode batches: the loop consumes prefetched device-resident
batches; iteration counts are in *episodes* so reference configs (test_iters,
save_freq, sch) carry over unchanged.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np
import jax

from ..config import Config
from ..data.prefetch import DeferredHostSync, Prefetcher, device_put_batch
from ..utils.logging import MetricsLogger
from ..utils.metrics import TestAccuracies
from .checkpoint import CheckpointManager
from .steps import (EpisodeBatch, create_train_state, make_eval_step,
                    make_train_step)


def run_eval(cfg: Config, variables, sampler, *, n_tasks: Optional[int] = None,
             batch_size: int = 8, seed: int = 0,
             eval_step: Optional[Callable] = None,
             specs=None, prefetch_depth: int = 1, mesh=None,
             task_log: Optional[Callable] = None) -> dict:
    """Episodic evaluation: mean accuracy ×100 with the 196·std/√n CI.

    Episode assembly and host→device transfer overlap the forward pass
    (same Prefetcher as training); chunks are fixed-size with at most one
    remainder chunk, so at most two shapes compile. Defaults stay small
    (8-episode chunks, one staged ahead) because mid-training eval shares
    HBM with the live train state and the training prefetcher's batches.

    With a multi-device ``mesh``, parameters replicate/shard per the mesh
    rules and each full chunk shards its episode axis over 'data' (the
    reference's 10k-episode protocol then scales ~linearly with chips); a
    remainder chunk that doesn't divide the data axis runs replicated.

    ``task_log``: callable invoked once per episode with a record dict
    ``{task, accuracy, classes, real_labels, real_preds}`` — the reference's
    per-task analysis stream (``test.py:232`` accuracy line + the
    ``task_confusion`` real-class prediction mapping, ``utils.py:123-127``).
    Requires an ``eval_step`` built with ``with_preds=True`` (the default
    step is upgraded automatically)."""
    n_tasks = n_tasks or cfg.train.num_test_tasks
    eval_step = eval_step or jax.jit(make_eval_step(cfg,
                                                    with_preds=task_log is not None))
    rng = np.random.default_rng(seed)
    use_mesh = mesh is not None and mesh.devices.size > 1
    multiproc = use_mesh and jax.process_count() > 1
    if multiproc:
        # multi-host: every chunk must divide the data axis (a replicated
        # remainder would live on process-local devices only and cannot feed
        # a step whose params span the global mesh) — round the protocol
        # size to full chunks, loudly
        data_ax = mesh.shape["data"]
        batch_size = max(batch_size // data_ax, 1) * data_ax
        if n_tasks % batch_size:
            rounded = max(batch_size, n_tasks - n_tasks % batch_size)
            print(f"[eval] multi-host: rounding n_tasks {n_tasks} → {rounded} "
                  f"(chunks of {batch_size} over data axis {data_ax})")
            n_tasks = rounded
    sizes = [batch_size] * (n_tasks // batch_size)
    if n_tasks % batch_size:
        sizes.append(n_tasks % batch_size)
    offsets = [sum(sizes[:i]) for i in range(len(sizes))]

    transfer = None
    if use_mesh:
        from ..parallel import shard_variables, batch_sharding
        variables = shard_variables(variables, mesh)
        data_ax = mesh.shape["data"]
        bs_sharding = batch_sharding(mesh)

        def transfer(b):
            # shard full chunks during the prefetch-thread transfer;
            # remainder chunks that don't divide the data axis replicate
            if b.support_labels.shape[0] % data_ax == 0:
                return device_put_batch(b, bs_sharding)
            return device_put_batch(b)

    metas: dict = {}

    def produce(i):
        e, off = sizes[i], offsets[i]
        batch_specs = None if specs is None else specs[off:off + e]
        kw = {"specs": batch_specs} if batch_specs is not None else {}
        if task_log is None:
            return sampler.sample_batch(rng, e, train=False, **kw)
        batch, meta = sampler.sample_batch(rng, e, train=False,
                                           return_meta=True, **kw)
        metas[i] = meta
        return batch

    acc = TestAccuracies()

    def absorb(i, accs, preds):
        # host-side conversion of a PREVIOUS chunk's device results: deferred
        # one chunk (DeferredHostSync) so the next dispatch is already
        # enqueued while this one syncs — otherwise the per-chunk np.asarray
        # serializes the dispatch round trip with device compute (measured
        # ~19% of eval wall time on a remote-dispatch host)
        if multiproc:
            # the (E,) accuracies are data-sharded across processes;
            # np.asarray on a non-addressable array raises — allgather the
            # global value to every host first (every process defers by the
            # same one chunk, so collective order is identical)
            from jax.experimental import multihost_utils
            accs = multihost_utils.process_allgather(accs)
            if preds is not None:
                preds = multihost_utils.process_allgather(preds)
        accs = np.asarray(accs)
        acc.extend(accs)
        if task_log is not None:
            meta = metas.pop(i)
            from ..utils.metrics import real_class_preds
            real_preds = np.asarray(real_class_preds(np.asarray(preds),
                                                     meta.classes))
            for e in range(accs.shape[0]):
                task_log({
                    "task": offsets[i] + e,
                    "accuracy": float(accs[e]),
                    "classes": meta.classes[e].tolist(),
                    "real_labels": meta.real_query_labels[e].tolist(),
                    "real_preds": real_preds[e].tolist(),
                })

    deferred = DeferredHostSync(absorb)
    for i, batch in enumerate(Prefetcher(produce, n_batches=len(sizes),
                                         depth=prefetch_depth,
                                         transfer=transfer)):
        if use_mesh:
            with jax.set_mesh(mesh):
                out = eval_step(variables, batch)
        else:
            out = eval_step(variables, batch)
        accs, preds = out if task_log is not None else (out, None)
        deferred.push(i, accs, preds)
    deferred.flush()
    return acc.summary()


def run_training(cfg: Config, sampler, logger: Optional[MetricsLogger] = None,
                 teacher_vars_init: Optional[Any] = None,
                 eval_sampler=None, prefetch_depth: int = 1,
                 student_vars_init: Optional[dict] = None):
    """Full student training. ``sampler.sample_batch(rng, n, train)`` must
    yield EpisodeBatches; returns (final_state, teacher_vars, eval_history).
    ``student_vars_init`` warm-starts the student from imported weights
    (e.g. a reference torch checkpoint or pretrained trunks).

    ``prefetch_depth`` defaults to 1: with the deferred metric flush the
    device already holds the executing batch PLUS the next dispatched one,
    so one staged batch keeps the old 3×(~0.9 GB flagship batch) HBM peak
    while still hiding episode assembly behind the step."""
    logger = logger or MetricsLogger(print_freq=cfg.train.print_freq)
    eval_sampler = eval_sampler or sampler
    e_per_step = cfg.train.tasks_per_batch
    n_steps = max(1, cfg.train.training_iterations // e_per_step)

    rng = np.random.default_rng(cfg.train.seed)
    # init only needs shapes: one episode, not a full (possibly ~GB) batch —
    # create_train_state slices to [:1] anyway and this batch is never trained
    # on. episodes_per_step is passed so the LR schedule still counts real
    # batch sizes.
    first = sampler.sample_batch(rng, 1, train=True)
    state, t_vars = create_train_state(cfg, jax.random.key(cfg.train.seed),
                                       device_put_batch(first),
                                       episodes_per_step=e_per_step)
    if teacher_vars_init is not None:
        t_vars = teacher_vars_init
    if student_vars_init is not None:
        # deep-merge over the freshly-initialized template: a PARTIAL import
        # (backbone-only reference checkpoint, or a raw torchvision zoo trunk
        # with no fc heads) keeps every template subtree it doesn't mention
        from ..utils import deep_merge_variables
        state = state.replace(
            params=deep_merge_variables(state.params,
                                        student_vars_init["params"]),
            batch_stats=deep_merge_variables(
                state.batch_stats, student_vars_init.get("batch_stats", {})))

    ckpt = None
    if cfg.train.checkpoint_dir:
        ckpt = CheckpointManager(cfg.train.checkpoint_dir)
        if cfg.train.resume_from_checkpoint and ckpt.latest_step() is not None:
            state, t_vars = ckpt.restore(state, t_vars)
            logger.info(f"resumed at {int(state.episodes_seen)} episodes")

    # multi-device: shard the episode axis over 'data' and the wide
    # projections over 'model' (parallel/mesh.py rules); single-device meshes
    # and batch sizes that don't divide the data axis run the plain path
    mesh = None
    if cfg.mesh is not None and len(jax.devices()) > 1:
        from ..parallel import make_mesh, shard_variables, shard_batch
        m = make_mesh(cfg.mesh)
        if m.devices.size > 1 and e_per_step % m.shape["data"] == 0:
            mesh = m
            state = state.replace(
                params=shard_variables(state.params, mesh),
                batch_stats=shard_variables(state.batch_stats, mesh),
                opt_state=shard_variables(state.opt_state, mesh))
            if t_vars is not None:
                t_vars = shard_variables(t_vars, mesh)
            logger.info(f"sharding over mesh {dict(m.shape)}")
        elif m.devices.size > 1:
            if jax.process_count() > 1:
                # falling back would have every process run a duplicate
                # full training job with identical rng into one ckpt dir
                raise ValueError(
                    f"multi-process run needs the sharded path: "
                    f"tasks_per_batch={e_per_step} does not divide the "
                    f"mesh data axis {m.shape['data']}")
            logger.info(f"mesh {dict(m.shape)} available but tasks_per_batch="
                        f"{e_per_step} does not divide the data axis — "
                        "running unsharded")

    step_fn = jax.jit(make_train_step(cfg), donate_argnums=0)
    eval_step = jax.jit(make_eval_step(cfg))

    test_marks = sorted(m for m in cfg.train.test_iters
                        if m > int(state.episodes_seen))
    save_every = max(1, cfg.train.save_freq // e_per_step)
    eval_history = []

    start_step = int(state.step)
    # multi-host: every process draws a DISJOINT shard of the global episode
    # batch from a process-folded rng stream and the loop assembles the
    # global data-sharded array (parallel/multihost.py); single-process the
    # plain stream is kept byte-identical
    multihost = mesh is not None and jax.process_count() > 1
    transfer = None   # default: plain device_put on the prefetch thread
    if multihost:
        from ..parallel import (local_episode_count, host_rng,
                                global_batch_from_local)
        local_e = local_episode_count(e_per_step)
        produce = lambda i: sampler.sample_batch(
            host_rng(cfg.train.seed, start_step + i), local_e, train=True)
        transfer = lambda b: global_batch_from_local(b, mesh)
        logger.info(f"multi-host input: {local_e} episodes/process × "
                    f"{jax.process_count()} processes")
    else:
        # keyed by absolute step so --resume_from_checkpoint CONTINUES the
        # episode stream instead of replaying batches 0..k a second time
        # (same continuation scheme as the multihost branch)
        produce = lambda i: sampler.sample_batch(
            np.random.default_rng((cfg.train.seed, start_step + i)),
            e_per_step, train=True)
        if mesh is not None:
            from ..parallel import batch_sharding
            # shard during the host→device transfer on the prefetch thread —
            # NOT default-device first and resharded on the hot loop
            transfer = lambda b: device_put_batch(b, batch_sharding(mesh))
    fetcher = Prefetcher(produce, n_batches=n_steps - start_step,
                         depth=prefetch_depth, transfer=transfer)

    # step/episode counters are host-deterministic (step += 1 and
    # episodes_seen += global batch size per update, train/steps.py:196-197),
    # so the hot loop never reads them off the device; metric host reads are
    # deferred by ONE step and fetched as a single transfer, so the next
    # step is already enqueued while the previous one syncs (same pattern
    # as run_eval above — per-step int(state.step)/float(metric) reads were
    # charging the dispatch round trip to every step)
    step_i = int(state.step)
    episodes = int(state.episodes_seen)
    deferred = DeferredHostSync(lambda s, n, m: logger.log(
        s, {k: float(v) for k, v in jax.device_get(m).items()}
        | {"episodes": n}))

    for batch in fetcher:
        if mesh is not None:
            with jax.set_mesh(mesh):
                state, metrics = step_fn(state, t_vars, batch)
        else:
            state, metrics = step_fn(state, t_vars, batch)
        step_i += 1
        episodes += e_per_step
        deferred.push(step_i, episodes, metrics)

        if ckpt and step_i % save_every == 0:
            deferred.flush()   # keep the JSONL chronological around the save
            ckpt.save(state, t_vars)
            logger.save_artifact(ckpt.directory)

        while test_marks and episodes >= test_marks[0]:
            mark = test_marks.pop(0)
            deferred.flush()
            summary = run_eval(cfg, state.variables, eval_sampler,
                               eval_step=eval_step, mesh=mesh)
            eval_history.append({"episodes": episodes, **summary})
            logger.info(f"eval @{episodes} episodes: "
                        f"{summary['accuracy']:.2f} ± {summary['confidence']:.2f} "
                        f"({summary['n_tasks']} tasks)")

    deferred.flush()
    assert int(state.step) == step_i, \
        "host step counter drifted from the device TrainState"
    if ckpt:
        ckpt.save(state, t_vars)
        logger.save_artifact(ckpt.directory)
    return state, t_vars, eval_history
