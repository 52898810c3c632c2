"""Feature extraction: per-video expert features and fused MFM features.

Rebuilds the reference's dump tools, writing the same on-disk layout so either
framework can consume the other's feature trees:

- ``extract_expert_features``: per-modality trunk features per video →
  ``<out>/<class>/<video>/feature.npy`` (reference ``extract_feature.py:80-92``,
  ``TRX.extract_feature`` model.py:679-705);
- ``extract_mfm_features``: MFM-fused features over per-modality trees →
  same layout (reference ``extract_multi_feature.py:113-121``) — this produces
  exactly the ``teacher_path`` tree the student distillation consumes;
- both verify a sample against recomputation, echoing the reference's
  self-consistency check (``multi_fusion.py:576-590``).
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..data.features import MultiModalFeatureStore
from ..data.splits import SplitIndex, VideoRecord
from ..data.video import VideoStore


def _save_feature(out_root: str, class_name: str, video_id: str,
                  feature: np.ndarray) -> str:
    d = os.path.join(out_root, class_name, video_id)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "feature.npy")
    np.save(path, feature)
    return path


def _iter_records(index: SplitIndex):
    for c in index.classes():
        for rec in index.videos_for_class(c):
            yield rec


def _pipelined_extract(jobs, assemble, dispatch, sink) -> None:
    """Three-stage extraction pipeline over ``jobs`` (one entry per batch):
    ``assemble(job)`` builds the host arrays on a Prefetcher thread (decode /
    np.load overlap device compute), ``dispatch(inputs)`` enqueues the device
    forward on the hot loop, and ``sink(job, np_features)``'s host sync +
    np.save of batch k are deferred until batch k+1 is dispatched (per-device
    execution is FIFO, so results stay in job order) — the reference's
    one-video-at-a-time dump loops (extract_feature.py:80-92) serialized all
    three stages."""
    from ..data.prefetch import DeferredHostSync, Prefetcher

    def produce(i):
        job = jobs[i]
        return job, assemble(job)

    def transfer(item):
        job, arrs = item
        return job, jax.tree_util.tree_map(jnp.asarray, arrs)

    deferred = DeferredHostSync(lambda job, out: sink(job, np.asarray(out)))
    for job, inputs in Prefetcher(produce, n_batches=len(jobs),
                                  transfer=transfer):
        deferred.push(job, dispatch(inputs))
    deferred.flush()


def extract_expert_features(cfg: Config, video_store: VideoStore,
                            feature_fn: Callable[[jnp.ndarray], jnp.ndarray],
                            out_root: str, class_names: List[str],
                            batch_size: int = 16, verify: bool = True) -> int:
    """Run ``feature_fn`` ((B, T, H, W, 3) uint8 → (B, T, D)) over every video
    in both splits and dump per-video feature.npy files. Returns video count."""
    rng = np.random.default_rng(0)
    jobs = []
    for train in (True, False):
        records = list(_iter_records(video_store.split(train)))
        jobs += [records[i:i + batch_size]
                 for i in range(0, len(records), batch_size)]

    counter = [0]

    def sink(chunk, feats):
        for rec, f in zip(chunk, feats):
            _save_feature(out_root, class_names[rec.class_id],
                          rec.video_id, f.astype(np.float32))
            counter[0] += 1

    _pipelined_extract(
        jobs,
        # frame_rule="aux": extraction goes through AuxDataset in the
        # reference (extract_feature.py:18, mode=test) — plain linspace
        # frame selection, center-crop pixels
        assemble=lambda chunk: np.stack(
            [video_store.load(r, train=False, rng=rng, frame_rule="aux")
             for r in chunk]),
        dispatch=feature_fn, sink=sink)
    n = counter[0]
    if verify and n:
        rec = next(_iter_records(video_store.split(True)))
        clip = video_store.load(rec, train=False, rng=np.random.default_rng(0),
                                frame_rule="aux")
        fresh = np.asarray(feature_fn(jnp.asarray(clip[None])))[0]
        saved = np.load(os.path.join(out_root, class_names[rec.class_id],
                                     rec.video_id, "feature.npy"))
        # bf16 trunks round differently across batch shapes (eps ≈ 3.9e-3),
        # so the bound scales with the feature magnitude; a pairing or
        # shape bug still blows past it by orders of magnitude
        tol = max(1e-4, 1e-2 * float(np.abs(saved).max()))
        if not np.allclose(fresh, saved, rtol=0.0, atol=tol):
            raise RuntimeError(
                "extraction self-consistency check failed: "
                f"max|Δ|={np.abs(fresh - saved).max():.3e} on "
                f"{class_names[rec.class_id]}/{rec.video_id} "
                f"(‖saved‖∞={np.abs(saved).max():.3e}, tol={tol:.3e})")
    return n


def extract_mfm_features(cfg: Config, store: MultiModalFeatureStore,
                         mfm_variables, out_root: str,
                         class_names: List[str], batch_size: int = 64,
                         verify: bool = True, fusion_kind: str = "mfm",
                         side: int = 0) -> int:
    """MFM-fuse per-modality features for every video; dump feature.npy tree.

    ``side`` selects the support (0) or query (1) fusion path for composer
    presets whose two sides differ (the released side-asymmetric classes never
    implemented extract_feature, e.g. reference model.py:1790); side-symmetric
    teachers (MFM itself, DGA, two_road) ignore it.
    """
    import inspect
    from ..train.teacher_steps import make_mfm

    model = make_mfm(cfg, batched=False, kind=fusion_kind)
    kw = ({"side": side}
          if "side" in inspect.signature(model.extract).parameters else {})
    if side and not kw:
        raise ValueError(f"fusion kind {fusion_kind!r} is side-symmetric; "
                         "query-side extraction does not apply")
    fuse = jax.jit(lambda v, feats: model.apply(v, feats, method=model.extract,
                                                **kw))

    jobs = []
    for train in (True, False):
        records = list(_iter_records(store.split(train)))
        jobs += [(train, records[i:i + batch_size])
                 for i in range(0, len(records), batch_size)]

    counter = [0]

    def sink(job, fused):
        for rec, f in zip(job[1], fused):
            _save_feature(out_root, class_names[rec.class_id],
                          rec.video_id, f.astype(np.float32))
            counter[0] += 1

    _pipelined_extract(
        jobs,
        assemble=lambda job: {m: np.stack(
            [store.load(r, m, job[0]) for r in job[1]])
            for m in store.modalities},
        dispatch=lambda feats: fuse(mfm_variables, feats), sink=sink)
    n = counter[0]
    if verify and n:
        rec = next(_iter_records(store.split(True)))
        feats = {m: jnp.asarray(store.load(rec, m, True)[None])
                 for m in store.modalities}
        fresh = np.asarray(fuse(mfm_variables, feats))[0]
        saved = np.load(os.path.join(out_root, class_names[rec.class_id],
                                     rec.video_id, "feature.npy"))
        tol = max(1e-4, 1e-2 * float(np.abs(saved).max()))
        if not np.allclose(fresh, saved, rtol=0.0, atol=tol):
            raise RuntimeError(
                "extraction self-consistency check failed: "
                f"max|Δ|={np.abs(fresh - saved).max():.3e} "
                f"(‖saved‖∞={np.abs(saved).max():.3e}, tol={tol:.3e})")
    return n
