"""AOT serving artifacts via ``jax.export``.

The reference deploys by shipping a torch checkpoint plus the whole training
repo and re-running ``test.py``/``pywebio`` around it (``test.py:105-110``,
``teacher/code/multi_fusion.py`` demo mode). The TPU-native deployment story
is ahead-of-time compilation: the episodic scoring function is lowered to
StableHLO once, serialized together with its weights and a manifest, and the
resulting single file can be loaded and run by a serving host with *no model
code at all* — ``jax.export.deserialize`` + ``.call`` is the entire runtime
surface. Lowering is cross-platform: a CPU dev box can emit a TPU artifact
(``platforms=("tpu", "cpu")``) because StableHLO is compiled on the *loading*
host, not the exporting one.

Artifact layout (one ``.litemkd`` zip):
    serving_fn      jax.export serialized bytes (StableHLO + calling conv)
    params.npz      flattened variables (``/``-joined pytree paths)
    manifest.json   geometry, loss head, platforms, jax version

The scoring function is ``(variables, support_clips, support_labels,
query_clips) → (Q,-way) logits`` vmapped over a leading episode axis — the
same contract as ``models/student.py:BatchedStudent`` at eval
(``test.py:160-201``'s hot loop without the accuracy reduction).
"""
from __future__ import annotations

import io
import json
import zipfile
from typing import Any, Callable, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..config import Config

_FN_NAME = "serving_fn"
_PARAMS_NAME = "params.npz"
_MANIFEST_NAME = "manifest.json"


def make_serving_fn(cfg: Config) -> Callable:
    """Pure episodic scorer: merged logits for a batch of episodes."""
    from ..models import BatchedStudent
    from ..distill import merge_logits

    student = BatchedStudent(cfg)

    def serve(variables, support_clips, support_labels, query_clips):
        out = student.apply(variables, support_clips, support_labels,
                            query_clips, train=False)
        return merge_logits(cfg.distill.name, out["logits"])

    return serve


def make_extract_fn(cfg: Config) -> Callable:
    """Pure fused-feature extractor: the MFM teacher's ``extract_feature``
    production path (``teacher/code/model.py:1648-1663`` behind
    ``extract_multi_feature.py``) as a servable function —
    ``(variables, {modality: (N, T, D)}) → (N, T, D)`` fused features."""
    from ..train.teacher_steps import make_mfm

    model = make_mfm(cfg, batched=False)

    def extract(variables, feats):
        return model.apply(variables, feats, method=model.extract)

    return extract


def _prune_empty(tree):
    """Drop leafless subtrees (e.g. an empty ``batch_stats`` collection from
    a BN-free trunk). The flat ``params.npz`` cannot represent an empty dict,
    so exporting with one would bake a calling convention the round-tripped
    weights can never match — prune before lowering instead."""
    if hasattr(tree, "items"):
        out = {}
        for k, v in tree.items():
            p = _prune_empty(v)
            if not (isinstance(p, dict) and not p):
                out[k] = p
        return out
    return tree


def _var_specs(variables):
    """Shape/dtype specs only — ``jnp.asarray`` here would ship every weight
    through the (minutes-scale) host→device tunnel just to read ``.dtype``."""
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            np.shape(x), getattr(x, "dtype", None) or np.asarray(x).dtype),
        variables)


def _flatten_variables(variables) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_variables(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, arr in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def export_serving_artifact(cfg: Config, variables, out_path: str,
                            platforms: Tuple[str, ...] = ("tpu", "cpu"),
                            episodes: int = 1) -> dict:
    """Lower + serialize the scorer and bundle weights into ``out_path``."""
    ep = cfg.episode
    s, q = ep.n_support, ep.n_queries(False)
    shapes = {
        "support_clips": (episodes, s, ep.seq_len, ep.img_size, ep.img_size, 3),
        "support_labels": (episodes, s),
        "query_clips": (episodes, q, ep.seq_len, ep.img_size, ep.img_size, 3),
    }
    serve = make_serving_fn(cfg)
    variables = _prune_empty(variables)
    args = (_var_specs(variables),
            jax.ShapeDtypeStruct(shapes["support_clips"], jnp.uint8),
            jax.ShapeDtypeStruct(shapes["support_labels"], jnp.int32),
            jax.ShapeDtypeStruct(shapes["query_clips"], jnp.uint8))
    exported = jax_export.export(jax.jit(serve), platforms=list(platforms))(*args)

    manifest = {
        "format": 1, "kind": "scorer",
        "way": ep.way, "shot": ep.shot, "queries": q, "seq_len": ep.seq_len,
        "img_size": ep.img_size, "episodes": episodes,
        "backbone": cfg.model.backbone, "classifier": cfg.model.classifier,
        "loss": cfg.distill.name,
        "platforms": list(platforms), "jax_version": jax.__version__,
        "input_shapes": {k: list(v) for k, v in shapes.items()},
    }
    _write_artifact(out_path, exported, variables, manifest)
    return manifest


def export_extract_artifact(cfg: Config, variables, out_path: str,
                            platforms: Tuple[str, ...] = ("tpu", "cpu"),
                            batch: int = 8) -> dict:
    """Lower + serialize the MFM fused-feature extractor (the teacher's
    production feature-plane: ``extract_multi_feature.py``) into
    ``out_path``; the serving host maps it over per-modality feature trees
    with jax alone."""
    d = cfg.model.trans_linear_in_dim
    t = cfg.episode.seq_len
    shapes = {m: (batch, t, d) for m in cfg.model.modalities}
    fn = make_extract_fn(cfg)
    variables = _prune_empty(variables)
    args = (_var_specs(variables),
            {m: jax.ShapeDtypeStruct(s, jnp.float32)
             for m, s in shapes.items()})
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(*args)
    manifest = {
        "format": 1, "kind": "extract_mfm",
        "modalities": list(cfg.model.modalities), "seq_len": t, "dim": d,
        "batch": batch, "trans_num": cfg.model.trans_num,
        "shirt_num": cfg.model.shirt_num,
        "platforms": list(platforms), "jax_version": jax.__version__,
        "input_shapes": {k: list(v) for k, v in shapes.items()},
    }
    _write_artifact(out_path, exported, variables, manifest)
    return manifest


def _write_artifact(out_path: str, exported, variables, manifest: dict) -> None:
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_FN_NAME, exported.serialize())
        buf = io.BytesIO()
        np.savez(buf, **_flatten_variables(variables))
        z.writestr(_PARAMS_NAME, buf.getvalue())
        z.writestr(_MANIFEST_NAME, json.dumps(manifest, indent=1))


def load_serving_artifact(path: str) -> Tuple[Callable, dict]:
    """Load a ``.litemkd`` artifact → (callable, manifest).

    The callable closes over the bundled weights and needs only jax — no
    litemkd_tpu model code. Signature by ``manifest["kind"]``:
    - ``scorer`` (default): ``(support_clips, support_labels, query_clips)
      → logits``
    - ``extract_mfm``: ``({modality: (N, T, D)}) → (N, T, D)`` fused feats
    """
    with zipfile.ZipFile(path) as z:
        exported = jax_export.deserialize(bytearray(z.read(_FN_NAME)))
        with np.load(io.BytesIO(z.read(_PARAMS_NAME))) as npz:
            variables = _unflatten_variables({k: npz[k] for k in npz.files})
        manifest = json.loads(z.read(_MANIFEST_NAME))

    if manifest.get("kind", "scorer") == "extract_mfm":
        def extractor(feats):
            return exported.call(variables, feats)
        return extractor, manifest

    def scorer(support_clips, support_labels, query_clips):
        return exported.call(variables, support_clips, support_labels,
                             query_clips)

    return scorer, manifest
