"""Device mesh and sharding rules.

TPU-native replacement for the reference's intra-host ``torch.nn.DataParallel``
(``model_select.py:205-208``) and manual per-modality GPU round-robin
(``multi_fusion.py:806-809``): one ``jax.sharding.Mesh`` with a ``data`` axis
(episode batch sharding — the DP analog) and a ``model`` axis (tensor-parallel
sharding of the wide projections — the TCT k/v 4096→1152 maps, backbone fc
lifts, and fusion-encoder MLPs). XLA inserts the psum/all-gather collectives
over ICI; nothing here speaks NCCL.
"""
from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    cfg = cfg or MeshConfig()
    model = max(1, cfg.model)
    n = len(devices)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    data = cfg.data if cfg.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Episode batches shard their leading (episode) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameter path patterns → PartitionSpec. The wide episodic-head projections
# and backbone channel-lift fcs are column-sharded over 'model'; LayerNorms,
# biases and conv kernels (small, conv-bound not memory-bound) replicate.
_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*(k_linear|v_linear)/kernel$", P(None, "model")),
    (r".*(fc1|fc2)/kernel$", P(None, "model")),
    (r".*attn_(q|k|v)/kernel$", P(None, "model")),
    (r".*attn_out/kernel$", P("model", None)),
    (r".*mlp_in/kernel$", P(None, "model")),
    (r".*mlp_out/kernel$", P("model", None)),
    (r".*fuse_proj/kernel$", P(None, "model")),
)


def param_spec(path: str) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.match(pattern, path):
            return spec
    return P()


def _tree_paths(tree) -> Any:
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = ["/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                      for k in path) for path, _ in flat]
    return flat, treedef, paths


def variables_shardings(tree, mesh: Mesh):
    """NamedSharding pytree for a params/batch_stats/opt-state tree."""
    flat, treedef, paths = _tree_paths(tree)
    shardings = []
    for path, (_, leaf) in zip(paths, flat):
        if not hasattr(leaf, "ndim"):
            shardings.append(NamedSharding(mesh, P()))
            continue
        spec = param_spec(path)
        # drop the spec if the dim isn't divisible by the mesh axis
        if spec != P() and leaf.ndim >= len(spec):
            ok = True
            for dim, axis in zip(leaf.shape, spec):
                if axis is not None and dim % mesh.shape[axis] != 0:
                    ok = False
            if not ok:
                spec = P()
        if spec != P() and leaf.ndim < len([a for a in spec]):
            spec = P()
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_variables(tree, mesh: Mesh):
    """Place a host pytree onto the mesh according to the param rules."""
    return jax.device_put(tree, variables_shardings(tree, mesh))


def batch_shardings(batch, mesh: Mesh):
    """Sharding pytree for an EpisodeBatch (leading axis over 'data')."""
    bs = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: bs, batch)


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_shardings(batch, mesh))
