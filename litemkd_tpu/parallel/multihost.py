"""Multi-host input pipeline: per-process episode shards → one global batch.

On a multi-host TPU slice each process sees only its local devices, so every
process must (a) sample a *disjoint* shard of the global episode batch and
(b) assemble the global sharded array from process-local data. The reference
never scales past one host (SURVEY §2.4 — no torch.distributed anywhere);
this is the TPU-native design for doing so: episode sampling is already an
independent per-episode draw, so each host draws its own slice with a
process-folded RNG stream and `jax.make_array_from_process_local_data` glues
the shards into one `data`-sharded global batch. Single-process this reduces
exactly to `shard_batch` (tested on the virtual 8-device CPU mesh).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

from ..train.steps import EpisodeBatch
from .mesh import batch_sharding


def local_episode_count(global_episodes: int) -> int:
    """Episodes this process must produce for a global batch."""
    n_proc = jax.process_count()
    if global_episodes % n_proc != 0:
        raise ValueError(f"global batch {global_episodes} not divisible by "
                         f"{n_proc} processes")
    return global_episodes // n_proc


def host_rng(seed: int, step: Optional[int] = None) -> np.random.Generator:
    """Disjoint per-process (and optionally per-step) numpy RNG stream."""
    key = (seed, jax.process_index()) if step is None else \
          (seed, jax.process_index(), step)
    return np.random.default_rng(key)


def global_batch_from_local(local_batch: EpisodeBatch,
                            mesh: Mesh) -> EpisodeBatch:
    """Assemble the global `data`-sharded EpisodeBatch from this process's
    local episode shard. Every process must call this collectively with
    equally-shaped local shards."""
    sharding = batch_sharding(mesh)
    n_proc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    # tree_map handles both raw-array fields and the teacher pipeline's
    # modality-dict fields ({'rgb': arr, ...}); None fields pass through
    return jax.tree_util.tree_map(put, local_batch)
