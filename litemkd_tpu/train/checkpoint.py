"""Checkpointing with Orbax.

Replaces the reference's ``torch.save({'iteration', 'model_state_dict',
'optimizer', 'scheduler'})`` flow (``trainwandb.py:172-180``,
``multi_fusion.py:867-898``): saves {step, episodes_seen, params, batch_stats,
opt_state} plus the teacher variables, keeps a rolling 'latest', and restores
for ``--resume_from_checkpoint``. Directory hygiene mirrors
``verify_checkpoint_dir`` (``options.py:106-123``) but raises instead of
sys.exit-ing.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .steps import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, state: TrainState, teacher_vars: Any = None,
             extra: Optional[dict] = None) -> None:
        # opt_state is stored as flat leaves: optax's namedtuple nesting does
        # not round-trip through orbax without a live template, and the treedef
        # is always reconstructible from the optimizer at restore time
        payload = {
            "step": np.asarray(state.step),
            "episodes_seen": np.asarray(state.episodes_seen),
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_leaves": list(jax.tree_util.tree_leaves(state.opt_state)),
            "rng": jax.random.key_data(state.rng),
        }
        if teacher_vars is not None:
            payload["teacher"] = teacher_vars
        if extra:
            payload["extra"] = extra
        self.mngr.save(int(state.episodes_seen),
                       args=ocp.args.StandardSave(payload))
        self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state: TrainState,
                teacher_vars: Any = None) -> Tuple[TrainState, Any]:
        """Restore into the (freshly initialized) state template. The teacher
        subtree is returned when present regardless of whether the caller
        supplied one (fixes the reference's skipped teacher loading for
        non-listed names, model_select.py:238 — SURVEY.md §3.6)."""
        step = self.mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self.mngr.restore(step, args=ocp.args.StandardRestore())
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state.opt_state),
            restored["opt_leaves"])
        new_state = state.replace(
            step=jax.numpy.asarray(restored["step"], jax.numpy.int32),
            episodes_seen=jax.numpy.asarray(restored["episodes_seen"],
                                            jax.numpy.int32),
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=opt_state,
            rng=jax.random.wrap_key_data(jax.numpy.asarray(restored["rng"])),
        )
        return new_state, restored.get("teacher", teacher_vars)


def restore_payload(directory: str) -> Any:
    """Load the raw checkpoint payload as host numpy arrays (no state
    template, no device placement — works for TPU-written checkpoints opened
    on a CPU host and vice versa)."""
    root = os.path.abspath(directory)
    step = ocp.CheckpointManager(root).latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {directory}")
    path = os.path.join(root, str(step), "default")
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata
    leaves, treedef = jax.tree_util.tree_flatten(meta)
    restore_args = jax.tree_util.tree_unflatten(
        treedef, [ocp.RestoreArgs(restore_type=np.ndarray) for _ in leaves])
    return ckptr.restore(path, restore_args=restore_args)


def restore_params(directory: str) -> Any:
    """Load only the params tree from the latest checkpoint in ``directory``
    (no state template needed) — used for cross-model weight grafts like the
    TSF per-branch expert loading (reference score_fusion_run.py)."""
    return restore_payload(directory)["params"]


def verify_checkpoint_dir(directory: str, resume: bool) -> None:
    """Reference semantics (options.py:106-123): fresh runs need a fresh dir;
    resumes need an existing checkpoint."""
    if resume:
        if not os.path.exists(directory):
            raise FileNotFoundError(
                f"can't resume: checkpoint dir {directory} does not exist")
    else:
        if os.path.exists(directory) and os.listdir(directory):
            raise FileExistsError(
                f"checkpoint dir {directory} already exists; pass resume or a "
                f"fresh directory")
        os.makedirs(directory, exist_ok=True)
