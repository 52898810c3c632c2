"""Jitted train / eval steps for student distillation.

This is the TPU-native core of the hot loop in ``trainwandb.py:111-287``: one
jitted, buffer-donated step consumes a BATCH of episodes (the reference's
sequential 16-episode gradient accumulation becomes a single fused forward +
backward), applies the named distillation loss per episode, sums, and updates.

Loss-scale semantics match the reference exactly at the canonical config: the
reference sums 16 per-episode losses before stepping (each episode's CE term
already divided by tasks_per_batch), so here ``total = Σ_e loss_e`` with the
same divisor.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..config import Config
from ..distill import get_distiller, merge_logits
from ..models import BatchedStudent, BatchedTeacher
from ..utils.metrics import per_episode_accuracy
from .schedule import make_optimizer


class EpisodeBatch(NamedTuple):
    """One batch of episodes (leading axis E on every field).

    support_clips (E, S, T, H, W, 3)  float32 (normalized)
    support_labels (E, S)             int32 in [0, way)
    query_clips  (E, Q, T, H, W, 3)
    query_labels (E, Q)
    support_feats (E, S, T, D)        fused teacher features (optional: zeros)
    query_feats  (E, Q, T, D)
    """

    support_clips: Any
    support_labels: Any
    query_clips: Any
    query_labels: Any
    support_feats: Any = None
    query_feats: Any = None


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray                      # optimizer updates so far
    episodes_seen: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(cfg: Config, rng, sample_batch: EpisodeBatch,
                       episodes_per_step: Optional[int] = None) -> Tuple[TrainState, Any]:
    """Initialize student params/optimizer and (separately) teacher variables."""
    e = int(sample_batch.support_clips.shape[0])
    eps = episodes_per_step or e
    student = BatchedStudent(cfg)
    teacher = BatchedTeacher(cfg)
    k_s, k_t, k_run = jax.random.split(rng, 3)
    # init on a single-episode slice: parameters are independent of the episode
    # batch size and a full-batch init forward can exceed HBM
    one = jax.tree_util.tree_map(lambda x: x[:1], sample_batch)
    s_vars = student.init(k_s, one.support_clips, one.support_labels,
                          one.query_clips, train=False)
    t_vars = None
    if sample_batch.support_feats is not None:
        t_vars = teacher.init(k_t, one.support_feats, one.support_labels,
                              one.query_feats, train=False)
    tx = make_optimizer(cfg.train.optimizer, cfg.train.learning_rate,
                        cfg.train.sch, cfg.train.sch_gamma, eps)
    params = s_vars["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        episodes_seen=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=s_vars.get("batch_stats", FrozenDict()),
        opt_state=tx.init(params),
        rng=k_run,
        tx=tx,
    )
    return state, t_vars


def make_train_step(cfg: Config) -> Callable:
    """Build the jit-able distillation train step.

    signature: step(state, teacher_vars, batch) → (state, metrics)
    """
    student = BatchedStudent(cfg)
    teacher = BatchedTeacher(cfg)
    distill = get_distiller(cfg.distill.name)
    dcfg = cfg.distill
    tpb = cfg.train.tasks_per_batch

    def loss_fn(params, batch_stats, teacher_vars, batch: EpisodeBatch, rng):
        rng_s, rng_t = jax.random.split(rng)
        out, mutated = student.apply(
            {"params": params, "batch_stats": batch_stats},
            batch.support_clips, batch.support_labels, batch.query_clips,
            train=True, rngs={"dropout": rng_s}, mutable=["batch_stats"])
        s_logits = out["logits"]

        if teacher_vars is not None:
            t_out = teacher.apply(teacher_vars, batch.support_feats,
                                  batch.support_labels, batch.query_feats,
                                  train=True, rngs={"dropout": rng_t})
            t_logits = jax.lax.stop_gradient(t_out["logits"])
            per_ep = jax.vmap(lambda s, t, l: distill(s, t, l, dcfg, tpb))(
                s_logits, t_logits, batch.query_labels)
        else:
            # teacher-free losses (ce / strm) ignore the teacher argument
            per_ep = jax.vmap(lambda s, l: distill(s, None, l, dcfg, tpb))(
                s_logits, batch.query_labels)
        total = jnp.sum(per_ep["loss"])
        merged = merge_logits(cfg.distill.name, s_logits)
        acc = per_episode_accuracy(merged, batch.query_labels)
        metrics = {"task_loss": total,
                   "accuracy": jnp.mean(acc)}
        for k, v in per_ep.items():
            if k != "loss":
                metrics[k] = jnp.mean(v)
        return total, (mutated["batch_stats"], metrics)

    micro = cfg.train.micro_batch

    def _accumulated_grads(state, teacher_vars, batch, step_rng):
        """Split the episode axis into chunks and lax.scan-accumulate grads —
        the HBM-bounded generalization of the reference's 16-episode
        accumulation loop (per-episode losses already sum, so summed chunk
        grads are bit-identical in exact arithmetic)."""
        e = batch.support_labels.shape[0]
        if not micro or micro >= e:
            return jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, teacher_vars, batch, step_rng)
        assert e % micro == 0, (e, micro)
        n_chunks = e // micro
        chunked = jax.tree_util.tree_map(
            lambda x: x.reshape(n_chunks, micro, *x.shape[1:])
            if x is not None else None, batch)
        rngs = jax.random.split(step_rng, n_chunks)

        def body(carry, xs):
            grads_acc, stats, metrics_acc = carry
            chunk, rng_i = xs
            g, (new_stats, m) = jax.grad(loss_fn, has_aux=True)(
                state.params, stats, teacher_vars, chunk, rng_i)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g)
            metrics_acc = {k: metrics_acc[k] + m[k] for k in m}
            return (grads_acc, new_stats, metrics_acc), None

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        first_chunk = jax.tree_util.tree_map(lambda x: x[0], chunked)
        _, (_, m0) = jax.eval_shape(
            lambda p, s, r: jax.grad(loss_fn, has_aux=True)(
                p, s, teacher_vars, first_chunk, r),
            state.params, state.batch_stats, rngs[0])
        # accumulator dtypes follow the body's metric dtypes (fp32 anchors
        # normally; fp64 under x64 golden runs — a literal float32 here
        # breaks the scan carry-type match)
        zero_m = {k: jnp.zeros((), m0[k].dtype) for k in m0}
        (grads, new_stats, metrics), _ = jax.lax.scan(
            body, (zero_g, state.batch_stats, zero_m), (chunked, rngs))
        # loss is a sum over episodes; averaged metrics get normalized
        metrics = {k: (v if k == "task_loss" else v / n_chunks)
                   for k, v in metrics.items()}
        return grads, (new_stats, metrics)

    watch = cfg.train.watch

    def train_step(state: TrainState, teacher_vars, batch: EpisodeBatch):
        rng, step_rng = jax.random.split(state.rng)
        grads, (new_stats, metrics) = _accumulated_grads(
            state, teacher_vars, batch, step_rng)
        if watch:
            # wandb.watch analog (trainwandb.py:52): global + per-top-module
            # gradient/parameter norms, computed in-graph (fused, ~free)
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["param_norm"] = optax.global_norm(state.params)
            for top in grads:
                metrics[f"grad_norm/{top}"] = optax.global_norm(grads[top])
                metrics[f"param_norm/{top}"] = optax.global_norm(
                    state.params[top])
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        e = batch.support_labels.shape[0]
        new_state = state.replace(
            step=state.step + 1,
            episodes_seen=state.episodes_seen + e,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            rng=rng,
        )
        return new_state, metrics

    return train_step


def make_eval_step(cfg: Config, with_preds: bool = False) -> Callable:
    """Jit-able eval step: per-episode accuracy for a batch of episodes.

    signature: eval_step(variables, batch) → (E,) accuracies, or with
    ``with_preds`` → ((E,) accuracies, (E, Q) episode-local predictions) for
    the per-task confusion analysis (reference ``test.py:160-201``).
    """
    student = BatchedStudent(cfg)

    def eval_step(variables, batch: EpisodeBatch):
        out = student.apply(variables, batch.support_clips,
                            batch.support_labels, batch.query_clips,
                            train=False)
        merged = merge_logits(cfg.distill.name, out["logits"])
        acc = per_episode_accuracy(merged, batch.query_labels)
        if with_preds:
            return acc, jnp.argmax(merged, axis=-1)
        return acc

    return eval_step


def make_teacher_eval_step(cfg: Config, with_preds: bool = False) -> Callable:
    """Eval the (frozen) teacher itself on feature episodes — the reference's
    ``test.py`` 'teacher' mode (test.py:107-110)."""
    teacher = BatchedTeacher(cfg)

    def eval_step(teacher_vars, batch: EpisodeBatch):
        out = teacher.apply(teacher_vars, batch.support_feats,
                            batch.support_labels, batch.query_feats,
                            train=False)
        logits = out["logits"]
        if isinstance(logits, dict):
            logits = logits["kl"] if "kl" in logits else next(iter(logits.values()))
        acc = per_episode_accuracy(logits, batch.query_labels)
        if with_preds:
            return acc, jnp.argmax(logits, axis=-1)
        return acc

    return eval_step
