"""Compiled-cost canary for the flagship hot paths.

Lowers the canonical ``student_fc2sup_dist`` train step and eval step at the
real (224px, 16-episode) geometry on CPU and asserts XLA's ``cost_analysis``
stays inside a band around the recorded values. This is a cheap tripwire for
silent efficiency regressions — an accidental fp32 promotion roughly doubles
``bytes accessed``, a duplicated forward/backward pass doubles ``flops`` —
not a ground-truth FLOPs statement.

Conventions baked into the anchors (measured 2026-08-18, jax 0.8.x CPU):
XLA counts 2 flops per MAC (thop counts 1), and a ``lax.scan`` body
(``micro_batch=4`` here) is counted ONCE, not per trip. The eval step is
fwd-only at 30 clips/episode; the train step is fwd+bwd at 45 clips/episode
over one 4-episode scan slice.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from litemkd_tpu import preset
from litemkd_tpu.train import create_train_state, make_train_step
from litemkd_tpu.train.steps import EpisodeBatch, make_eval_step

# anchors from the current compiled graphs (see module docstring)
TRAIN_FLOPS = 16.69e12
TRAIN_BYTES = 1.006e12
EVAL_FLOPS = 13.51e12
EVAL_BYTES = 0.729e12
TEACHER_FLOPS = 28.97e12
TEACHER_BYTES = 0.586e12
BAND = 0.25          # fails at a ~2x regression with 4x margin


def _flagship_batch(cfg, train: bool):
    ep = cfg.episode
    e = cfg.train.tasks_per_batch
    nq = ep.n_queries(train)
    feats = dict(
        support_feats=jnp.zeros((e, ep.n_support, ep.seq_len,
                                 cfg.model.trans_linear_in_dim), jnp.float32),
        query_feats=jnp.zeros((e, nq, ep.seq_len,
                               cfg.model.trans_linear_in_dim), jnp.float32),
    ) if train else dict(support_feats=None, query_feats=None)
    return EpisodeBatch(
        support_clips=jnp.zeros((e, ep.n_support, ep.seq_len, ep.img_size,
                                 ep.img_size, 3), jnp.uint8),
        support_labels=jnp.zeros((e, ep.n_support), jnp.int32),
        query_clips=jnp.zeros((e, nq, ep.seq_len, ep.img_size,
                               ep.img_size, 3), jnp.uint8),
        query_labels=jnp.zeros((e, nq), jnp.int32),
        **feats)


def _zero_like_shapes(tree):
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype) if hasattr(s, "shape") else s,
        tree)


@pytest.mark.slow
def test_flagship_step_costs_stay_in_band():
    cfg = preset("student_fc2sup_dist")
    assert cfg.train.tasks_per_batch == 16 and cfg.episode.img_size == 224

    batch = _flagship_batch(cfg, train=True)
    # shapes only — a real 224px init forward takes minutes on this CPU
    state, teacher_vars = jax.eval_shape(
        lambda: create_train_state(cfg, jax.random.key(0), batch,
                                   episodes_per_step=16))
    state = _zero_like_shapes(state)
    teacher_vars = _zero_like_shapes(teacher_vars)

    cost = jax.jit(make_train_step(cfg)).lower(
        state, teacher_vars, batch).cost_analysis() or {}
    assert cost, "cost_analysis returned nothing"
    np.testing.assert_allclose(cost["flops"], TRAIN_FLOPS, rtol=BAND,
                               err_msg="train-step flops left the band")
    np.testing.assert_allclose(cost["bytes accessed"], TRAIN_BYTES, rtol=BAND,
                               err_msg="train-step bytes left the band")

    ebatch = _flagship_batch(cfg, train=False)
    sv = {"params": state.params, "batch_stats": state.batch_stats}
    ecost = jax.jit(make_eval_step(cfg)).lower(sv, ebatch).cost_analysis() or {}
    np.testing.assert_allclose(ecost["flops"], EVAL_FLOPS, rtol=BAND,
                               err_msg="eval-step flops left the band")
    np.testing.assert_allclose(ecost["bytes accessed"], EVAL_BYTES, rtol=BAND,
                               err_msg="eval-step bytes left the band")


@pytest.mark.slow
def test_mfm_teacher_step_costs_stay_in_band():
    """Same tripwire for the OTHER trainer: the canonical ``mfm_teacher``
    fused 16-episode Adam step (feature-space inputs — a real init is cheap,
    no 224px conv trunk)."""
    from litemkd_tpu.cli.train_teacher import SyntheticMultiModalSource
    from litemkd_tpu.train import create_mfm_train_state, make_mfm_train_step

    cfg = preset("mfm_teacher")
    assert cfg.train.tasks_per_batch == 16 and cfg.train.micro_batch == 0

    src = SyntheticMultiModalSource(cfg, n_classes=16, seed=0)
    batch = src.sample_batch(np.random.default_rng(0),
                             cfg.train.tasks_per_batch)
    state = create_mfm_train_state(cfg, jax.random.key(0), batch)
    cost = jax.jit(make_mfm_train_step(cfg)).lower(
        state, batch).cost_analysis() or {}
    assert cost, "cost_analysis returned nothing"
    np.testing.assert_allclose(cost["flops"], TEACHER_FLOPS, rtol=BAND,
                               err_msg="teacher-step flops left the band")
    np.testing.assert_allclose(cost["bytes accessed"], TEACHER_BYTES,
                               rtol=BAND,
                               err_msg="teacher-step bytes left the band")
