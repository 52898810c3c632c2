"""Pretraining-stage trajectory parity vs a torch transcription.

Locks the third trainer's learning dynamics the way
tests/test_trajectory_parity.py locks the student KD loop and
tests/test_teacher_trajectory.py locks the MFM teacher: N updates of
``make_pretrain_step`` must track N updates of the reference's supervised
pretraining loop (``pretrain/pretrain.py``) teacher-forced per step —
mean-CE loss, TWO SGD groups (trunk ``lr_1`` / head ``lr_2``, momentum 0.9,
pretrain.py:31-32) and per-group ``StepLR(step_size=10, gamma=0.1)`` stepped
at EPOCH START (pretrain.py:33-38,108-109), BN momentum 0.1. The geometry
crosses the epoch-10 decay boundary, so a schedule or group mix-up is a
10x-100x per-leaf mismatch, far beyond tolerance.
"""
import os
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from torch_cpu_baseline import ResNet18Trunk  # noqa: E402
from test_torch_import import _baseline_to_torchvision_names  # noqa: E402

from litemkd_tpu import preset  # noqa: E402
from litemkd_tpu.tools.torch_import import import_resnet_trunk  # noqa: E402
from litemkd_tpu.train.teacher_steps import (create_pretrain_state,  # noqa: E402
                                             make_pretrain_step)

IMG, T, N_CLASSES, BS = 32, 4, 3, 4
SPE = 2                      # steps per epoch (drop-last batch count)
EPOCHS = 11                  # crosses the StepLR(10) boundary at epoch 9
LR1, LR2 = 1e-4, 1e-2        # distinct group rates: a grouping mix-up is 100x


def _make_cfg():
    base = preset("tiny")
    return base.replace(
        episode=base.episode.__class__(way=3, shot=2, query_per_class=1,
                                       query_per_class_test=1, seq_len=T,
                                       img_size=IMG),
        model=base.model.__class__(compute_dtype="float32"),
    )


def _make_batches(rng, dtype=np.float32):
    batches = []
    for _ in range(EPOCHS * SPE):
        clips = rng.uniform(0.0, 1.0, (BS, T, IMG, IMG, 3)).astype(dtype)
        labels = rng.integers(0, N_CLASSES, BS).astype(np.int32)
        batches.append((clips, labels))
    return batches


def _snapshot(trunk, fc):
    sd = _baseline_to_torchvision_names(trunk)
    p, s = import_resnet_trunk(sd, depth=18)
    vars_ = {"params": {"trunk": p,
                        "fc": {"kernel": fc.weight.detach().numpy().T,
                               "bias": fc.bias.detach().numpy()}},
             "batch_stats": {"trunk": s}}
    # .numpy() views share storage with the live tensors SGD mutates
    return jax.tree_util.tree_map(np.copy, vars_)


def _torch_trajectory(batches, double=False):
    torch.manual_seed(7)
    trunk, fc = ResNet18Trunk(), torch.nn.Linear(512, N_CLASSES)
    if double:
        trunk, fc = trunk.double(), fc.double()
    opt1 = torch.optim.SGD(trunk.parameters(), lr=LR1, momentum=0.9)
    opt2 = torch.optim.SGD(fc.parameters(), lr=LR2, momentum=0.9)
    s1 = torch.optim.lr_scheduler.StepLR(opt1, step_size=10, gamma=0.1)
    s2 = torch.optim.lr_scheduler.StepLR(opt2, step_size=10, gamma=0.1)

    losses, states = [], [_snapshot(trunk, fc)]
    it = iter(batches)
    for _ in range(EPOCHS):
        s1.step()            # the reference steps at epoch START
        s2.step()            # (pretrain.py:108-109)
        for _ in range(SPE):
            clips, labels = next(it)
            x = torch.from_numpy(clips).reshape(BS * T, IMG, IMG, 3) \
                .permute(0, 3, 1, 2)
            feat = trunk(x).mean((2, 3)).view(BS, T, -1).mean(1)
            logits = fc(feat)
            loss = F.cross_entropy(logits, torch.from_numpy(labels).long())
            opt1.zero_grad()
            opt2.zero_grad()
            loss.backward()
            opt1.step()
            opt2.step()
            losses.append(float(loss))
            states.append(_snapshot(trunk, fc))
    return states, losses


def _flat(d, prefix=""):
    out = {}
    for k, v in sorted(d.items()):
        if isinstance(v, dict):
            out.update(_flat(v, prefix + k + "/"))
        else:
            out[prefix + k] = np.asarray(v)
    return out


@pytest.mark.slow
def test_pretrain_trajectory_matches_torch():
    rng = np.random.default_rng(3)
    batches = _make_batches(rng)
    t_states, t_losses = _torch_trajectory(batches)
    assert np.std(t_losses) > 1e-3          # the torch run must actually move

    cfg = _make_cfg()
    state, model = create_pretrain_state(
        cfg, jax.random.key(0), N_CLASSES, jnp.asarray(batches[0][0][:1]),
        arch="resnet18", lr_groups=(LR1, LR2), steps_per_epoch=SPE)
    step = jax.jit(make_pretrain_step(cfg, model), donate_argnums=0)

    for i, (clips, labels) in enumerate(batches):
        state = state.replace(params=t_states[i]["params"],
                              batch_stats=t_states[i]["batch_stats"])
        state, metrics = step(state, jnp.asarray(clips), jnp.asarray(labels))

        # loss at IDENTICAL params: pure forward parity
        np.testing.assert_allclose(float(metrics["loss"]), t_losses[i],
                                   rtol=5e-5, atol=5e-5,
                                   err_msg=f"step {i} loss")
        # the update (same calibration as test_trajectory_parity: two fp32
        # backends differ ~1%; a wrong group lr or a missed epoch-10 decay
        # is a 10x-100x per-leaf mismatch)
        want = _flat(t_states[i + 1]["params"])
        prev = _flat(t_states[i]["params"])
        got = _flat(jax.tree_util.tree_map(np.asarray, dict(state.params)))
        assert set(got) == set(want)
        upd_sq = err_sq = 0.0
        for k in want:
            upd = float(np.linalg.norm(want[k] - prev[k]))
            err = float(np.linalg.norm(got[k] - want[k]))
            upd_sq += upd * upd
            err_sq += err * err
            assert err <= 1e-1 * upd + 1e-7, (
                f"step {i} param {k}: update norm {upd:.3e}, "
                f"deviation {err:.3e}")
        assert err_sq ** 0.5 <= 3e-2 * upd_sq ** 0.5 + 1e-7, (
            f"step {i}: global update norm {upd_sq ** 0.5:.3e}, "
            f"deviation {err_sq ** 0.5:.3e}")
        assert upd_sq ** 0.5 > 1e-7, f"step {i}: torch made no update"

        # BN running stats: mean tight; var carries flax's biased vs torch's
        # unbiased batch variance — n/(n-1) with n = BS*T = 16 at the
        # 1x1-spatial layer4 here, i.e. up to ~0.7% of the 0.1-momentum
        # update per step (still 10x under any semantic error)
        want_s = _flat(t_states[i + 1]["batch_stats"])
        got_s = _flat(jax.tree_util.tree_map(np.asarray,
                                             dict(state.batch_stats)))
        assert set(got_s) == set(want_s)
        for k in want_s:
            tol = dict(rtol=2.5e-2, atol=1e-3) if k.endswith("var") \
                else dict(rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(got_s[k], want_s[k],
                                       err_msg=f"step {i} stat {k}", **tol)


def test_pretrain_schedule_decays_at_epoch_10():
    """The optax schedule reproduces StepLR(10, 0.1)-stepped-at-epoch-start:
    epoch e runs at 0.1 ** ((e+1) // 10) of the base rate."""
    cfg = _make_cfg()
    state, _ = create_pretrain_state(
        cfg, jax.random.key(0), N_CLASSES,
        jnp.zeros((1, T, IMG, IMG, 3), jnp.float32),
        arch="resnet18", lr_groups=(LR1, LR2), steps_per_epoch=SPE)
    sgd_inner = state.tx
    # probe the schedule the state was built with via a unit-gradient update
    params = {"trunk": {"w": jnp.ones((1,))}, "fc": {"w": jnp.ones((1,))}}
    opt = sgd_inner.init(params)
    for update_idx in range(EPOCHS * SPE):
        g = {"trunk": {"w": jnp.ones((1,))}, "fc": {"w": jnp.ones((1,))}}
        upd, opt = sgd_inner.update(g, opt, params)
        epoch = update_idx // SPE
        factor = 0.1 ** ((epoch + 1) // 10)
        # momentum=0.9 on a constant unit gradient: trace = sum of mu^j
        trace = sum(0.9 ** j for j in range(update_idx + 1))
        np.testing.assert_allclose(float(upd["trunk"]["w"][0]),
                                   -LR1 * factor * trace, rtol=1e-5,
                                   err_msg=f"trunk update {update_idx}")
        np.testing.assert_allclose(float(upd["fc"]["w"][0]),
                                   -LR2 * factor * trace, rtol=1e-5,
                                   err_msg=f"head update {update_idx}")


@pytest.mark.slow
def test_pretrain_free_running_trajectory_fp64():
    """Free-running fp64 pretrain lock (VERDICT r2 item 4): all 22 updates
    (11 epochs x 2 steps, crossing the StepLR(10) boundary) integrated
    independently on both sides in float64 — dual SGD groups, momentum,
    train-mode BN (batch stats feed the forward, so the documented
    biased/unbiased RUNNING-var gap never enters the loss; running stats are
    excluded from the final comparison for that reason)."""
    rng = np.random.default_rng(11)
    batches = _make_batches(rng, dtype=np.float64)
    t_states, t_losses = _torch_trajectory(batches, double=True)
    assert np.std(t_losses) > 1e-6

    prev_x64 = jax.config.read("jax_enable_x64")
    jax.config.update("jax_enable_x64", True)
    try:
        base = _make_cfg()
        cfg = base.replace(model=base.model.__class__(**{
            **base.model.__dict__, "compute_dtype": "float64"}))
        state, model = create_pretrain_state(
            cfg, jax.random.key(0), N_CLASSES, jnp.asarray(batches[0][0][:1]),
            arch="resnet18", lr_groups=(LR1, LR2), steps_per_epoch=SPE)
        state = state.replace(
            params=jax.tree_util.tree_map(jnp.asarray,
                                          t_states[0]["params"]),
            batch_stats=jax.tree_util.tree_map(jnp.asarray,
                                               t_states[0]["batch_stats"]))
        step = jax.jit(make_pretrain_step(cfg, model))
        our_losses = []
        for clips, labels in batches:
            state, metrics = step(state, jnp.asarray(clips),
                                  jnp.asarray(labels))
            our_losses.append(float(metrics["loss"]))

        np.testing.assert_allclose(our_losses, t_losses, rtol=1e-9,
                                   err_msg="free-running fp64 loss series")
        want = _flat(t_states[-1]["params"])
        got = _flat(jax.tree_util.tree_map(np.asarray, dict(state.params)))
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-8, atol=1e-11,
                                       err_msg=f"final param {k}")
    finally:
        jax.config.update("jax_enable_x64", prev_x64)
