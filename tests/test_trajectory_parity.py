"""Training-trajectory parity vs a torch transcription of the reference.

Single-forward golden tests (test_torch_import.py) prove the model math; this
locks the *learning dynamics*: N optimizer steps of ``make_train_step`` must
track N steps of the reference's training semantics — SGD, per-episode
MultiStepLR (``trainwandb.py:141-145``) converted to per-batch boundaries
(``train/schedule.py``), BN momentum 0.1, and the summed gradient-accumulation
semantics — within fp32 tolerance, for both the ``micro_batch`` (sequential
episodes, chained BN stats — the reference's accumulation loop) and the
fused-batch path (with ``freeze_bn``, where BN normalization is identical by
construction).

Two tiers: the fp32 tests are teacher-forced (reset to the torch state before
every step) because two independent fp32 backends amplify rounding noise
~5x/step when free-running; test_student_free_running_trajectory_fp64 removes
that caveat entirely — both sides integrate 20 unforced float64 updates
across the LR-decay boundary and match to 1e-9 on the loss series (all four
trainers carry the same fp64 free-running lock; see test_teacher_trajectory /
test_pretrain_trajectory / test_expert_trajectory).

Documented divergence retained here: the torch trainer below feeds each
episode's context+target clips through the backbone as ONE BN batch, matching
our Student's fused forward; the released reference runs two separate forwards
(``model/backbone/resnet18_2fc.py:40-41``), a normalization difference that is
part of the episode-batched redesign (see models/student.py docstring).

Known, accepted numerics gap: torch updates running_var with the *unbiased*
batch variance, flax with the biased one — ~n/(n-1) relative (≤0.5% at the
2×2-spatial layer4 here), asserted loosely below.
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
from torch_cpu_baseline import (StudentBackbone2FC, TCT as TorchTCT,  # noqa: E402
                                support_dk, kd_loss, dist_loss)
from test_torch_import import _baseline_to_torchvision_names  # noqa: E402

from litemkd_tpu import preset  # noqa: E402
from litemkd_tpu.tools import import_backbone_2fc, import_tct  # noqa: E402
from litemkd_tpu.train import create_train_state, make_train_step  # noqa: E402
from litemkd_tpu.train.steps import EpisodeBatch  # noqa: E402

# geometry chosen for the 1-core CPU box: XLA's CPU conv backward is ~20x
# slower than torch's MKLDNN at equal shapes, so the jax side dominates
WAY, SHOT, QPC, T, IMG, DIM, DK = 3, 2, 1, 4, 32, 64, 32
S, Q = WAY * SHOT, WAY * QPC
E = 2            # episodes per optimizer step
N_STEPS = {"micro": 12, "fused_freeze_bn": 8}  # decay at update 9 (micro)
LR = 1e-4   # the reference default (options.py); higher rates explode at
            # random init (grad norms ~1e3) and chaos swamps the comparison
TPB = 16         # the reference's fixed CE divisor (tasks_per_batch)
MILESTONE = 16   # in episodes → decay at optimizer update 9 on both sides


def _make_cfg(**model_overrides):
    base = preset("tiny")
    cfg = base.replace(
        episode=base.episode.__class__(way=WAY, shot=SHOT, query_per_class=QPC,
                                       query_per_class_test=1, seq_len=T,
                                       img_size=IMG),
        model=base.model.__class__(
            backbone="resnet18_2fc", classifier="TRX_2fcsup",
            teacher="TRX_2fcsup_fixed", trans_linear_in_dim=DIM,
            trans_linear_out_dim=DK, trans_dropout=0.0,
            compute_dtype="float32", **model_overrides),
        train=base.train.__class__(tasks_per_batch=TPB, micro_batch=0,
                                   learning_rate=LR, optimizer="sgd",
                                   sch=(MILESTONE,), sch_gamma=0.1),
    )
    return cfg


def _make_data(rng, n_steps, dtype=np.float32):
    """n_steps batches of E episodes: clips in [0,1], teacher features."""
    batches = []
    for _ in range(n_steps):
        batches.append(dict(
            ctx=rng.random((E, S, T, IMG, IMG, 3)).astype(dtype),
            tgt=rng.random((E, Q, T, IMG, IMG, 3)).astype(dtype),
            labels=np.tile(np.repeat(np.arange(WAY), SHOT), (E, 1)).astype(np.int32),
            qlabels=np.tile(np.repeat(np.arange(WAY), QPC), (E, 1)).astype(np.int32),
            t_ctx=rng.standard_normal((E, S, T, DIM)).astype(dtype),
            t_tgt=rng.standard_normal((E, Q, T, DIM)).astype(dtype),
        ))
    return batches


def _build_torch_models(double=False):
    torch.manual_seed(11)
    backbone = StudentBackbone2FC(dim=DIM, seq_len=T)
    tct = TorchTCT(way=WAY, shot=SHOT, seq_len=T, dim=DIM, dk=DK)
    teacher_tct = TorchTCT(way=WAY, shot=SHOT, seq_len=T, dim=DIM, dk=DK)
    if double:
        backbone, tct = backbone.double(), tct.double()
        teacher_tct = teacher_tct.double()
        # bit-sync the sinusoidal tables to our numpy-fp32 values (see
        # test_teacher_trajectory._TorchMFM): both sides compute the table
        # in fp32 with different libm roundings (~1 ulp), which is far above
        # the 1e-9 fp64 lock below
        from litemkd_tpu.ops.positional import sinusoidal_pe
        with torch.no_grad():
            for m in (tct, teacher_tct):
                m.pe.copy_(torch.from_numpy(sinusoidal_pe(T, DIM, 0.1)))
    return backbone, tct, teacher_tct


def _export_to_flax(backbone, tct, teacher_tct, cfg):
    """Torch weights → student variables + teacher variables (shared init)."""
    sd = {}
    for k, v in _baseline_to_torchvision_names(backbone.trunk).items():
        sd[f"resnet.{k}"] = v
    for head in ("fc1", "fc2"):
        for p in ("weight", "bias"):
            sd[f"{head}.{p}"] = getattr(backbone, head).state_dict()[p].numpy()
    ren = {"k": "k_linear", "v": "v_linear", "ln": "norm_k"}
    t_sd = {}
    for src, dst in ((tct, sd), (teacher_tct, t_sd)):
        for k, v in src.state_dict().items():
            if "." not in k:
                continue
            root, rest = k.split(".", 1)
            dst[f"transformers.{ren.get(root, root)}.{rest}"] = v.numpy()
    bb = import_backbone_2fc(sd, depth=18)
    student_vars = {
        "params": {"backbone": bb["params"],
                   "classifier": {"transformers": import_tct(sd, "transformers")}},
        "batch_stats": {"backbone": bb["batch_stats"]},
    }
    teacher_vars = {
        "params": {"classifier": {"transformers": import_tct(t_sd, "transformers")}},
    }
    return student_vars, teacher_vars


def _torch_trajectory(batches, bn_eval=False, double=False):
    """The reference's loop at our accumulation geometry: E episodes per
    optimizer step (backward accumulates, sum semantics), scheduler.step()
    every episode AFTER the optional optimizer step (trainwandb.py:141-145)."""
    backbone, tct, teacher_tct = _build_torch_models(double=double)
    if bn_eval:
        for m in backbone.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.eval()
    params = list(backbone.parameters()) + list(tct.parameters())
    opt = torch.optim.SGD(params, lr=LR)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[MILESTONE],
                                                 gamma=0.1)
    cfg_for_export = _make_cfg()

    def snapshot():
        sv, _ = _export_to_flax(backbone, tct, teacher_tct, cfg_for_export)
        # .numpy() views share storage with the live tensors SGD mutates
        return jax.tree_util.tree_map(np.copy, sv)

    losses, states = [], [snapshot()]
    for batch in batches:
        total = 0.0
        for e in range(E):
            ctx = torch.from_numpy(batch["ctx"][e]).permute(0, 1, 4, 2, 3)
            tgt = torch.from_numpy(batch["tgt"][e]).permute(0, 1, 4, 2, 3)
            labels = torch.from_numpy(batch["labels"][e]).long()
            qlabels = torch.from_numpy(batch["qlabels"][e]).long()
            # one fused context+target BN batch (our Student's forward)
            clips = torch.cat([ctx.reshape(S * T, 3, IMG, IMG),
                               tgt.reshape(Q * T, 3, IMG, IMG)], 0)
            f1, f2 = backbone(clips)
            c1, q1 = f1[:S], f1[S:]
            c2, q2 = f2[:S], f2[S:]
            kl = tct(c1, labels, q1)
            ce = tct(c2, labels, q2)
            sup = support_dk(c2, labels)
            with torch.no_grad():
                t_ctx = torch.from_numpy(batch["t_ctx"][e])
                t_tgt = torch.from_numpy(batch["t_tgt"][e])
                t_kl = teacher_tct(t_ctx, labels, t_tgt)
                t_sup = support_dk(t_ctx, labels)
            loss = (kd_loss(kl, t_kl) + 0.5 * dist_loss(sup, t_sup)
                    + F.cross_entropy(ce, qlabels) / TPB)
            loss.backward()
            total += float(loss)
            if e == E - 1:
                opt.step()
                opt.zero_grad()
            sched.step()
        losses.append(total)
        states.append(snapshot())
    return states, losses


def _jax_teacher_forced(cfg, batches, torch_states):
    """Run make_train_step teacher-forced against the torch trajectory: before
    step i the student params/batch_stats are RESET to the torch state after i
    updates, so every step is compared at identical inputs — locking the
    update semantics (grad-accum sum, SGD, LR-at-step-i, BN momentum/stat
    chaining) without the chaotic fp-noise amplification a free-running
    comparison suffers (observed ~5x error growth per step at this geometry).
    Returns per-step (loss, next_variables)."""
    _, teacher_vars = _export_to_flax(*_build_torch_models(), cfg)

    def to_batch(b):
        return EpisodeBatch(
            support_clips=jnp.asarray(b["ctx"]),
            support_labels=jnp.asarray(b["labels"]),
            query_clips=jnp.asarray(b["tgt"]),
            query_labels=jnp.asarray(b["qlabels"]),
            support_feats=jnp.asarray(b["t_ctx"]),
            query_feats=jnp.asarray(b["t_tgt"]),
        )

    state, _ = create_train_state(cfg, jax.random.key(0), to_batch(batches[0]),
                                  episodes_per_step=E)
    t_vars = {"params": teacher_vars["params"]}
    step = jax.jit(make_train_step(cfg))
    results = []
    for i, batch in enumerate(batches):
        state = state.replace(params=torch_states[i]["params"],
                              batch_stats=torch_states[i]["batch_stats"])
        state, metrics = step(state, t_vars, to_batch(batch))
        results.append((float(metrics["task_loss"]),
                        {"params": jax.tree_util.tree_map(np.asarray,
                                                          dict(state.params)),
                         "batch_stats": jax.tree_util.tree_map(
                             np.asarray, dict(state.batch_stats))}))
    return results


def _flat(d, prefix=""):
    out = {}
    for k, v in sorted(d.items()):
        if isinstance(v, dict):
            out.update(_flat(v, prefix + k + "/"))
        else:
            out[prefix + k] = np.asarray(v)
    return out


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["micro", "fused_freeze_bn"])
def test_trajectory_matches_torch(mode):
    rng = np.random.default_rng(42)
    batches = _make_data(rng, N_STEPS[mode])

    if mode == "micro":
        cfg = _make_cfg()
        cfg = cfg.replace(train=cfg.train.__class__(**{
            **cfg.train.__dict__, "micro_batch": 1}))
        t_states, t_losses = _torch_trajectory(batches, bn_eval=False)
    else:
        cfg = _make_cfg(freeze_bn=True)
        t_states, t_losses = _torch_trajectory(batches, bn_eval=True)

    results = _jax_teacher_forced(cfg, batches, t_states)

    # the torch trajectory itself must move (guard against a static run)
    assert np.std(t_losses) > 1e-3
    if mode == "micro":   # 12 steps cross the decay boundary (update 9)
        lr_decayed_updates = [u for u in range(1, N_STEPS[mode] + 1)
                              if MILESTONE <= u * E - 1]
        assert lr_decayed_updates, "geometry must cover the LR-decay boundary"

    for i, ((j_loss, j_next), t_loss) in enumerate(zip(results, t_losses)):
        # loss at IDENTICAL params: pure forward parity, very tight
        np.testing.assert_allclose(j_loss, t_loss, rtol=5e-5, atol=5e-5,
                                   err_msg=f"step {i} loss [{mode}]")
        # the update: params after step i vs torch's — catches any SGD / LR /
        # grad-accum drift (a wrong LR at the decay boundary is a 10x
        # mismatch in the update, far above this tolerance)
        want, got = _flat(t_states[i + 1]["params"]), _flat(j_next["params"])
        prev = _flat(t_states[i]["params"])
        assert set(got) == set(want)
        # Tolerance calibration: torch's OWN fp32 grads deviate from its f64
        # grads by 0.25% in global norm at this geometry (and some leaves,
        # e.g. the TCT v-bias, have ~zero gradient by cancellation), so two
        # independent fp32 backends legitimately differ by ~1%. Any semantic
        # error — dropped episode (50%), missed LR decay (900%) — is far
        # beyond these bounds.
        upd_sq = err_sq = 0.0
        for k in want:
            upd = float(np.linalg.norm(want[k] - prev[k]))
            err = float(np.linalg.norm(got[k] - want[k]))
            upd_sq += upd * upd
            err_sq += err * err
            assert err <= 1e-1 * upd + 1e-7, (
                f"step {i} param {k} [{mode}]: update norm {upd:.3e}, "
                f"deviation {err:.3e}")
        assert err_sq ** 0.5 <= 3e-2 * upd_sq ** 0.5 + 1e-7, (
            f"step {i} [{mode}]: global update norm {upd_sq ** 0.5:.3e}, "
            f"deviation {err_sq ** 0.5:.3e}")
        # the update must be non-trivial (params actually changed this step)
        assert upd_sq ** 0.5 > 1e-7, f"step {i}: torch made no update"

        if mode == "micro":
            # BN running stats after the step: mean tight; var carries the
            # flax-biased vs torch-unbiased batch-variance factor n/(n-1)
            # (n = 36 frames at the 1x1-spatial layer4 here → ≤3%)
            want_s, got_s = (_flat(t_states[i + 1]["batch_stats"]),
                             _flat(j_next["batch_stats"]))
            assert set(got_s) == set(want_s)
            for k in want_s:
                tol = dict(rtol=5e-3, atol=5e-4) if k.endswith("var") \
                    else dict(rtol=1e-4, atol=1e-5)
                np.testing.assert_allclose(got_s[k], want_s[k],
                                           err_msg=f"step {i} stat {k}", **tol)
        else:
            # freeze_bn: stats must be untouched
            want_s, got_s = (_flat(t_states[0]["batch_stats"]),
                             _flat(j_next["batch_stats"]))
            for k in want_s:
                np.testing.assert_allclose(got_s[k], want_s[k], rtol=1e-6,
                                           err_msg=f"step {i} frozen stat {k}")


@pytest.mark.slow
def test_student_free_running_trajectory_fp64():
    """Free-running float64 student-distill lock (VERDICT r2 item 4): both
    sides integrate their own SGD + MultiStepLR trajectory from the shared
    init across the decay boundary (update 9) — no teacher-forcing. The
    micro_batch path chains train-mode BN, whose BATCH stats feed the
    forward, so the documented biased/unbiased RUNNING-var gap never enters
    the loss; running stats are excluded from the final comparison for that
    reason (their means are compared tightly). 20 steps (not the MFM lock's
    50): each step is 2 episodes x 36 resnet18 frames fwd+bwd in fp64 on
    this 1-core box; chaos growth is what free-running certifies and 20
    steps past the decay boundary already amplifies any semantic error by
    orders of magnitude above these tolerances."""
    N = 20
    rng = np.random.default_rng(17)
    batches = _make_data(rng, N, dtype=np.float64)
    t_states, t_losses = _torch_trajectory(batches, double=True)
    assert np.std(t_losses) > 1e-6
    # geometry covers the decay boundary (update 9 of 20)
    assert any(MILESTONE <= u * E - 1 for u in range(1, N + 1))
    assert not all(MILESTONE <= u * E - 1 for u in range(1, N + 1))

    prev_x64 = jax.config.read("jax_enable_x64")
    jax.config.update("jax_enable_x64", True)
    try:
        base = _make_cfg()
        cfg = base.replace(
            model=base.model.__class__(**{
                **base.model.__dict__, "compute_dtype": "float64"}),
            train=base.train.__class__(**{
                **base.train.__dict__, "micro_batch": 1}))
        _, teacher_vars = _export_to_flax(
            *_build_torch_models(double=True), cfg)

        def to_batch(b):
            return EpisodeBatch(
                support_clips=jnp.asarray(b["ctx"]),
                support_labels=jnp.asarray(b["labels"]),
                query_clips=jnp.asarray(b["tgt"]),
                query_labels=jnp.asarray(b["qlabels"]),
                support_feats=jnp.asarray(b["t_ctx"]),
                query_feats=jnp.asarray(b["t_tgt"]),
            )

        state, _ = create_train_state(cfg, jax.random.key(0),
                                      to_batch(batches[0]),
                                      episodes_per_step=E)
        state = state.replace(
            params=jax.tree_util.tree_map(jnp.asarray,
                                          t_states[0]["params"]),
            batch_stats=jax.tree_util.tree_map(jnp.asarray,
                                               t_states[0]["batch_stats"]))
        t_vars = {"params": jax.tree_util.tree_map(jnp.asarray,
                                                   teacher_vars["params"])}
        step = jax.jit(make_train_step(cfg))
        our_losses = []
        for b in batches:
            state, metrics = step(state, t_vars, to_batch(b))
            our_losses.append(float(metrics["task_loss"]))

        np.testing.assert_allclose(our_losses, t_losses, rtol=1e-9,
                                   err_msg="free-running fp64 loss series")
        want = _flat(t_states[-1]["params"])
        got = _flat(jax.tree_util.tree_map(np.asarray, dict(state.params)))
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-8, atol=1e-11,
                                       err_msg=f"final param {k}")
        # running MEANS accumulate linearly in the batch means — tight;
        # vars carry torch's unbiased n/(n-1) factor and are excluded
        want_s = _flat(t_states[-1]["batch_stats"])
        got_s = _flat(jax.tree_util.tree_map(np.asarray,
                                             dict(state.batch_stats)))
        assert set(got_s) == set(want_s)
        for k in want_s:
            if k.endswith("mean"):
                np.testing.assert_allclose(got_s[k], want_s[k], rtol=1e-8,
                                           atol=1e-12,
                                           err_msg=f"final stat {k}")
    finally:
        jax.config.update("jax_enable_x64", prev_x64)


@pytest.mark.slow
def test_lr_decay_applied_at_same_update():
    """The per-episode MultiStepLR → per-batch conversion decays at the same
    optimizer update index as the reference's loop (schedule.py:15-19)."""
    from litemkd_tpu.train.schedule import multistep_lr
    sched = multistep_lr(LR, [MILESTONE], 0.1, E)
    # reference: at 1-based update u the scheduler has stepped u*E-1 times;
    # decayed iff MILESTONE <= u*E-1
    for u in range(1, 15):
        ref_lr = LR * (0.1 if MILESTONE <= u * E - 1 else 1.0)
        ours = float(sched(u - 1))
        np.testing.assert_allclose(ours, ref_lr, rtol=1e-6,
                                   err_msg=f"update {u}")
