"""Distillation losses vs torch.nn.functional golden values.

torch (CPU) is available in the image, so the KD/CE/DIST primitives are checked
against independently-written torch expressions — the same functional calls the
reference relies on, assembled here from the math spec.
"""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from litemkd_tpu.config import DistillConfig
from litemkd_tpu.distill import (kd_loss, softmax_ce, inter_class_relation,
                                 get_distiller, available, merge_logits)

rng = np.random.default_rng(0)
S = rng.normal(size=(20, 5)).astype(np.float32) * 3
T = rng.normal(size=(20, 5)).astype(np.float32) * 3
SUP_S = rng.normal(size=(5, 4)).astype(np.float32)
SUP_T = rng.normal(size=(5, 4)).astype(np.float32)
LABELS = rng.integers(0, 5, size=20).astype(np.int32)
CFG = DistillConfig()


def torch_kd(s, t, temp):
    lp = F.log_softmax(torch.tensor(s) / temp, dim=1)
    p = F.softmax(torch.tensor(t) / temp, dim=1)
    return (F.kl_div(lp, p, reduction="none").sum(1).mean() * temp ** 2).item()


def torch_ce(s, labels):
    return F.cross_entropy(torch.tensor(s), torch.tensor(labels).long()).item()


def torch_dist(s, t):
    ys = torch.tensor(s).softmax(dim=1)
    yt = torch.tensor(t).softmax(dim=1)
    xc, yc = ys - ys.mean(1, keepdim=True), yt - yt.mean(1, keepdim=True)
    pear = (xc * yc).sum(1) / (xc.norm(dim=1) * yt.sub(yt.mean(1, keepdim=True)).norm(dim=1) + 1e-8)
    return (1 - pear.mean()).item()


def test_kd_loss_matches_torch():
    for temp in (1.0, 4.0):
        got = float(kd_loss(jnp.asarray(S), jnp.asarray(T), temp))
        want = torch_kd(S, T, temp)
        assert abs(got - want) < 1e-5, (got, want)


def test_softmax_ce_matches_torch():
    got = float(softmax_ce(jnp.asarray(S), jnp.asarray(LABELS)))
    assert abs(got - torch_ce(S, LABELS)) < 1e-5


def test_inter_class_relation_matches_torch():
    got = float(inter_class_relation(jnp.asarray(SUP_S), jnp.asarray(SUP_T)))
    assert abs(got - torch_dist(SUP_S, SUP_T)) < 1e-5


def test_fc_2_sup_dist_composition():
    """Main paper loss = kd(kl) + 0.5*DIST(sup) + CE(ce)/tpb."""
    student = {"kl": jnp.asarray(S), "ce": jnp.asarray(S * 0.5),
               "sup": jnp.asarray(SUP_S)}
    teacher = {"kl": jnp.asarray(T), "sup": jnp.asarray(SUP_T)}
    out = get_distiller("fc_2_sup_dist")(student, teacher, jnp.asarray(LABELS), CFG, 16)
    want = (torch_kd(S, T, CFG.temperature)
            + 0.5 * torch_dist(SUP_S, SUP_T)
            + torch_ce(S * 0.5, LABELS) / 16)
    assert abs(float(out["loss"]) - want) < 1e-4


def test_kd_combo():
    out = get_distiller("KD")(jnp.asarray(S), jnp.asarray(T), jnp.asarray(LABELS), CFG, 16)
    want = CFG.hard_loss_weight * torch_ce(S, LABELS) / 16 + \
        CFG.soft_loss_weight * torch_kd(S, T, CFG.temperature)
    assert abs(float(out["loss"]) - want) < 1e-4


def test_registry_covers_reference_zoo():
    expected = {"KD", "wsl", "ce", "support_sim", "KL_feature", "fc_2", "fc_2_wsl",
                "strm", "strm_KD", "fc_2_sup", "Dist_KD", "fc_2_sup_dist",
                "fc_2_sup_kl", "fc_2_sup_dist_cece", "fc_2_sup_klklcece",
                "fc_2_sup_distdistcece", "fc_2_sup_2", "fc_2_sup_disver",
                "fc_2_sup_dist_wsl", "strm_fc_2_sup_dist", "strm_1fc_sup",
                "fc_1_sup", "fc_sup", "e_dist_1fc_sup"}
    assert expected.issubset(set(available()))


@pytest.mark.parametrize("name", ["fc_2_sup_dist", "fc_2_sup_kl", "fc_2_sup_dist_cece",
                                  "fc_2_sup_klklcece", "fc_2_sup_distdistcece",
                                  "fc_2_sup_disver", "fc_2_sup_dist_wsl", "fc_2_sup",
                                  "fc_1_sup", "fc_sup", "e_dist_1fc_sup"])
def test_sup_family_finite(name):
    student = {"kl": jnp.asarray(S), "ce": jnp.asarray(S * 0.5),
               "sup": jnp.asarray(SUP_S),
               "sup_kl": jnp.asarray(SUP_S), "sup_ce": jnp.asarray(SUP_S)}
    teacher = {"kl": jnp.asarray(T), "sup": jnp.asarray(SUP_T)}
    out = get_distiller(name)(student, teacher, jnp.asarray(LABELS), CFG, 16)
    assert np.isfinite(float(out["loss"]))


def test_merge_logits_rules():
    d = {"kl": jnp.asarray(S), "ce": jnp.asarray(T), "sup": jnp.asarray(SUP_S)}
    np.testing.assert_allclose(np.asarray(merge_logits("fc_2_sup_dist", d)),
                               S + T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(merge_logits("ce", jnp.asarray(S))), S)
    strm_d = {"pat": jnp.asarray(S), "fr": jnp.asarray(T)}
    np.testing.assert_allclose(np.asarray(merge_logits("strm", strm_d)),
                               0.1 * S + T, rtol=1e-5)


@pytest.mark.parametrize("name", available())
def test_every_distiller_jits_and_vmaps(name):
    """Each registered loss works under jit + vmap over an episode batch."""
    import jax
    E, Q, W = 3, 20, 5
    r = np.random.default_rng(1)
    arr = lambda *s: jnp.asarray(r.normal(size=s).astype(np.float32))
    labels = jnp.asarray(np.tile(rng.integers(0, W, size=Q), (E, 1)).astype(np.int32))
    plain_s, plain_t = arr(E, Q, W), arr(E, Q, W)
    dict_s = {"kl": arr(E, Q, W), "ce": arr(E, Q, W), "sup": arr(E, W, W - 1),
              "sup_kl": arr(E, W, W - 1), "sup_ce": arr(E, W, W - 1),
              "fc_1": arr(E, Q, W), "fc_2": arr(E, Q, W),
              "pat": arr(E, Q, W), "fr": arr(E, Q, W),
              "fr1": arr(E, Q, W), "fr2": arr(E, Q, W),
              "logits": arr(E, Q, W), "feature": arr(E, Q, 8),
              "query": arr(E, Q, W), "support_set": arr(E, Q, W, W)}
    dict_t = {"kl": arr(E, Q, W), "sup": arr(E, W, W - 1),
              "logits": arr(E, Q, W), "feature": arr(E, Q, 8),
              "query": arr(E, Q, W), "support_set": arr(E, Q, W, W)}
    fn = get_distiller(name)
    dict_teacher_names = {
        "support_sim", "KL_feature", "fc_2_sup", "fc_2_sup_dist", "fc_2_sup_kl",
        "fc_2_sup_dist_cece", "fc_2_sup_klklcece", "fc_2_sup_distdistcece",
        "fc_2_sup_2", "fc_2_sup_disver", "fc_2_sup_dist_wsl",
        "strm_fc_2_sup_dist", "strm_1fc_sup", "fc_1_sup", "fc_sup",
        "e_dist_1fc_sup"}
    dict_student_names = dict_teacher_names | {"fc_2", "fc_2_wsl", "strm",
                                               "strm_KD", "strm_expert"}
    s_in = dict_s if name in dict_student_names else plain_s
    t_in = dict_t if name in dict_teacher_names else plain_t

    @jax.jit
    def batch_loss(s, t, l):
        per = jax.vmap(lambda a, b, c: fn(a, b, c, CFG, 16))(s, t, l)
        return per["loss"].sum()

    out = float(batch_loss(s_in, t_in, labels))
    assert np.isfinite(out), (name, out)


def test_expert_losses_match_run_py_semantics():
    """run.py's expert losses: TRXLoss (LossBuilder.py:24-38) divides by
    tasks_per_batch INTERNALLY and run.py:312 divides again → sum-CE/tpb²;
    CELoss is mean-CE divided once; the CNN_STRM joint adds 0.1× the patch
    term (run.py:312-318). Golden-checked against torch transcriptions."""
    tpb = 16

    def torch_trxloss(logits, labels):
        lp = -F.cross_entropy(torch.tensor(logits),
                              torch.tensor(labels).long(), reduction="none")
        # logsumexp over NUM_SAMPLES=1 == identity (LossBuilder.py:33-37)
        return float(-lp.sum() / tpb / tpb)     # internal /tpb + run.py:312

    out = get_distiller("TRXLoss")(jnp.asarray(S), None, jnp.asarray(LABELS),
                                   CFG, tpb)
    np.testing.assert_allclose(float(out["loss"]), torch_trxloss(S, LABELS),
                               rtol=1e-5)

    out = get_distiller("CELoss")(jnp.asarray(S), None, jnp.asarray(LABELS),
                                  CFG, tpb)
    np.testing.assert_allclose(float(out["loss"]), torch_ce(S, LABELS) / tpb,
                               rtol=1e-5)

    PAT = rng.normal(size=(20, 5)).astype(np.float32)
    out = get_distiller("strm_expert")({"fr": jnp.asarray(S),
                                        "pat": jnp.asarray(PAT)}, None,
                                       jnp.asarray(LABELS), CFG, tpb)
    expect = torch_trxloss(S, LABELS) + 0.1 * torch_trxloss(PAT, LABELS)
    np.testing.assert_allclose(float(out["loss"]), expect, rtol=1e-5)
    # eval-time logit merge for the joint head (run.py:318)
    merged = merge_logits("strm_expert", {"fr": jnp.asarray(S),
                                          "pat": jnp.asarray(PAT)})
    np.testing.assert_allclose(np.asarray(merged), S + 0.1 * PAT, rtol=1e-6)
