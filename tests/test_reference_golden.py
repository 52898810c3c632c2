"""Golden parity against the reference's OWN executing modules.

Every other numeric test in this suite compares against torch transcriptions
written for this repo; these tests instead import `/root/reference`'s modules
through tests/refexec.py (cuda-shimmed) and assert our outputs match the
reference's own forward/loss bytecode. This retires transcription-drift risk
(VERDICT r2 items 1 and 8). Skips when the reference mount is absent.
"""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

import refexec
from refexec import requires_reference, t2n

from litemkd_tpu.config import DistillConfig
from litemkd_tpu.distill import get_distiller
from litemkd_tpu.ops import TemporalCrossTransformer
from litemkd_tpu.tools import import_tct

pytestmark = requires_reference

WAY, SHOT, Q, T, D = 5, 5, 20, 8, 2048
RNG = np.random.default_rng(7)
LABELS = np.repeat(np.arange(WAY), SHOT).astype(np.int64)
Q_LABELS = np.tile(np.arange(WAY), Q // WAY).astype(np.int64)


def _episode(scale=1.0, d=D):
    sup = (RNG.normal(size=(WAY * SHOT, T, d)) * scale).astype(np.float32)
    qry = (RNG.normal(size=(Q, T, d)) * scale).astype(np.float32)
    return sup, qry


def _tct_sd(module, prefix="transformers"):
    """Reference TCT state dict → flat numpy dict under `prefix`."""
    return {f"{prefix}.{k}": t2n(v) for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# TemporalCrossTransformer + TRX_2fcsup forward (TRX_2fcsup.py:74-224)
# ---------------------------------------------------------------------------

def test_tct_forward_matches_reference():
    """Our TCT == the reference's executing TemporalCrossTransformer
    (TRX_2fcsup.py:50-160) with imported weights, eval mode."""
    ns = refexec.student_half()
    args = refexec.student_args(ns)
    torch.manual_seed(11)
    ref = ns.model_classifiers.TRX_2fcsup(args).eval()
    tct = ref.transformers

    sup, qry = _episode()
    with torch.no_grad():
        want = t2n(tct(torch.tensor(sup), torch.tensor(LABELS),
                       torch.tensor(qry))["logits"])

    params = import_tct(_tct_sd(tct), "transformers")
    m = TemporalCrossTransformer(way=WAY, shot=SHOT, seq_len=T, in_dim=D,
                                 out_dim=args.trans_linear_out_dim)
    got = np.asarray(m.apply({"params": params}, jnp.asarray(sup),
                             jnp.asarray(LABELS), jnp.asarray(qry),
                             train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=5e-4)


def test_trx_2fcsup_forward_matches_reference():
    """Full student head {kl, ce, sup} vs the reference's TRX_2fcsup.forward
    (TRX_2fcsup.py:205-224), shared TCT weights."""
    from litemkd_tpu.models.classifiers.trx import TRX_2fcsup

    ns = refexec.student_half()
    args = refexec.student_args(ns)
    torch.manual_seed(12)
    ref = ns.model_classifiers.TRX_2fcsup(args).eval()

    s1, q1 = _episode()
    s2, q2 = _episode(scale=2.0)
    ctx = {"context_features_1": torch.tensor(s1),
           "context_features_2": torch.tensor(s2)}
    tgt = {"target_features_1": torch.tensor(q1),
           "target_features_2": torch.tensor(q2)}
    with torch.no_grad():
        want = ref(ctx, torch.tensor(LABELS), tgt)["logits"]

    params = {"transformers": import_tct(_tct_sd(ref.transformers),
                                         "transformers")}
    m = TRX_2fcsup(way=WAY, shot=SHOT, seq_len=T, in_dim=D, out_dim=1152)
    got = m.apply({"params": params},
                  {"f1": jnp.asarray(s1), "f2": jnp.asarray(s2)},
                  jnp.asarray(LABELS),
                  {"f1": jnp.asarray(q1), "f2": jnp.asarray(q2)},
                  train=False)
    for key, tol in (("kl", 5e-4), ("ce", 5e-4), ("sup", 5e-4)):
        np.testing.assert_allclose(np.asarray(got[key]), t2n(want[key]),
                                   rtol=2e-4, atol=tol, err_msg=key)


def test_trx_2fcsup_fixed_teacher_matches_reference():
    """Teacher head (single fused stream) vs TRX_2fcsup_fixed.forward
    (TRX_2fcsup.py:226-256)."""
    from litemkd_tpu.models.classifiers.trx import TRX_2fcsup_fixed

    ns = refexec.student_half()
    args = refexec.student_args(ns)
    torch.manual_seed(13)
    ref = ns.model_classifiers.TRX_2fcsup_fixed(args).eval()

    sup, qry = _episode()
    with torch.no_grad():
        want = ref(torch.tensor(sup), torch.tensor(LABELS),
                   torch.tensor(qry))["logits"]

    params = {"transformers": import_tct(_tct_sd(ref.transformers),
                                         "transformers")}
    m = TRX_2fcsup_fixed(way=WAY, shot=SHOT, seq_len=T, in_dim=D, out_dim=1152)
    got = m.apply({"params": params}, jnp.asarray(sup), jnp.asarray(LABELS),
                  jnp.asarray(qry), train=False)
    np.testing.assert_allclose(np.asarray(got["kl"]), t2n(want["kl"]),
                               rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got["sup"]), t2n(want["sup"]),
                               rtol=2e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# Distiller audit: every named loss, full returned dict (distillers.py:34-738)
# ---------------------------------------------------------------------------

ALL_DISTILLERS = [
    "KD", "wsl", "ce", "support_sim", "KL_feature", "fc_2", "fc_2_wsl",
    "strm", "strm_KD", "fc_2_sup", "Dist_KD", "fc_2_sup_dist", "fc_2_sup_kl",
    "fc_2_sup_dist_cece", "fc_2_sup_klklcece", "fc_2_sup_distdistcece",
    "fc_2_sup_2", "fc_2_sup_disver", "fc_2_sup_dist_wsl",
    "strm_fc_2_sup_dist", "strm_1fc_sup", "fc_1_sup", "fc_sup",
    "e_dist_1fc_sup",
]

# which names receive dict-valued logits (mirrors trainwandb.py's model zoo
# head outputs; same sets as tests/test_distill.py)
DICT_TEACHER = {
    "support_sim", "KL_feature", "fc_2_sup", "fc_2_sup_dist", "fc_2_sup_kl",
    "fc_2_sup_dist_cece", "fc_2_sup_klklcece", "fc_2_sup_distdistcece",
    "fc_2_sup_2", "fc_2_sup_disver", "fc_2_sup_dist_wsl",
    "strm_fc_2_sup_dist", "strm_1fc_sup", "fc_1_sup", "fc_sup",
    "e_dist_1fc_sup"}
DICT_STUDENT = DICT_TEACHER | {"fc_2", "fc_2_wsl", "strm", "strm_KD"}


def _audit_inputs():
    r = np.random.default_rng(3)
    arr = lambda *s: (r.normal(size=s) * 2).astype(np.float32)
    student = {
        "kl": arr(Q, WAY), "ce": arr(Q, WAY), "sup": arr(WAY, WAY - 1),
        "sup_kl": arr(WAY, WAY - 1), "sup_ce": arr(WAY, WAY - 1),
        "fc_1": arr(Q, WAY), "fc_2": arr(Q, WAY),
        "pat": arr(Q, WAY), "fr": arr(Q, WAY),
        "fr1": arr(Q, WAY), "fr2": arr(Q, WAY),
        "logits": arr(Q, WAY), "feature": arr(WAY * SHOT + Q, T, 32),
        "query": arr(Q, WAY), "support_set": arr(Q, WAY, WAY),
    }
    teacher = {
        "kl": arr(Q, WAY), "sup": arr(WAY, WAY - 1),
        "logits": arr(Q, WAY), "feature": arr(WAY * SHOT + Q, T, 32),
        "query": arr(Q, WAY), "support_set": arr(Q, WAY, WAY),
    }
    plain_s, plain_t = arr(Q, WAY), arr(Q, WAY)
    return student, teacher, plain_s, plain_t


def _to_torch(x):
    if isinstance(x, dict):
        return {k: torch.tensor(v) for k, v in x.items()}
    return torch.tensor(x)


def _to_jnp(x):
    if isinstance(x, dict):
        return {k: jnp.asarray(v) for k, v in x.items()}
    return jnp.asarray(x)


@pytest.mark.parametrize("name", ALL_DISTILLERS)
def test_distiller_full_dict_matches_reference(name):
    """Every entry of the reference Distiller's returned dict (not just
    'loss') must match our registered loss — including the bug-faithful
    quirks (e.g. fc_2_sup reports 0.01*sup in hard_loss but uses 0.1*sup in
    the loss, distillers.py:273/283)."""
    ns = refexec.student_half()
    args = refexec.student_args(ns)  # carries the reference's default cfg dict
    ref = ns.distillers.Distiller(name, args.cfg, torch.device("cpu"))

    student, teacher, plain_s, plain_t = _audit_inputs()
    s_in = student if name in DICT_STUDENT else plain_s
    t_in = teacher if name in DICT_TEACHER else plain_t
    labels = torch.tensor(Q_LABELS)

    want = getattr(ref, name)(_to_torch(s_in), _to_torch(t_in), labels)

    cfg = DistillConfig(name=name, **{k: float(v) for k, v in args.cfg.items()
                                      if k in DistillConfig.__dataclass_fields__
                                      and k != "name"})
    got = get_distiller(name)(_to_jnp(s_in), _to_jnp(t_in),
                              jnp.asarray(Q_LABELS.astype(np.int32)), cfg, 16)

    missing = [k for k in want if k not in got]
    assert not missing, f"{name}: ours lacks reference dict entries {missing}"
    for k, v in want.items():
        np.testing.assert_allclose(
            float(got[k]), float(v.detach()), rtol=3e-5, atol=1e-6,
            err_msg=f"{name}[{k}]")
