"""OTAM soft-DTW alignment tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from litemkd_tpu.ops.otam import otam_cum_dist, otam_logits

WAY, SHOT, T, D = 3, 2, 4, 16


def naive_cum_dist(dists, lbda=0.1):
    """Direct scalar transcription of the recursion (independent of the
    vectorized implementation): row 0 plain sum, col 0 fixed at zero, banded
    soft-min elsewhere."""
    q, s, L, M = dists.shape
    d = np.pad(dists, ((0, 0), (0, 0), (0, 0), (1, 1)))
    Mp = M + 2
    out = np.zeros((q, s))
    for qi in range(q):
        for si in range(s):
            c = np.zeros((L, Mp))
            for m in range(1, Mp):
                c[0, m] = d[qi, si, 0, m] + c[0, m - 1]
            for l in range(1, L):
                def sm(*xs):
                    return -lbda * np.log(sum(np.exp(-x / lbda) for x in xs))
                c[l, 1] = d[qi, si, l, 1] + sm(c[l - 1, 0], c[l - 1, 1], c[l, 0])
                for m in range(2, Mp - 1):
                    c[l, m] = d[qi, si, l, m] + sm(c[l - 1, m - 1], c[l, m - 1])
                c[l, Mp - 1] = d[qi, si, l, Mp - 1] + sm(
                    c[l - 1, Mp - 2], c[l - 1, Mp - 1], c[l, Mp - 2])
            out[qi, si] = c[-1, -1]
    return out


def test_cum_dist_matches_naive():
    rng = np.random.default_rng(0)
    dists = rng.uniform(0, 2, size=(3, 4, T, T)).astype(np.float32)
    got = np.asarray(otam_cum_dist(jnp.asarray(dists)))
    want = naive_cum_dist(dists)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_identical_video_wins():
    rng = np.random.default_rng(1)
    support = rng.normal(size=(WAY * SHOT, T, D)).astype(np.float32)
    labels = np.repeat(np.arange(WAY), SHOT).astype(np.int32)
    queries = support[2 * SHOT][None].copy()   # class-2 support video
    logits = otam_logits(jnp.asarray(support), jnp.asarray(labels),
                         jnp.asarray(queries), WAY, SHOT)
    assert logits.shape == (1, WAY)
    assert int(np.argmax(np.asarray(logits)[0])) == 2
    # softmax output sums to 1
    np.testing.assert_allclose(np.asarray(logits).sum(), 1.0, rtol=1e-5)


def test_otam_classifier_registered():
    from litemkd_tpu import preset
    from litemkd_tpu.models import make_classifier
    import jax
    base = preset("tiny")
    cfg = base.replace(model=base.model.__class__(
        backbone="resnet18_gap", classifier="OTAM",
        trans_linear_in_dim=base.model.trans_linear_in_dim,
        trans_linear_out_dim=base.model.trans_linear_out_dim))
    head = make_classifier("OTAM", cfg)
    rng = np.random.default_rng(0)
    ep = cfg.episode
    support = jnp.asarray(rng.normal(size=(ep.n_support, ep.seq_len, D)).astype(np.float32))
    labels = jnp.asarray(np.repeat(np.arange(ep.way), ep.shot).astype(np.int32))
    queries = jnp.asarray(rng.normal(size=(2, ep.seq_len, D)).astype(np.float32))
    v = head.init(jax.random.key(0), support, labels, queries, False)
    out = head.apply(v, support, labels, queries, False)
    assert out.shape == (2, ep.way)


def test_cos_sim_reference_semantics_and_nan_guard():
    """cos uses the reference's x·y/(|x||y|+0.01) (model.py:3260-3268) and a
    NaN support episode returns zero logits with finite gradients
    (model.py:3321-3324)."""
    import jax
    rng = np.random.default_rng(2)
    support = rng.normal(size=(WAY * SHOT, T, D)).astype(np.float32)
    labels = np.repeat(np.arange(WAY), SHOT).astype(np.int32)
    queries = rng.normal(size=(2, T, D)).astype(np.float32)

    # independent transcription of the logits with reference cos semantics
    qf = queries.reshape(-1, D)
    sf = support.reshape(-1, D)
    sim = (qf @ sf.T) / (np.linalg.norm(qf, axis=-1, keepdims=True)
                         @ np.linalg.norm(sf, axis=-1, keepdims=True).T + 0.01)
    dists = 1 - sim.reshape(2, T, WAY * SHOT, T).transpose(0, 2, 1, 3)
    cum = (naive_cum_dist(dists) +
           naive_cum_dist(dists.transpose(0, 1, 3, 2)))
    class_d = cum.reshape(2, WAY, SHOT).mean(-1)
    e = np.exp(-class_d - (-class_d).max(-1, keepdims=True))
    want = e / e.sum(-1, keepdims=True)
    got = np.asarray(otam_logits(jnp.asarray(support), jnp.asarray(labels),
                                 jnp.asarray(queries), WAY, SHOT))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # NaN guard: zero logits, finite grads
    bad = support.copy()
    bad[0, 0, 0] = np.nan
    out = np.asarray(otam_logits(jnp.asarray(bad), jnp.asarray(labels),
                                 jnp.asarray(queries), WAY, SHOT))
    np.testing.assert_array_equal(out, 0.0)
    g = jax.grad(lambda s: jnp.sum(otam_logits(
        s, jnp.asarray(labels), jnp.asarray(queries), WAY, SHOT)))(
        jnp.asarray(bad))
    assert np.isfinite(np.asarray(g)).all()


def test_softmin_stable_at_large_cumulative_distances():
    """Dissimilar 8-frame videos push cumulative distances past ~8.7, where
    the naive exp(-x/0.1) underflows to 0 in fp32 and -λ·log(0) = +inf; the
    min-subtracted LSE keeps cells finite (identical value in real
    arithmetic)."""
    d = jnp.full((2, 3, 8, 8), 2.0, jnp.float32)
    cum = np.asarray(otam_cum_dist(d))
    assert np.isfinite(cum).all()
    # soft-min sits just below the 8-step hard-min diagonal (16), reduced by
    # up to λ·log(k) of smoothing per step
    assert (cum > 14.0).all() and (cum <= 16.0).all()


def test_query_nan_propagates_support_nan_zeroes():
    """Reference parity (model.py:3321-3324): NaN in SUPPORT → zero logits
    (guarded); NaN in QUERY propagates loudly instead of being silently
    zero-filled."""
    rng = np.random.default_rng(0)
    sup = rng.normal(size=(6, 4, 16)).astype(np.float32)
    qry = rng.normal(size=(4, 4, 16)).astype(np.float32)
    labels = np.repeat(np.arange(3), 2).astype(np.int32)

    bad_q = qry.copy()
    bad_q[0, 0, 0] = np.nan
    out = np.asarray(otam_logits(jnp.asarray(sup), jnp.asarray(labels),
                                 jnp.asarray(bad_q), way=3, shot=2))
    assert np.isnan(out[0]).any()

    bad_s = sup.copy()
    bad_s[0, 0, 0] = np.nan
    out = np.asarray(otam_logits(jnp.asarray(bad_s), jnp.asarray(labels),
                                 jnp.asarray(qry), way=3, shot=2))
    np.testing.assert_array_equal(out, np.zeros_like(out))
