"""STRM backbone/classifier tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from litemkd_tpu import preset
from litemkd_tpu.ops.strm import STRMDistance, MLPMixEnrich, SelfAttnBot
from litemkd_tpu.models import Student

WAY, SHOT, QPC, T, D = 3, 2, 2, 4, 32


def test_strm_distance_semantics():
    """A query identical to a support video of class c gets 0 distance → the
    max (least-negative) logit at c."""
    rng = np.random.default_rng(0)
    support = rng.normal(size=(WAY * SHOT, T, D)).astype(np.float32)
    labels = np.repeat(np.arange(WAY), SHOT).astype(np.int32)
    queries = support[SHOT][None].copy()  # a class-1 support video
    m = STRMDistance(way=WAY, shot=SHOT, seq_len=T, in_dim=D)
    v = m.init(jax.random.key(0), jnp.asarray(support), jnp.asarray(labels),
               jnp.asarray(queries), train=False)
    out = m.apply(v, jnp.asarray(support), jnp.asarray(labels),
                  jnp.asarray(queries), train=False)
    assert out.shape == (1, WAY)
    assert int(jnp.argmax(out[0])) == 1
    np.testing.assert_allclose(float(out[0, 1]), 0.0, atol=1e-3)


def test_enrich_blocks_shapes():
    x = jnp.zeros((5, T, D))
    m = MLPMixEnrich(D, T)
    v = m.init(jax.random.key(0), x, train=False)
    assert m.apply(v, x, train=False).shape == (5, T, D)
    p = jnp.zeros((5, 16, D))
    a = SelfAttnBot(D, 16)
    va = a.init(jax.random.key(0), p, train=False)
    assert a.apply(va, p, train=False).shape == (5, 16, D)


def test_strm_student_forward():
    base = preset("tiny")
    cfg = base.replace(model=base.model.__class__(
        backbone="strm18_student", classifier="strm_res18_sup",
        trans_linear_in_dim=base.model.trans_linear_in_dim,
        trans_linear_out_dim=base.model.trans_linear_out_dim))
    ep = cfg.episode
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.integers(0, 255, size=(ep.n_support, ep.seq_len,
                                                 ep.img_size, ep.img_size, 3),
                                   dtype=np.uint8))
    tgt = jnp.asarray(rng.integers(0, 255, size=(ep.n_queries(True), ep.seq_len,
                                                 ep.img_size, ep.img_size, 3),
                                   dtype=np.uint8))
    labels = jnp.asarray(np.repeat(np.arange(ep.way), ep.shot).astype(np.int32))
    model = Student(cfg)
    v = model.init(jax.random.key(0), ctx, labels, tgt, train=False)
    out = model.apply(v, ctx, labels, tgt, train=False)
    assert set(out["logits"]) == {"pat", "fr1", "fr2", "sup"}
    assert out["logits"]["pat"].shape == (ep.n_queries(True), ep.way)
    assert np.isfinite(np.asarray(out["logits"]["pat"])).all()
