"""Pallas TCT attention kernel vs the XLA einsum path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from litemkd_tpu.ops import pallas_tct as pt

Q, U, DK, W, S = 6, 6, 128, 3, 2


@pytest.fixture()
def inputs():
    rng = np.random.default_rng(0)
    q_k = jnp.asarray(rng.normal(size=(Q, U, DK)).astype(np.float32))
    q_v = jnp.asarray(rng.normal(size=(Q, U, DK)).astype(np.float32))
    c_k = jnp.asarray(rng.normal(size=(W, S, U, DK)).astype(np.float32))
    c_v = jnp.asarray(rng.normal(size=(W, S, U, DK)).astype(np.float32))
    return q_k, q_v, c_k, c_v


def test_pallas_matches_xla_forward(inputs, monkeypatch):
    # _INTERPRET alone must both enable off-TPU dispatch AND reach the
    # pallas_call (regression: the flag once gated dispatch only, so
    # flipping it off-TPU died at Mosaic lowering)
    monkeypatch.setattr(pt, "_INTERPRET", True)
    want = pt.tct_attention_xla(*inputs)
    got = pt.tct_attention_pallas(*inputs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_gradients_match_xla(inputs, monkeypatch):
    monkeypatch.setattr(pt, "_INTERPRET", True)

    def loss_fused(qk, qv, ck, cv):
        return jnp.sum(pt._tct_attention_fused(qk, qv, ck, cv) ** 2)

    def loss_xla(qk, qv, ck, cv):
        return jnp.sum(pt.tct_attention_xla(qk, qv, ck, cv) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*inputs)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*inputs)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_tct_module_pallas_flag_matches(monkeypatch, inputs):
    """Whole-module parity: use_pallas=True (interpret) vs default path."""
    monkeypatch.setattr(pt, "_INTERPRET", True)   # dispatcher takes the kernel
    from litemkd_tpu.ops import TemporalCrossTransformer
    rng = np.random.default_rng(1)
    way, shot, t, d = 3, 2, 4, 64
    support = jnp.asarray(rng.normal(size=(way * shot, t, d)).astype(np.float32))
    labels = jnp.asarray(np.repeat(np.arange(way), shot).astype(np.int32))
    queries = jnp.asarray(rng.normal(size=(4, t, d)).astype(np.float32))
    m1 = TemporalCrossTransformer(way=way, shot=shot, seq_len=t, in_dim=d,
                                  out_dim=128, use_pallas=False)
    m2 = TemporalCrossTransformer(way=way, shot=shot, seq_len=t, in_dim=d,
                                  out_dim=128, use_pallas=True)
    v = m1.init(jax.random.key(0), support, labels, queries, train=False)
    out1 = m1.apply(v, support, labels, queries, train=False)
    out2 = m2.apply(v, support, labels, queries, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-4, atol=1e-4)


def test_way_beyond_lane_width_falls_back_to_xla(monkeypatch):
    """The kernel's one-hot lane accumulation addresses 128 output lanes;
    n_way > 128 must route to the einsum path instead of returning zeros
    for the classes beyond lane 127."""
    calls = []
    monkeypatch.setattr(pt, "_INTERPRET", True)   # off-TPU kernel dispatch on
    monkeypatch.setattr(pt, "_tct_attention_fused",
                        lambda *a: calls.append(a) or pt.tct_attention_xla(*a))
    rng = np.random.default_rng(2)
    w = pt._LANES + 2
    q_k = jnp.asarray(rng.normal(size=(2, U, DK)).astype(np.float32))
    q_v = jnp.asarray(rng.normal(size=(2, U, DK)).astype(np.float32))
    c_k = jnp.asarray(rng.normal(size=(w, 1, U, DK)).astype(np.float32))
    c_v = jnp.asarray(rng.normal(size=(w, 1, U, DK)).astype(np.float32))
    got = pt.tct_attention(q_k, q_v, c_k, c_v, use_pallas=True)
    assert not calls, "n_way > 128 must not reach the Pallas kernel"
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(pt.tct_attention_xla(q_k, q_v, c_k, c_v)),
        rtol=1e-5, atol=1e-5)
    small = pt.tct_attention(q_k, q_v, c_k[:3], c_v[:3], use_pallas=True)
    assert calls, "n_way <= 128 still takes the Pallas kernel"
    np.testing.assert_allclose(
        np.asarray(small),
        np.asarray(pt.tct_attention_xla(q_k, q_v, c_k[:3], c_v[:3])),
        rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("q", [3, 11, 25])
def test_pallas_ragged_query_counts(monkeypatch, q):
    """Grid tiling pads the last query chunk (q % 8 != 0) without corrupting
    real rows, and a vmapped episode batch (the nn.vmap path that blew the
    VMEM budget at micro_batch>=8) matches the XLA path per episode."""
    monkeypatch.setattr(pt, "_INTERPRET", True)
    rng = np.random.default_rng(q)
    E = 3
    q_k = jnp.asarray(rng.normal(size=(E, q, U, DK)).astype(np.float32))
    q_v = jnp.asarray(rng.normal(size=(E, q, U, DK)).astype(np.float32))
    c_k = jnp.asarray(rng.normal(size=(E, W, S, U, DK)).astype(np.float32))
    c_v = jnp.asarray(rng.normal(size=(E, W, S, U, DK)).astype(np.float32))
    got = jax.vmap(pt.tct_attention_pallas)(q_k, q_v, c_k, c_v)
    want = jax.vmap(pt.tct_attention_xla)(q_k, q_v, c_k, c_v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_off_tpu_dispatch_falls_back_to_xla(monkeypatch, inputs):
    """use_pallas=True on a CPU backend must take the einsum path (the
    kernel cannot lower off-TPU) instead of crashing at pallas lowering."""
    calls = []
    monkeypatch.setattr(pt, "_tct_attention_fused",
                        lambda *a: calls.append(a))
    got = pt.tct_attention(*inputs, use_pallas=True)
    assert not calls, "CPU backend must not reach the Pallas kernel"
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(pt.tct_attention_xla(*inputs)),
                               rtol=1e-5, atol=1e-5)
