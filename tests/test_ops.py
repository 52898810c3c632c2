import numpy as np
import jax
import jax.numpy as jnp
import pytest

from litemkd_tpu.ops import (TemporalCrossTransformer, tuple_indices, gather_tuples,
                             support_dk_logits, edist_logits, class_sort)
from tests.reference_numpy import (tct_reference, support_dk_reference,
                                   edist_reference)

WAY, SHOT, QPC, T, D, DK = 5, 5, 4, 8, 64, 48


def make_episode(rng, way=WAY, shot=SHOT, qpc=QPC, t=T, d=D):
    support = rng.normal(size=(way * shot, t, d)).astype(np.float32)
    queries = rng.normal(size=(way * qpc, t, d)).astype(np.float32)
    s_labels = rng.permutation(np.repeat(np.arange(way), shot)).astype(np.int32)
    q_labels = rng.permutation(np.repeat(np.arange(way), qpc)).astype(np.int32)
    return support, s_labels, queries, q_labels


def test_tuple_indices():
    idx = tuple_indices(8, 2)
    assert idx.shape == (28, 2)
    assert (idx[:, 0] < idx[:, 1]).all()
    idx3 = tuple_indices(8, 3)
    assert idx3.shape == (56, 3)


def test_gather_tuples():
    x = jnp.arange(2 * 4 * 3).reshape(2, 4, 3).astype(jnp.float32)
    idx = tuple_indices(4, 2)
    g = gather_tuples(x, idx)
    assert g.shape == (2, 6, 6)
    np.testing.assert_array_equal(np.asarray(g[0, 0]), np.asarray(jnp.concatenate([x[0, 0], x[0, 1]])))


def test_class_sort_groups_by_label():
    rng = np.random.default_rng(0)
    support, labels, _, _ = make_episode(rng)
    s = class_sort(jnp.asarray(support), jnp.asarray(labels), WAY, SHOT)
    for w in range(WAY):
        rows = support[labels == w]
        np.testing.assert_allclose(np.sort(np.asarray(s[w]).sum((1, 2))),
                                   np.sort(rows.sum((1, 2))), rtol=1e-6)


def test_tct_matches_naive_reference():
    rng = np.random.default_rng(42)
    support, s_labels, queries, _ = make_episode(rng)
    m = TemporalCrossTransformer(way=WAY, shot=SHOT, seq_len=T, in_dim=D, out_dim=DK)
    params = m.init(jax.random.key(0), jnp.asarray(support), jnp.asarray(s_labels),
                    jnp.asarray(queries), train=False)
    out = m.apply(params, jnp.asarray(support), jnp.asarray(s_labels),
                  jnp.asarray(queries), train=False)

    p = params["params"]
    ref_params = {
        "k_w": p["k_linear"]["kernel"], "k_b": p["k_linear"]["bias"],
        "v_w": p["v_linear"]["kernel"], "v_b": p["v_linear"]["bias"],
        "ln_g": p["norm_k"]["scale"], "ln_b": p["norm_k"]["bias"],
    }
    ref = tct_reference(support, s_labels, queries, ref_params,
                        way=WAY, shot=SHOT, seq_len=T)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_tct_correct_class_wins_when_query_equals_support():
    """A query identical to one class's support videos should get max logit there."""
    rng = np.random.default_rng(1)
    way, shot = 4, 3
    class_protos = rng.normal(size=(way, T, D)).astype(np.float32)
    support = np.concatenate([np.repeat(class_protos[w][None], shot, 0)
                              for w in range(way)])
    labels = np.repeat(np.arange(way), shot).astype(np.int32)
    queries = class_protos[2][None] + 0.01 * rng.normal(size=(1, T, D)).astype(np.float32)

    m = TemporalCrossTransformer(way=way, shot=shot, seq_len=T, in_dim=D, out_dim=DK)
    params = m.init(jax.random.key(0), jnp.asarray(support), jnp.asarray(labels),
                    jnp.asarray(queries), train=False)
    out = m.apply(params, jnp.asarray(support), jnp.asarray(labels),
                  jnp.asarray(queries), train=False)
    assert int(jnp.argmax(out[0])) == 2


def test_tct_support_permutation_invariance():
    rng = np.random.default_rng(7)
    support, s_labels, queries, _ = make_episode(rng)
    m = TemporalCrossTransformer(way=WAY, shot=SHOT, seq_len=T, in_dim=D, out_dim=DK)
    params = m.init(jax.random.key(0), jnp.asarray(support), jnp.asarray(s_labels),
                    jnp.asarray(queries), train=False)
    out1 = m.apply(params, jnp.asarray(support), jnp.asarray(s_labels),
                   jnp.asarray(queries), train=False)
    perm = rng.permutation(WAY * SHOT)
    out2 = m.apply(params, jnp.asarray(support[perm]), jnp.asarray(s_labels[perm]),
                   jnp.asarray(queries), train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-5)


def test_tct_vmaps_over_episodes():
    rng = np.random.default_rng(3)
    episodes = [make_episode(rng) for _ in range(3)]
    support = jnp.stack([jnp.asarray(e[0]) for e in episodes])
    labels = jnp.stack([jnp.asarray(e[1]) for e in episodes])
    queries = jnp.stack([jnp.asarray(e[2]) for e in episodes])
    m = TemporalCrossTransformer(way=WAY, shot=SHOT, seq_len=T, in_dim=D, out_dim=DK)
    params = m.init(jax.random.key(0), support[0], labels[0], queries[0], train=False)
    f = jax.vmap(lambda s, l, q: m.apply(params, s, l, q, train=False))
    batched = f(support, labels, queries)
    single = m.apply(params, support[1], labels[1], queries[1], train=False)
    np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(single),
                               rtol=1e-5, atol=1e-5)


def test_support_dk_matches_reference():
    rng = np.random.default_rng(5)
    support, labels, _, _ = make_episode(rng)
    out = support_dk_logits(jnp.asarray(support), jnp.asarray(labels), WAY, SHOT, T)
    ref = support_dk_reference(support, labels, way=WAY, shot=SHOT, seq_len=T)
    assert out.shape == (WAY, WAY - 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_edist_matches_reference():
    rng = np.random.default_rng(6)
    support, labels, queries, _ = make_episode(rng)
    out = edist_logits(jnp.asarray(support), jnp.asarray(labels),
                       jnp.asarray(queries), WAY, SHOT)
    ref = edist_reference(support, labels, queries, way=WAY, shot=SHOT)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_max_pool_stack_matches_reduce_window():
    from flax import linen as nn
    from litemkd_tpu.ops.pooling import max_pool_stack
    rng = np.random.default_rng(0)
    for shape, window, strides, pad in [
            ((2, 13, 13, 4), (3, 3), (2, 2), ((1, 1), (1, 1))),
            ((1, 8, 8, 3), (2, 2), (2, 2), ((0, 0), (0, 0))),
            ((2, 9, 7, 5), (3, 3), (1, 1), ((1, 1), (1, 1)))]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        got = max_pool_stack(x, window, strides, pad)
        want = nn.max_pool(x, window, strides, pad)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # gradient: with tie-free gaussian input the equality-mask backward must
    # equal reduce_window's SelectAndScatter gradient exactly — both on the
    # odd-shape general path (9×9) and the even-shape parity fast path (12×12,
    # the ResNet stem's case)
    for hw in (9, 12):
        x = jnp.asarray(rng.normal(size=(2, hw, hw, 3)).astype(np.float32))
        got = jax.grad(lambda v: jnp.sum(max_pool_stack(v) ** 2))(x)
        want = jax.grad(lambda v: jnp.sum(nn.max_pool(
            v, (3, 3), (2, 2), ((1, 1), (1, 1))) ** 2))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)
    # and under vmap (the episode-batched student path)
    for hw in (9, 12):
        xb = jnp.asarray(rng.normal(size=(3, 2, hw, hw, 3)).astype(np.float32))
        gotb = jax.vmap(jax.grad(lambda v: jnp.sum(max_pool_stack(v) ** 2)))(xb)
        wantb = jax.vmap(jax.grad(lambda v: jnp.sum(nn.max_pool(
            v, (3, 3), (2, 2), ((1, 1), (1, 1))) ** 2)))(xb)
        np.testing.assert_allclose(np.asarray(gotb), np.asarray(wantb),
                                   rtol=1e-6)
