"""Pallas batch-norm: numerical parity with flax nn.BatchNorm in training
mode (forward outputs, batch stats, and gradients), on both the jnp fallback
path and the Pallas kernels run in interpreter mode."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

import litemkd_tpu.ops.pallas_bn as pbn
from litemkd_tpu.ops.pallas_bn import PallasBatchNorm, batch_norm_train

N, H, W, C = 6, 5, 7, 16   # R = 210, not a multiple of the block size


def _flax_train_apply(x, scale, bias):
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                      dtype=jnp.float32)
    variables = {"params": {"scale": scale, "bias": bias},
                 "batch_stats": {"mean": jnp.zeros((C,)),
                                 "var": jnp.ones((C,))}}
    y, mut = bn.apply(variables, x, mutable=["batch_stats"])
    return y, mut["batch_stats"]


@pytest.mark.parametrize("use_pallas", [False, True])
def test_batch_norm_train_matches_flax(use_pallas):
    if use_pallas:
        pbn._INTERPRET = True
    try:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

        y, mean, var = batch_norm_train(x, scale, bias, 1e-5, use_pallas)
        want_y, _ = _flax_train_apply(x, scale, bias)
        np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mean),
                                   np.asarray(x.reshape(-1, C).mean(0)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(var),
                                   np.asarray(x.reshape(-1, C).var(0)),
                                   rtol=1e-4, atol=1e-5)

        # gradients: custom VJP == autodiff through the flax formula
        g = jnp.asarray(rng.normal(size=y.shape).astype(np.float32))

        def ours(x, s, b):
            return jnp.vdot(batch_norm_train(x, s, b, 1e-5, use_pallas)[0], g)

        def ref(x, s, b):
            r = x.shape[0] * x.shape[1] * x.shape[2]
            m = x.reshape(-1, C).mean(0)
            v = x.reshape(-1, C).var(0)
            y = (x - m) * jax.lax.rsqrt(v + 1e-5) * s + b
            return jnp.vdot(y, g)

        got = jax.grad(ours, argnums=(0, 1, 2))(x, scale, bias)
        want = jax.grad(ref, argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-5)
    finally:
        pbn._INTERPRET = False


def test_pallas_batch_norm_module_stats_and_eval():
    """Module: running-stat momentum update + eval-mode application match
    flax, and the variable tree uses the same names."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
    m = PallasBatchNorm(use_running_average=False, dtype=jnp.float32,
                        use_pallas=False)
    v = m.init(jax.random.key(0), x)
    assert set(v["params"]) == {"scale", "bias"}
    assert set(v["batch_stats"]) == {"mean", "var"}
    y, mut = m.apply(v, x, mutable=["batch_stats"])

    fx = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                      dtype=jnp.float32)
    fy, fmut = fx.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(fy),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               np.asarray(fmut["batch_stats"]["mean"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               np.asarray(fmut["batch_stats"]["var"]),
                               rtol=1e-4, atol=1e-5)

    # eval mode
    me = PallasBatchNorm(use_running_average=True, dtype=jnp.float32)
    fe = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                      dtype=jnp.float32)
    v2 = {"params": v["params"], "batch_stats": mut["batch_stats"]}
    np.testing.assert_allclose(np.asarray(me.apply(v2, x)),
                               np.asarray(fe.apply(v2, x)),
                               rtol=1e-4, atol=1e-5)


def test_pallas_bn_trunk_end_to_end():
    """resnet trunk with pallas_bn=True (jnp fallback off-TPU) trains a step
    and produces the same variable tree as the flax-BN trunk."""
    from litemkd_tpu.models.backbones.resnet import ResNetBackbone
    rng = np.random.default_rng(2)
    clips = jnp.asarray(rng.integers(0, 255, (2, 2, 32, 32, 3), dtype=np.uint8))
    m0 = ResNetBackbone(depth=18, num_fc=1, out_dim=64)
    m1 = ResNetBackbone(depth=18, num_fc=1, out_dim=64, pallas_bn=True)
    v0 = m0.init(jax.random.key(0), clips, train=False)
    v1 = m1.init(jax.random.key(0), clips, train=False)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    out, mut = m1.apply(v1, clips, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 2, 64)
    g = jax.grad(lambda p: jnp.sum(m1.apply(
        {"params": p, "batch_stats": v1["batch_stats"]}, clips, train=True,
        mutable=["batch_stats"])[0] ** 2))(v1["params"])
    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b.astype(jnp.float32))), g, 0.0)))
