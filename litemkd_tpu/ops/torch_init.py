"""PyTorch-compatible parameter initializers.

The reference trains with torch's default inits; training dynamics (and the
published accuracies) depend on them, so we reproduce the *distributions*:

- ``nn.Linear``: weight and bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))
  (kaiming_uniform with a=sqrt(5) reduces to exactly this for weights).
- ``nn.Embedding``: N(0, 1).
- ``nn.Conv2d``: kaiming_uniform(a=sqrt(5)) on fan_in = in_ch * kh * kw.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def torch_linear_kernel_init():
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); flax kernels are (fan_in, fan_out)."""
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_linear_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_embedding_init():
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype)
    return init


def torch_conv_kernel_init():
    """kaiming_uniform(a=sqrt(5)) == U(-sqrt(6/((1+5)*fan_in)), +...) = U(-1/sqrt(fan_in),...).

    flax conv kernels are (kh, kw, in_ch, out_ch) → fan_in = kh*kw*in_ch.
    """
    def init(key, shape, dtype=jnp.float32):
        fan_in = int(np.prod(shape[:-1]))
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init
