"""Positional encodings.

Sinusoidal PE with the reference's 0.1 scale factor
(``/root/reference/model/classifiers/TRX_2fcsup.py:24-48``) and the trainable
embedding+LayerNorm PE used by the MFM fusion encoders
(``/root/reference/teacher/code/model.py:1135-1151``).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .dtypes import anchor_dtype
from .torch_init import torch_embedding_init


def sinusoidal_pe(max_len: int, d_model: int, scale: float = 0.1) -> np.ndarray:
    """Precompute the (max_len, d_model) sinusoidal table, scaled by 0.1."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * -(np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term) * scale
    pe[:, 1::2] = np.cos(position * div_term) * scale
    return pe


class SinusoidalPE(nn.Module):
    """Adds the fixed sinusoidal table then applies dropout (train only)."""

    d_model: int
    max_len: int
    dropout: float = 0.1
    scale: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        table = jnp.asarray(sinusoidal_pe(self.max_len, self.d_model, self.scale))
        x = x + table[: x.shape[-2]].astype(x.dtype)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class TrainablePE(nn.Module):
    """Learned per-frame embedding + LayerNorm + dropout (MFM fusion blocks)."""

    max_len: int
    d_model: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        emb = self.param("position_embeddings", torch_embedding_init(),
                         (self.max_len, self.d_model), jnp.float32)
        t = x.shape[-2]
        x = nn.LayerNorm(epsilon=1e-5, dtype=anchor_dtype(x.dtype))(  # torch eps
            x + emb[:t].astype(x.dtype))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
