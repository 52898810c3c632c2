"""Scatter-free max-pool backward (measured, NOT currently used in the trunk).

``max_pool_stack`` keeps the exact ``reduce_window`` forward (bit-identical
values) and swaps the SelectAndScatter backward for an equality-mask
reconstruction — the general path places ``g * (x_slice == y)`` back on the
input grid with dilated ``lax.pad``s, and the 3×3/s2/p1 fast path gathers the
≤2×2 contributing windows per input pixel on four parity planes.

**A/B result on TPU v5e (flagship train step, 2026-08-16):** the stem pool on
``nn.max_pool``/SelectAndScatter runs the step at 18.0 eps/s; this op's
parity backward at 15.2 eps/s (the naive pad-accumulate form OOMs —
XLA materializes all nine full-resolution dilated pads). XLA:TPU's
SelectAndScatter is already well-tiled for this shape, so ``ResNetTrunk``
keeps ``nn.max_pool``; this op is retained as a verified-correct alternative
for platforms/shapes where SelectAndScatter serializes.

Tie semantics differ from torch at exactly-equal window maxima (torch's
SelectAndScatter credits the first argmax; the equality mask credits every
tied position with the full window cotangent). Ties are measure-zero for
real-valued activations and both are valid subgradients.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

Pad2 = Tuple[Tuple[int, int], Tuple[int, int]]


def _out_size(l: int, k: int, s: int, p0: int, p1: int) -> int:
    return (l + p0 + p1 - k) // s + 1


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool_stack(x: jnp.ndarray, window: Tuple[int, int] = (3, 3),
                   strides: Tuple[int, int] = (2, 2),
                   padding: Pad2 = ((1, 1), (1, 1))) -> jnp.ndarray:
    """Max-pool NHWC ``x`` (static window/stride/padding); forward matches
    ``nn.max_pool(x, window, strides, padding)`` bit-for-bit; backward is
    scatter-free (see module docstring)."""
    return _forward(x, window, strides, padding)


def _forward(x, window, strides, padding):
    neg = (jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x, neg, lax.max, (1, *window, 1), (1, *strides, 1),
        ((0, 0), padding[0], padding[1], (0, 0)))


def _fwd(x, window, strides, padding):
    y = _forward(x, window, strides, padding)
    return y, (x, y)


def _bwd_3x3s2p1(x, y, g):
    """Fast path for the ResNet stem pool (3×3, stride 2, pad 1, even H/W):
    an input pixel at (h, w) belongs to exactly one window row if h is even
    (i = h/2) and two if odd (i ∈ {h//2, h//2+1}), same for columns — so the
    gradient is a gather over ≤2×2 windows, computed on the four (h%2, w%2)
    parity planes with boundary-shifted y/g. No pads with interior dilation,
    no scatter: everything is elementwise at pooled resolution + one
    interleave, so XLA fuses it (the pad-accumulate form materialized nine
    full-resolution buffers and OOM'd the flagship step)."""
    m, h, w, c = x.shape
    th, ts = h // 2, w // 2
    x4 = x.reshape(m, th, 2, ts, 2, c)
    xee, xeo = x4[:, :, 0, :, 0], x4[:, :, 0, :, 1]
    xoe, xoo = x4[:, :, 1, :, 0], x4[:, :, 1, :, 1]
    big = (jnp.finfo(x.dtype).max if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).max)

    def shift_r(a, fill):
        return jnp.concatenate(
            [a[:, 1:], jnp.full_like(a[:, :1], fill)], axis=1)

    def shift_c(a, fill):
        return jnp.concatenate(
            [a[:, :, 1:], jnp.full_like(a[:, :, :1], fill)], axis=2)

    y_r, g_r = shift_r(y, big), shift_r(g, 0)
    y_c, g_c = shift_c(y, big), shift_c(g, 0)
    y_rc, g_rc = shift_c(y_r, big), shift_c(g_r, 0)
    pick = lambda xs, ys, gs: jnp.where(xs == ys, gs, jnp.zeros((), g.dtype))
    gee = pick(xee, y, g)
    geo = pick(xeo, y, g) + pick(xeo, y_c, g_c)
    goe = pick(xoe, y, g) + pick(xoe, y_r, g_r)
    goo = (pick(xoo, y, g) + pick(xoo, y_c, g_c)
           + pick(xoo, y_r, g_r) + pick(xoo, y_rc, g_rc))
    rows_e = jnp.stack([gee, geo], axis=3)        # (m, th, ts, 2, c)
    rows_o = jnp.stack([goe, goo], axis=3)
    out = jnp.stack([rows_e, rows_o], axis=2)     # (m, th, 2, ts, 2, c)
    return (out.reshape(m, h, w, c),)


def _bwd(window, strides, padding, res, g):
    x, y = res
    if (window == (3, 3) and strides == (2, 2)
            and padding == ((1, 1), (1, 1))
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        return _bwd_3x3s2p1(x, y, g)
    n, h, w, c = x.shape
    (ph0, ph1), (pw0, pw1) = padding
    kh, kw = window
    sh, sw = strides
    oh = _out_size(h, kh, sh, ph0, ph1)
    ow = _out_size(w, kw, sw, pw0, pw1)
    hp, wp = h + ph0 + ph1, w + pw0 + pw1
    neg = (jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)),
                 constant_values=neg)
    gp = None
    for di in range(kh):
        he = di + (oh - 1) * sh + 1     # slice end on the padded grid
        for dj in range(kw):
            we = dj + (ow - 1) * sw + 1
            s = lax.slice(xp, (0, di, dj, 0), (n, he, we, c),
                          (1, sh, sw, 1))
            term = jnp.where(s == y, g, jnp.zeros((), g.dtype))
            # dilated pad = exact strided scatter of `term` back onto the
            # padded input grid at positions (di + sh*i, dj + sw*j)
            placed = lax.pad(term, jnp.zeros((), g.dtype),
                             ((0, 0, 0),
                              (di, hp - he, sh - 1),
                              (dj, wp - we, sw - 1),
                              (0, 0, 0)))
            gp = placed if gp is None else gp + placed
    return (gp[:, ph0:hp - ph1, pw0:wp - pw1, :],)


max_pool_stack.defvjp(_fwd, _bwd)
