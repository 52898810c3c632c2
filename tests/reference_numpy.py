"""Straightforward per-class/per-query numpy implementations of the episodic
heads, written directly from the math spec (loops, no vectorization).

These act as the executable specification the fast vectorized JAX ops are
tested against. Deliberately structured the naive way the reference computes
them (Python loop over classes, per-query softmax) so a disagreement points at
a real vectorization bug.
"""
import numpy as np
from itertools import combinations


def sinusoidal_pe_np(max_len, d_model, scale=0.1):
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(pos * div) * scale
    pe[:, 1::2] = np.cos(pos * div) * scale
    return pe


def layernorm_np(x, g, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


def softmax_np(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def tct_reference(support, labels, queries, params, *, way, shot, seq_len,
                  set_size=2, ln_eps=1e-6):
    """Naive TRX head. params: dict with k_w (in,out), k_b, v_w, v_b, ln_g, ln_b.

    support (WS,T,D), labels (WS,), queries (Q,T,D) → logits (Q, way).
    """
    support = np.asarray(support, np.float64)
    queries = np.asarray(queries, np.float64)
    D = support.shape[-1]
    pe = sinusoidal_pe_np(int(seq_len * 1.5), D)[:seq_len]
    support = support + pe
    queries = queries + pe

    tuples = list(combinations(range(seq_len), set_size))
    U = len(tuples)

    def tup(x):  # (N,T,D) -> (N,U,set*D)
        return np.stack([x[:, list(p), :].reshape(x.shape[0], -1) for p in tuples], axis=1)

    s_t, q_t = tup(support), tup(queries)
    k_w, k_b = np.asarray(params["k_w"], np.float64), np.asarray(params["k_b"], np.float64)
    v_w, v_b = np.asarray(params["v_w"], np.float64), np.asarray(params["v_b"], np.float64)
    ln_g, ln_b = np.asarray(params["ln_g"], np.float64), np.asarray(params["ln_b"], np.float64)

    s_k = layernorm_np(s_t @ k_w + k_b, ln_g, ln_b, ln_eps)
    q_k = layernorm_np(q_t @ k_w + k_b, ln_g, ln_b, ln_eps)
    s_v = s_t @ v_w + v_b
    q_v = q_t @ v_w + v_b
    dk = k_w.shape[1]

    Q = queries.shape[0]
    logits = np.zeros((Q, way))
    for c in range(way):
        cls_idx = [i for i in range(len(labels)) if labels[i] == c]
        class_k = s_k[cls_idx]      # (S, U, dk)
        class_v = s_v[cls_idx]
        for q in range(Q):
            # scores (U, S, U): query tuple u vs support (s, v)
            scores = np.einsum("ud,svd->usv", q_k[q], class_k) / np.sqrt(dk)
            attn = softmax_np(scores.reshape(U, shot * U), axis=1).reshape(U, shot, U)
            proto = np.einsum("usv,svd->ud", attn, class_v)
            diff = q_v[q] - proto
            logits[q, c] = -(diff ** 2).sum() / U
    return logits


def support_dk_reference(support, labels, *, way, shot, seq_len):
    support = np.asarray(support, np.float64)
    D = support.shape[-1]
    protos = np.zeros((way, seq_len, D))
    for c in range(way):
        cls_idx = [i for i in range(len(labels)) if labels[i] == c]
        protos[c] = support[cls_idx].mean(0)
    out = np.zeros((way, way - 1))
    for i in range(way):
        m = 0
        for j in range(way):
            if i != j:
                out[i, m] = -((protos[i] - protos[j]) ** 2).sum() / seq_len
                m += 1
    return out


def edist_reference(support, labels, queries, *, way, shot):
    support = np.asarray(support, np.float64).mean(-2)  # (WS, D)
    queries = np.asarray(queries, np.float64).mean(-2)  # (Q, D)
    Q = queries.shape[0]
    out = np.zeros((Q, way))
    for c in range(way):
        cls = np.stack([support[i] for i in range(len(labels)) if labels[i] == c])
        for q in range(Q):
            d = np.sqrt(((queries[q][None] - cls) ** 2).sum(-1))
            out[q, c] = -d.mean()
    return out
