"""FLOPs / params reporter (reference ``flops.py`` with thop.profile →
``jax.jit(...).lower().cost_analysis()``).

    python -m litemkd_tpu.cli.flops --preset student_fc2sup_dist
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from .common import enable_compilation_cache, add_common_args, build_config


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "shape"))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    args = p.parse_args(argv)
    enable_compilation_cache()
    cfg = build_config(args)

    import jax.numpy as jnp
    from ..models import Student

    ep = cfg.episode
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.random((ep.n_support, ep.seq_len, ep.img_size,
                                  ep.img_size, 3), dtype=np.float32))
    tgt = jnp.asarray(rng.random((ep.n_queries(True), ep.seq_len, ep.img_size,
                                  ep.img_size, 3), dtype=np.float32))
    labels = jnp.asarray(np.repeat(np.arange(ep.way), ep.shot).astype(np.int32))

    model = Student(cfg)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), ctx, labels, tgt, train=False))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)

    fwd = jax.jit(lambda v, c, l, t: model.apply(v, c, l, t, train=False))
    lowered = fwd.lower(variables, ctx, labels, tgt)
    cost = lowered.cost_analysis() or {}
    flops = cost.get("flops", float("nan"))
    params = count_params(variables.get("params", variables))

    print(f"model: {cfg.model.backbone} + {cfg.model.classifier}")
    print(f"episode: {ep.way}-way {ep.shot}-shot, {ep.n_queries(True)} queries, "
          f"{ep.seq_len}x{ep.img_size}px")
    print(f"params: {params / 1e6:.2f} M")
    print(f"forward cost: {flops / 1e9:.2f} GFLOPs/episode")
    for k in ("bytes accessed", "transcendentals"):
        if k in cost:
            print(f"{k}: {cost[k]:.3e}")
    return {"params": params, "gflops": flops / 1e9}


if __name__ == "__main__":
    main()
