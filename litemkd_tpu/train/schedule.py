"""LR schedules.

The reference steps ``MultiStepLR`` once per *episode* with milestones in
episodes (``trainwandb.py:145``, ``options.py:29``). Our optimizer steps once
per episode *batch*, so schedules here are functions of episodes-seen and the
train step converts its update count accordingly.
"""
from __future__ import annotations

from typing import Sequence

import optax


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float,
                 episodes_per_step: int) -> optax.Schedule:
    """MultiStepLR over episode counts, sampled at optimizer-update granularity."""
    boundaries = {max(1, m // episodes_per_step): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(name: str, base_lr: float, milestones: Sequence[int],
                   gamma: float, episodes_per_step: int) -> optax.GradientTransformation:
    sched = multistep_lr(base_lr, milestones, gamma, episodes_per_step)
    if name == "sgd":
        return optax.sgd(sched)          # plain SGD, matching torch defaults
    if name == "adam":
        return optax.adam(sched)
    raise ValueError(f"unknown optimizer '{name}'")
