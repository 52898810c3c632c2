"""Small pytree-dict helpers."""
from __future__ import annotations

from typing import Mapping


def deep_merge_variables(template: Mapping, overrides: Mapping) -> dict:
    """Recursively merge ``overrides`` over ``template`` at the leaf level.

    Used to warm-start from PARTIAL imports (e.g. a raw torchvision zoo trunk
    with no fc heads, or a backbone-only reference checkpoint): subtrees the
    override doesn't mention keep the template's freshly-initialized values
    instead of being replaced wholesale by a shallow ``{**a, **b}``.
    """
    out = dict(template)
    for k, v in overrides.items():
        if (k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping)):
            out[k] = deep_merge_variables(out[k], v)
        else:
            out[k] = v
    return out
