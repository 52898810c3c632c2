"""Small pytree-dict helpers."""
from __future__ import annotations

from typing import Mapping


def deep_merge_variables(template: Mapping, overrides: Mapping,
                         _path: str = "") -> dict:
    """Recursively merge ``overrides`` over ``template`` at the leaf level.

    Used to warm-start from PARTIAL imports (e.g. a raw torchvision zoo trunk
    with no fc heads, or a backbone-only reference checkpoint): subtrees the
    override doesn't mention keep the template's freshly-initialized values
    instead of being replaced wholesale by a shallow ``{**a, **b}``.

    Override keys ABSENT from the template raise: flax ``apply`` silently
    ignores unknown params, so a drifted import layout would otherwise become
    a stray unused subtree while the intended target keeps its random init —
    a warm start that logs success and does nothing.
    """
    out = dict(template)
    for k, v in overrides.items():
        where = f"{_path}/{k}" if _path else str(k)
        if k not in out:
            raise KeyError(
                f"warm-start override key {where!r} does not exist in the "
                f"model's variable tree (template has "
                f"{sorted(map(str, out))[:8]}) — the imported checkpoint's "
                "layout does not match this model")
        if isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = deep_merge_variables(out[k], v, where)
        elif isinstance(out[k], Mapping) != isinstance(v, Mapping):
            raise KeyError(
                f"warm-start override at {where!r} is a "
                f"{'subtree' if isinstance(v, Mapping) else 'leaf'} but the "
                f"model's variable tree has a "
                f"{'subtree' if isinstance(out[k], Mapping) else 'leaf'} there")
        else:
            out[k] = v
    return out
