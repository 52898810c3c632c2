"""Profiling helpers.

The reference measures efficiency with thop FLOPs counts (``flops.py``) and has
no runtime tracer (SURVEY.md §5.1). Here: XLA cost analysis for any jitted
callable, plus a context manager around ``jax.profiler`` for on-device traces
viewable in TensorBoard/XProf.
"""
from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Optional

import jax


def cost_analysis(fn: Callable, *example_args) -> Dict[str, float]:
    """FLOPs / bytes for one call of ``fn`` (jitted or plain)."""
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    lowered = jitted.lower(*example_args)
    return dict(lowered.cost_analysis() or {})


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """``with trace('/tmp/jaxtrace'): step(...)`` — no-op when log_dir is None
    or the profiler is unavailable on the current backend."""
    if not log_dir:
        yield
        return
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
