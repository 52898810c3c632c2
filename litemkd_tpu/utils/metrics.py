"""Episodic metrics.

Reference: ``utils.py:101-133`` (episodic loss, aggregate_accuracy) and the
95%-CI protocol of ``test.py:271-285`` (mean·100 ± 196·std/√n).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax.numpy as jnp


def aggregate_accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean argmax accuracy. Works on (Q, way) or batched (E, Q, way)."""
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))


def per_episode_accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """(E, Q, way) × (E, Q) → (E,) per-episode accuracies."""
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32),
                    axis=-1)


def task_confusion(logits: jnp.ndarray, batch_class_list: jnp.ndarray) -> jnp.ndarray:
    """Map episode-local predictions to REAL class ids (``utils.py:123-127``).

    The reference logsumexps over a leading sample axis (always size 1 in its
    pipeline), argmaxes, and indexes the episode's class list — with one
    sample that is argmax + gather. Accepts (Q, way) logits with a (way,)
    class list, or batched (E, Q, way) with (E, way); returns the real class
    id of each query prediction, enabling the per-task confusion analysis of
    ``test.py:160-201``.
    """
    return real_class_preds(jnp.argmax(logits, axis=-1), batch_class_list)


def real_class_preds(preds: jnp.ndarray, batch_class_list: jnp.ndarray) -> jnp.ndarray:
    """Episode-local argmax predictions → real class ids (the gather half of
    :func:`task_confusion`, for callers that already hold device argmaxes)."""
    return jnp.take_along_axis(jnp.asarray(batch_class_list),
                               jnp.asarray(preds), axis=-1)


def confidence_interval(accuracies: np.ndarray) -> Dict[str, float]:
    """The reference's eval statistic: accuracy ×100 with 196·std/√n CI."""
    acc = np.asarray(accuracies, dtype=np.float64)
    n = len(acc)
    if n == 0:
        return {"accuracy": float("nan"), "confidence": float("nan"),
                "n_tasks": 0}
    mean = float(acc.mean() * 100.0)
    ci = float(196.0 * acc.std() / np.sqrt(n))
    return {"accuracy": mean, "confidence": ci, "n_tasks": n}


class TestAccuracies:
    """Accumulates per-episode accuracies and renders the reference-style
    summary line (``utils.py:9-29``)."""

    def __init__(self) -> None:
        self._acc: List[float] = []

    def add(self, episode_accuracy: float) -> None:
        self._acc.append(float(episode_accuracy))

    def extend(self, accs) -> None:
        self._acc.extend(float(a) for a in np.asarray(accs).ravel())

    def summary(self) -> Dict[str, float]:
        return confidence_interval(np.asarray(self._acc))

    def __len__(self) -> int:
        return len(self._acc)

    def render(self, dataset: str = "") -> str:
        s = self.summary()
        return f"{dataset}: {s['accuracy']:.1f}+/-{s['confidence']:.1f}"
