"""Host→device pipelined prefetch.

The analog of the reference's DataLoader worker queue (``trainwandb.py:88``),
TPU-shaped: a background thread keeps a small queue of ready episode batches
and transfers them to device memory while the previous step is still running,
so the accelerator never waits on JPEG decode or ``np.load``.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax

from ..train.steps import EpisodeBatch


def device_put_batch(batch: EpisodeBatch, sharding=None) -> EpisodeBatch:
    """Transfer every array field to device (optionally with a sharding)."""
    def put(x):
        if x is None:
            return None
        return jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)
    return EpisodeBatch(*(put(f) for f in batch))


class Prefetcher:
    """Wraps a batch-producing callable in a bounded background queue."""

    _DONE = object()

    def __init__(self, produce: Callable[[int], Optional[EpisodeBatch]],
                 n_batches: int, depth: int = 2, sharding=None):
        """``produce(i)`` returns the i-th batch (host numpy). ``depth`` is the
        number of batches staged ahead (2 = classic double buffering)."""
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.n = n_batches
        self.sharding = sharding
        self._err: Optional[BaseException] = None
        self.thread = threading.Thread(target=self._run, args=(produce,),
                                       daemon=True)
        self.thread.start()

    def _run(self, produce):
        try:
            for i in range(self.n):
                batch = produce(i)
                if batch is None:
                    break
                self.q.put(device_put_batch(batch, self.sharding))
        except BaseException as e:  # surface worker errors to the consumer
            self._err = e
        finally:
            self.q.put(self._DONE)

    def __iter__(self) -> Iterator[EpisodeBatch]:
        while True:
            item = self.q.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item
