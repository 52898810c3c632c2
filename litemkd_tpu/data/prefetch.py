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


class DeferredHostSync:
    """One-deep deferral of host-side result absorption.

    ``push(item)`` absorbs the PREVIOUS item and stores this one; ``flush()``
    absorbs whatever is pending. Call ``push`` right after dispatching step
    k+1 so step k's host sync (np.asarray / float / np.save) happens while
    the device is already busy — per-device execution is FIFO, so results
    are absorbed in push order. ``flush()`` must run at any barrier that
    needs the stream complete (checkpoint save, mid-train eval, loop end);
    exactly one item is ever pending, so peak extra memory is one result.
    Used by run_eval / run_training / the teacher loop / the extract
    pipeline — keep the invariants here, not in four hand-rolled copies.
    """

    def __init__(self, absorb: Callable):
        self._absorb = absorb
        self._pending = None

    def push(self, *item) -> None:
        prev, self._pending = self._pending, item
        if prev is not None:
            self._absorb(*prev)

    def flush(self) -> None:
        prev, self._pending = self._pending, None
        if prev is not None:
            self._absorb(*prev)


class Prefetcher:
    """Wraps a batch-producing callable in a bounded background queue.

    If the consumer stops early (break / exception in the step), ``close()``
    — called automatically when iteration ends for any reason — unblocks the
    producer and drains staged device batches so their HBM is released
    instead of being pinned by a thread stuck in ``q.put``."""

    _DONE = object()

    def __init__(self, produce: Callable[[int], Optional[EpisodeBatch]],
                 n_batches: int, depth: int = 2, sharding=None,
                 transfer: Optional[Callable] = None):
        """``produce(i)`` returns the i-th batch (host numpy). ``depth`` is the
        number of batches staged ahead (2 = classic double buffering).
        ``transfer`` overrides the host→device placement (default
        ``device_put_batch`` with ``sharding``) — e.g. mesh-sharded or
        multi-host global-array assembly — and runs on the background thread,
        keeping the (possibly slow) transfer off the training loop's critical
        path."""
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.n = n_batches
        self.transfer = transfer or \
            (lambda b: device_put_batch(b, sharding))
        self._err: Optional[BaseException] = None
        self._stop = False
        self.thread = threading.Thread(target=self._run, args=(produce,),
                                       daemon=True)
        self.thread.start()

    def _put(self, item) -> bool:
        while not self._stop:
            try:
                self.q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _run(self, produce):
        try:
            for i in range(self.n):
                if self._stop:
                    break
                batch = produce(i)
                if batch is None:
                    break
                if not self._put(self.transfer(batch)):
                    break
        except BaseException as e:  # surface worker errors to the consumer
            self._err = e
        finally:
            self._put(self._DONE)
            if self._stop:
                # the consumer abandoned iteration: a put that was blocked
                # when close() drained can land AFTER that drain, pinning a
                # device batch in the dropped queue — the producer is the
                # last writer, so it drains once more on its own way out
                self._drain()

    def _drain(self) -> None:
        while True:
            try:
                self.q.get_nowait()
            except queue.Empty:
                break

    def close(self) -> None:
        """Cancel production and drop staged batches (idempotent). A batch
        mid-``q.put`` on the producer is dropped by the producer's own exit
        drain (see ``_run``), so nothing stays pinned in HBM."""
        self._stop = True
        self._drain()

    def __iter__(self) -> Iterator[EpisodeBatch]:
        try:
            while True:
                try:
                    # timed get: an external close() (watchdog/timeout thread)
                    # drains the queue INCLUDING a pending DONE sentinel — an
                    # untimed get would then block forever
                    item = self.q.get(timeout=0.2)
                except queue.Empty:
                    if self._stop:
                        if self._err is not None:
                            raise self._err
                        return
                    continue
                if item is self._DONE:
                    if self._err is not None:
                        raise self._err
                    return
                yield item
        finally:
            self.close()
