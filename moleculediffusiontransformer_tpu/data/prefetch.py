"""Host->device input prefetching.

The reference's input path is torch ``DataLoader`` workers feeding a
blocking ``.to(device)`` per step (e.g. `generative.py:1118-1127`).  The
TPU-native equivalent is a bounded lookahead of ``device_put`` calls:
JAX's dispatch is asynchronous, so issuing the NEXT batch's host->HBM
transfer while the CURRENT step computes overlaps PCIe/DMA with MXU work
— the standard ``flax.jax_utils.prefetch_to_device`` pattern, rebuilt for
``NamedSharding`` meshes (flax's version targets the deprecated pmap
layout) and with the host-side work (numpy slicing, tokenize, shard
assembly) moved onto a worker thread.

Two layers:

  * :func:`prefetch_to_device` — wrap any host-batch iterator; yields
    mesh-sharded device arrays ``size`` batches ahead.
  * :class:`ThreadedLoader` — run the whole per-epoch iterator (shuffle,
    slice, augment) on a background thread with a bounded queue, so
    host-side batch assembly never serializes with step dispatch.
"""
from __future__ import annotations

import collections
import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import jax

from ..parallel.mesh import batch_sharding


def prefetch_to_device(iterator: Iterable, mesh=None, *, size: int = 2,
                       axis_name: str = "data",
                       sharding=None) -> Iterator:
    """Yield items from ``iterator`` as device arrays, keeping up to
    ``size`` batches in flight ahead of the consumer.

    Each host pytree's leaves are ``device_put`` with the leading axis
    sharded over ``mesh`` (or an explicit ``sharding``); pass
    ``mesh=None, sharding=None`` for single-device default placement.
    ``device_put`` only *enqueues* the transfer (async dispatch), so the
    lookahead window is cheap — it pins at most ``size`` extra batches of
    HBM.
    """
    if sharding is None and mesh is not None:
        sharding = batch_sharding(mesh, axis_name)

    def put(batch):
        if sharding is None:
            return jax.tree_util.tree_map(jax.device_put, batch)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)

    buf = collections.deque()
    it = iter(iterator)
    try:
        while True:
            while len(buf) < max(size, 1):
                buf.append(put(next(it)))
            yield buf.popleft()
    except StopIteration:
        while buf:
            yield buf.popleft()


class ThreadedLoader:
    """Run a host batch-iterator factory on a background thread.

    ``data_iter_fn()`` is called once per epoch (same contract as
    ``train_diffusion``'s); batches are assembled on the worker thread and
    handed over through a bounded queue (default depth 4).  Exceptions on
    the worker re-raise at the consuming site; the worker is a daemon and
    also honors :meth:`close` for deterministic shutdown mid-epoch.

    Composes with :func:`prefetch_to_device`::

        loader = ThreadedLoader(lambda: batch_iterator(X, y, 256, rng=rng))
        for batch in prefetch_to_device(loader.epoch(), mesh):
            state, loss = step(state, *batch, key)
    """

    _DONE = object()

    def __init__(self, data_iter_fn: Callable[[], Iterable], *,
                 queue_depth: int = 4):
        self._fn = data_iter_fn
        self._depth = queue_depth
        self._queue: Optional[queue.Queue] = None
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _worker(self, q: "queue.Queue") -> None:
        try:
            for item in self._fn():
                while not self._stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            q.put(self._DONE)
        except BaseException as e:  # surfaced at the consumer
            while not self._stop.is_set():
                try:
                    q.put(e, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def epoch(self) -> Iterator[Any]:
        """One epoch's batches, produced on the worker thread.  Abandoning
        the generator early (break / GeneratorExit) stops the worker via
        the ``finally`` — no spinning producer is left behind."""
        self.close()
        self._stop.clear()
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        self._queue = q
        self._thread = threading.Thread(target=self._worker, args=(q,),
                                        daemon=True)
        self._thread.start()
        try:
            while True:
                item = q.get()
                if item is self._DONE:
                    self._thread.join()
                    self._thread = None
                    return
                if isinstance(item, BaseException):
                    self._thread.join()
                    self._thread = None
                    raise item
                yield item
        finally:
            self.close()

    def close(self) -> None:
        """Stop the worker (if mid-epoch) and drop queued batches."""
        if self._thread is not None:
            self._stop.set()
            while True:     # drain so the producer can observe _stop
                try:
                    self._queue.get_nowait()
                except queue.Empty:
                    break
            self._thread.join()
            self._thread = None

    def __enter__(self) -> "ThreadedLoader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
