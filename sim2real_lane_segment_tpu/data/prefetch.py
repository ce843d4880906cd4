"""Host→device prefetching: overlap disk reads and H2D copies with compute.

Replaces the reference's ``DataLoader(num_workers=8, pin_memory=True)``
(reference train.py:48-56) with a thread that reads/stacks batches ahead
and a double-buffered ``jax.device_put`` queue, so the TPU never waits on
the host.  Batches stay uint8 until they're on device (4x less PCIe/host
traffic than shipping float32).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import jax


class _Error:
    """Error envelope — a dedicated type so real batches (which may be
    arbitrary tuples of arrays) can never be mistaken for it."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch_to_device(batch_iter: Iterator, size: int = 2,
                       sharding=None) -> Iterator:
    """Iterate ``batch_iter`` with ``size`` batches staged ahead on device.

    ``sharding``: optional jax.sharding.Sharding for the device_put (e.g.
    batch-axis sharding over the data mesh axis).
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()

    def put(x):
        if sharding is not None:
            return jax.device_put(x, sharding)
        return jax.device_put(x)

    def producer():
        try:
            for batch in batch_iter:
                q.put(jax.tree_util.tree_map(put, batch))
        except BaseException as e:  # propagate into the consumer
            q.put(_Error(e))
            return
        q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        if isinstance(item, _Error):
            raise item.exc
        yield item


def background_batches(make_iter: Callable[[], Iterator], size: int = 4) -> Iterator:
    """Stage host batches (numpy) ahead on a reader thread, no device_put."""
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for batch in make_iter():
                q.put(batch)
        except BaseException as e:
            q.put(_Error(e))
            return
        q.put(sentinel)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        if isinstance(item, _Error):
            raise item.exc
        yield item
