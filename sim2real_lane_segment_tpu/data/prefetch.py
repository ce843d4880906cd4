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


_SENTINEL = object()


def _pump(q: queue.Queue, stop: threading.Event, it: Iterator) -> None:
    """Producer body: feed ``it`` into ``q`` until done, error, or stop.

    Puts use a timeout so an abandoned consumer (e.g. an epoch retried
    after a transient backend error drops its generator mid-iteration)
    never leaves the thread blocked on a full queue holding batches.
    """

    def guarded_put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    try:
        for batch in it:
            if not guarded_put(batch):
                return
    except BaseException as e:  # propagate into the consumer
        guarded_put(_Error(e))
        return
    guarded_put(_SENTINEL)


def _consume(q: queue.Queue, stop: threading.Event) -> Iterator:
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, _Error):
                raise item.exc
            yield item
    finally:
        # reached on normal exhaustion, on error, and on generator
        # abandonment (GeneratorExit) — always release the producer
        stop.set()


def prefetch_to_device(batch_iter: Iterator, size: int = 2,
                       sharding=None) -> Iterator:
    """Iterate ``batch_iter`` with ``size`` batches staged ahead on device.

    ``sharding``: optional jax.sharding.Sharding for the device_put (e.g.
    batch-axis sharding over the data mesh axis).
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    stop = threading.Event()

    def put(x):
        if sharding is not None:
            return jax.device_put(x, sharding)
        return jax.device_put(x)

    staged = (jax.tree_util.tree_map(put, b) for b in batch_iter)
    threading.Thread(target=_pump, args=(q, stop, staged),
                     daemon=True).start()
    return _consume(q, stop)


def background_batches(make_iter: Callable[[], Iterator],
                       size: int = 4) -> Iterator:
    """Stage host batches (numpy) ahead on a reader thread, no device_put."""
    q: queue.Queue = queue.Queue(maxsize=size)
    stop = threading.Event()
    threading.Thread(target=_pump, args=(q, stop, make_iter()),
                     daemon=True).start()
    return _consume(q, stop)
