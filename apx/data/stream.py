"""Host-side streaming: iterators, prefetch, and device bank rotation.

Behavioral reference: /root/reference/ap_gym/envs/dataset/
  * DatasetIterator / DatasetBatchIterator (dataset_iterator.py:10-59) —
    infinite i.i.d. index sampling with replacement,
  * BufferedIterator (buffered_iterator.py:11-61) — daemon thread filling a
    bounded queue, exceptions forwarded, weakref-finalized shutdown,
  * DataLoader (data_loader.py:10-33) — optional prefetch wrapper.

In the TPU design the per-step path never touches the host (banks live in
HBM), so these components serve two jobs instead:
  1. ingestion pipelines (HF -> bank packing) and host-side consumers,
  2. ``BankRotator``: corpora larger than device memory are split into
     sub-banks; a prefetch thread stages the next sub-bank (host numpy ->
     device) while envs sample the current one, and ``swap()`` exchanges
     them between episodes — the host<->HBM analogue of the reference's
     prefetch queue.
"""

from __future__ import annotations

import queue
import threading
import weakref
from typing import Any, Callable, Iterator

import numpy as np

__all__ = [
    "DatasetIterator",
    "DatasetBatchIterator",
    "BufferedIterator",
    "DataLoader",
    "BankRotator",
]


class DatasetIterator:
    """Infinite i.i.d. sampling with replacement (dataset_iterator.py:10-32)."""

    def __init__(self, dataset, seed: int = 0, restrict_indices_to=None):
        self._dataset = dataset
        self._rng = np.random.default_rng(seed)
        self._restrict = (
            None if restrict_indices_to is None else np.asarray(restrict_indices_to)
        )

    def __iter__(self):
        return self

    def __next__(self):
        if self._restrict is not None:
            idx = self._rng.choice(self._restrict)
        else:
            idx = self._rng.integers(0, len(self._dataset))
        return self._dataset[int(idx)], idx


class DatasetBatchIterator:
    """Batched variant (dataset_iterator.py:35-59)."""

    def __init__(self, dataset, batch_size: int = 1, seed: int = 0,
                 restrict_indices_to=None):
        self._dataset = dataset
        self._rng = np.random.default_rng(seed)
        self._batch_size = batch_size
        self._restrict = (
            None if restrict_indices_to is None else np.asarray(restrict_indices_to)
        )

    def __iter__(self):
        return self

    def __next__(self):
        if self._restrict is not None:
            idx = self._rng.choice(self._restrict, self._batch_size)
        else:
            idx = self._rng.integers(0, len(self._dataset), self._batch_size)
        return self._dataset[idx], idx


class BufferedIterator:
    """Background daemon thread filling a bounded queue; exceptions are
    forwarded through the queue (buffered_iterator.py:11-61)."""

    _SENTINEL = object()

    def __init__(self, inner: Iterator, buffer_size: int = 128):
        self._inner = inner
        self._queue: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()
        self._finalizer = weakref.finalize(self, self._shutdown, self._stop)

    @staticmethod
    def _shutdown(stop_event):
        stop_event.set()

    def _fill(self):
        try:
            while not self._stop.is_set():
                try:
                    item = next(self._inner)
                except BaseException as e:  # noqa: BLE001 — forwarded
                    self._put((self._SENTINEL, e))
                    return
                self._put((None, item))
        except RuntimeError:
            pass

    def _put(self, item):
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    def __iter__(self):
        return self

    def __next__(self):
        marker, item = self._queue.get()
        if marker is self._SENTINEL:
            raise item
        return item

    def close(self):
        self._stop.set()


class DataLoader:
    """Optional-prefetch wrapper (data_loader.py:10-33)."""

    def __init__(self, iterator: Iterator, prefetch: bool = True,
                 prefetch_buffer_size: int = 128):
        self._iterator = (
            BufferedIterator(iterator, prefetch_buffer_size) if prefetch else iterator
        )

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._iterator)

    def close(self):
        if isinstance(self._iterator, BufferedIterator):
            self._iterator.close()


class BankRotator:
    """Double-buffered device bank rotation for oversized corpora.

    ``loader()`` is called on a background thread to produce the next host
    slab (numpy arrays pytree); ``swap()`` returns the freshly staged
    device bank (via jax.device_put) and kicks off staging of the next.
    Envs keep sampling the current bank between swaps, so device work
    never blocks on host I/O — the reference's prefetch-thread pattern
    lifted to whole HBM banks.
    """

    def __init__(self, loader: Callable[[], Any], device_put=None):
        import jax

        self._loader = loader
        self._device_put = device_put or jax.device_put
        self._queue: queue.Queue = queue.Queue(maxsize=1)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()
        weakref.finalize(self, BankRotator._shutdown, self._stop)

    @staticmethod
    def _shutdown(stop_event):
        stop_event.set()

    def _work(self):
        while not self._stop.is_set():
            try:
                slab = self._loader()
            except BaseException as e:  # noqa: BLE001 — forwarded
                self._put((BufferedIterator._SENTINEL, e))
                return
            self._put((None, slab))

    def _put(self, item):
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    def swap(self):
        """Blocks until the next slab is staged; returns it device-resident."""
        marker, slab = self._queue.get()
        if marker is BufferedIterator._SENTINEL:
            raise slab
        return self._device_put(slab)

    def close(self):
        self._stop.set()
