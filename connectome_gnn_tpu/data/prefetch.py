"""Background-thread batch prefetching.

Host-side collation (packing + padding + ``jnp.asarray``) runs on the CPU
while the previous step executes on the TPU.  ``PrefetchIterator`` wraps any
batch iterable with a bounded background producer thread, so collate and
host→device transfer overlap device compute — the TPU-native stand-in for
the reference loader's synchronous per-batch packing (reference
``connectome_gnn/graph.py:190-197``, which re-collates inside the hot loop).

Usage::

    for batch in PrefetchIterator(loader, depth=2):
        step(batch)

or wrap a loader once for all epochs::

    loader = PrefetchLoader(ConnectomeDataLoader(...), depth=2)
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class PrefetchIterator:
    """Iterate ``iterable`` with ``depth`` batches produced ahead."""

    _SENTINEL = object()

    def __init__(self, iterable: Iterable, depth: int = 2):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._error: list[BaseException] = []

        def producer() -> None:
            try:
                for item in iterable:
                    self._queue.put(item)
            except BaseException as exc:  # surface in consumer
                self._error.append(exc)
            finally:
                self._queue.put(self._SENTINEL)

        self._thread = threading.Thread(target=producer, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._SENTINEL:
            self._thread.join()
            if self._error:
                raise self._error[0]
            raise StopIteration
        return item


class PrefetchLoader:
    """Loader wrapper: every ``iter()`` starts a fresh prefetching pass."""

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self) -> int:
        return len(self.loader)

    def __iter__(self) -> PrefetchIterator:
        return PrefetchIterator(self.loader, depth=self.depth)
