"""Background-thread batch prefetching.

The reference overlaps host data work with GPU compute via
``torch.utils.data.DataLoader(num_workers=4, pin_memory=True)``
(``Human_Motion_Modelling/train.py:89-94``).  renderloom's equivalent is
a bounded producer thread ahead of the train loop: h5 reads + native
PNG/JPEG decode (which releases the GIL inside the C++ extension) run
while the TPU executes the previous step, so the accelerator never waits
on the host.  Device-side rasterization/augmentation stays in the jitted
prep step — only byte decode happens here.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class Prefetcher(Iterator[T]):
    """Iterate ``source`` on a daemon thread, ``depth`` items ahead.

    Exceptions in the producer re-raise at the consuming ``next()``;
    ``close()`` (or garbage collection of the iterator) stops the
    producer promptly even if the consumer abandons the loop early.
    """

    def __init__(self, source: Iterable[T], depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._produce, args=(iter(source),), daemon=True)
        self._thread.start()

    def _produce(self, it):
        try:
            for item in it:
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            self._q.put(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            self._q.put(e)

    def __iter__(self):
        return self

    def __next__(self) -> T:
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is _SENTINEL:
            self._stop.set()
            raise StopIteration
        if isinstance(item, BaseException):
            self._stop.set()
            raise item
        return item

    def close(self):
        self._stop.set()
        # drain so a blocked producer can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __del__(self):
        self.close()


def prefetch(source: Iterable[T], depth: int = 2) -> Prefetcher:
    """Wrap an iterable of batches with background prefetching."""
    return Prefetcher(source, depth)
