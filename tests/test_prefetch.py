"""Prefetcher: ordering, exception propagation, early close."""

import time

import pytest

from renderloom.data.prefetch import Prefetcher, prefetch


def test_preserves_order_and_exhausts():
    out = list(prefetch(range(17), depth=3))
    assert out == list(range(17))


def test_propagates_producer_exception():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)
    with pytest.raises(StopIteration):
        next(it)


def test_close_stops_blocked_producer():
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = Prefetcher(gen(), depth=1)
    assert next(it) == 0
    it.close()
    time.sleep(0.3)
    n = len(produced)
    time.sleep(0.3)
    assert len(produced) == n  # producer actually stopped
    assert n < 1000


def test_actually_runs_ahead():
    started = []

    def gen():
        for i in range(4):
            started.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    time.sleep(0.3)
    # producer filled the queue before any consumption
    assert len(started) >= 2
    assert list(it) == [0, 1, 2, 3]
