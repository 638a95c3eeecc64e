"""utils/pipeline.py: ordered prefetching with error propagation."""

import time

import pytest

from cpecan_tpu.utils.pipeline import prefetch_map


def test_order_preserved():
    assert list(prefetch_map(lambda x: x * 2, range(10))) == list(range(0, 20, 2))
    assert list(prefetch_map(lambda x: x, [], depth=3)) == []


def test_depth_prefetches_ahead():
    started = []

    def work(i):
        started.append(i)
        return i

    gen = prefetch_map(work, range(5), depth=2)
    first = next(gen)
    time.sleep(0.05)  # let the worker run ahead
    assert first == 0
    assert len(started) >= 2  # at least one item prepared beyond the yield
    assert list(gen) == [1, 2, 3, 4]


def test_worker_exception_propagates():
    def work(i):
        if i == 2:
            raise ValueError("boom")
        return i

    gen = prefetch_map(work, range(5))
    assert next(gen) == 0
    assert next(gen) == 1
    with pytest.raises(ValueError, match="boom"):
        list(gen)
