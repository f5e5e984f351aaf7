"""Streaming prefetch tests (SURVEY.md §5.7): order/content preservation,
bounded prefetch depth, exception propagation."""

import time

import numpy as np
import pytest

from modelcompression_tpu.data.streaming import prefetch_to_device


def test_order_and_content_preserved():
    batches = [np.full((4, 4), i, np.int32) for i in range(10)]
    out = list(prefetch_to_device(iter(batches), depth=2))
    assert len(out) == 10
    for i, x in enumerate(out):
        np.testing.assert_array_equal(np.asarray(x), batches[i])


def test_pytree_items():
    items = [(np.ones(3) * i, {"k": np.zeros(2) + i}) for i in range(4)]
    out = list(prefetch_to_device(items, depth=1))
    for i, (a, d) in enumerate(out):
        np.testing.assert_array_equal(np.asarray(a), np.ones(3) * i)
        np.testing.assert_array_equal(np.asarray(d["k"]), np.zeros(2) + i)


def test_producer_runs_ahead():
    """With depth=2 the producer prepares batches while the consumer is
    busy. Asserted STRUCTURALLY (producer's progress observed ahead of the
    consumer's), not by wall clock — absolute timing bounds flake on a
    loaded machine (sleeps oversleep), while relative thread progress
    holds."""
    produced = []

    def slow_source():
        for i in range(6):
            time.sleep(0.05)
            produced.append(i)
            yield np.asarray([i])

    seen = 0
    ran_ahead = 0
    for x in prefetch_to_device(slow_source(), depth=2,
                                put=lambda v: v):
        time.sleep(0.05)  # consumer work, overlapped with production
        seen += 1
        # while the consumer handled item (seen-1), how far did the
        # producer get? > seen means it produced beyond what a serial
        # (produce-then-consume) interleaving would have at this point.
        ran_ahead = max(ran_ahead, len(produced) - seen)
    assert seen == 6
    assert ran_ahead >= 1, (ran_ahead, produced)


def test_exception_propagates():
    def bad_source():
        yield np.ones(2)
        raise ValueError("boom")

    it = prefetch_to_device(bad_source(), depth=2)
    next(it)
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_abandoned_iterator_releases_feeder():
    """Consumer bails early: the feeder thread must terminate instead of
    blocking forever on a full queue holding buffers."""
    import threading

    n_before = threading.active_count()
    items = (np.full((4,), i) for i in range(100))
    it = prefetch_to_device(items, depth=1, put=lambda x: x)
    next(it)
    it.close()  # GeneratorExit -> finally -> stop event
    deadline = time.time() + 5.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before
