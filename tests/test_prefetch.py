"""Device prefetcher: ordering, exhaustion, error propagation, close."""

import time

import numpy as np
import pytest

from m2tts_tpu.data.prefetch import DevicePrefetcher


def test_yields_all_batches_in_order():
    batches = [{"x": np.full((2,), i)} for i in range(7)]
    pf = DevicePrefetcher(iter(batches), lambda b: {"x": b["x"] + 1})
    out = list(pf)
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b["x"], i + 1)


def test_source_error_propagates():
    def gen():
        yield {"x": np.zeros(1)}
        raise RuntimeError("boom in loader")

    pf = DevicePrefetcher(gen(), lambda b: b)
    next(pf)
    with pytest.raises(RuntimeError, match="boom in loader"):
        while True:
            next(pf)


def test_put_fn_error_propagates():
    def bad_put(b):
        raise ValueError("bad put")

    pf = DevicePrefetcher(iter([{"x": np.zeros(1)}]), bad_put)
    with pytest.raises(ValueError, match="bad put"):
        next(pf)


def test_close_stops_infinite_source():
    def forever():
        i = 0
        while True:
            yield {"i": np.full((1,), i)}
            i += 1

    pf = DevicePrefetcher(forever(), lambda b: b)
    next(pf)
    pf.close()
    assert not pf._thread.is_alive()


def test_prefetch_overlaps_slow_consumer():
    """While the consumer sleeps, the worker should fill the queue."""
    def gen():
        for i in range(4):
            yield {"i": i}

    seen = []
    pf = DevicePrefetcher(gen(), lambda b: (seen.append(b["i"]) or b))
    first = next(pf)
    time.sleep(0.2)  # worker should have prefetched ahead by now
    assert len(seen) >= 3  # first + depth-2 queue (+ possibly sentinel path)
    assert first["i"] == 0
    pf.close()


def test_next_after_close_raises_stop_iteration():
    """A consumer calling next() after close() (or racing it) must get
    StopIteration promptly, never block forever (ADVICE r2)."""
    def forever():
        while True:
            yield {"x": np.zeros(1)}

    pf = DevicePrefetcher(forever(), lambda b: b)
    next(pf)
    pf.close()
    t0 = time.time()
    with pytest.raises(StopIteration):
        while True:  # drain whatever close() left, then expect the stop
            next(pf)
            assert time.time() - t0 < 5.0
    assert time.time() - t0 < 5.0
