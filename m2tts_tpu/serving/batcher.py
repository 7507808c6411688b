"""Dynamic request batching for the HTTP serving front door.

Production TTS serving sees many concurrent single-utterance requests;
the chip, meanwhile, synthesizes a 64-wide batch for barely more than
the cost of one utterance (the graph is HBM-bound, and on tunneled
hosts the per-dispatch round trip dwarfs compute — bench.py: 15.4 ms
device wall vs ~60-80 ms delivered for a single stream). Serializing
concurrent requests one-by-one therefore wastes almost the entire chip.

``DynamicBatcher`` coalesces concurrent ``submit()`` calls into one
``Synthesizer.synthesize_batch`` dispatch: the first arrival opens a
collection window of ``max_wait_ms`` (nothing waits longer than that
beyond its own synthesis), stragglers arriving inside the window join
the batch up to ``max_batch``, and requests with different
``duration_scale`` are grouped per scale (the scale is one traced
scalar per compiled batch). Results fan back to the blocked request
threads; a worker failure fans the exception back the same way, so a
bad batch can never wedge its callers.

The reference has no serving layer at all (its only inference surface
is the one-shot scripts/synthesize.py, reference scripts/synthesize.py:
91-161); this is rebuild-native machinery, spec'd by BASELINE.md's
serving north star.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)


class _Pending:
    __slots__ = ("text", "scale", "pcm_format", "event", "result", "error")

    def __init__(self, text: str, scale: float, pcm_format: str = "int16"):
        self.text = text
        self.scale = scale
        self.pcm_format = pcm_format
        self.event = threading.Event()
        self.result: Optional[Dict[str, Any]] = None
        self.error: Optional[BaseException] = None


class DynamicBatcher:
    """Coalesce concurrent synthesize requests into batched dispatches.

    Parameters
    ----------
    synth : Synthesizer
        The shared compiled pipeline.
    lock : threading.Lock, optional
        Device-access lock shared with other server routes (streaming,
        explicit batch). The worker takes it around each dispatch.
    max_batch : int, optional
        Per-dispatch cap; defaults to the largest compiled batch bucket
        (anything larger would recompile or pad-split anyway).
    max_wait_ms : float
        Straggler-collection window opened by the first queued request.
        Latency cost is bounded by this; throughput gain is up to
        ``max_batch``× under concurrency.
    """

    def __init__(self, synth, lock: Optional[threading.Lock] = None,
                 max_batch: Optional[int] = None,
                 max_wait_ms: float = 10.0):
        self.synth = synth
        self.lock = lock if lock is not None else threading.Lock()
        self.max_batch = int(max_batch or max(synth.batch_buckets))
        self.max_wait = float(max_wait_ms) / 1000.0
        self._q: "queue.SimpleQueue[Optional[_Pending]]" = queue.SimpleQueue()
        self._closed = False
        # serializes the closed-check with the enqueue so no request can
        # slip in behind the close sentinel and wait forever
        self._submit_mu = threading.Lock()
        # introspection (tests + /healthz)
        self.requests_served = 0
        self.batches_run = 0
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="dynamic-batcher")
        self._worker.start()

    # -- client side ----------------------------------------------------------
    def submit(self, text: str, duration_scale: float = 1.0,
               timeout: Optional[float] = None,
               pcm_format: str = "int16") -> Dict[str, Any]:
        """Block until the request's synthesis result is ready.

        Caller is responsible for routing texts over the phoneme budget
        to ``synthesize_long`` instead (they need chunking, not
        batching). Requests are grouped per (duration_scale, pcm_format)
        — each pair is its own compiled-graph family."""
        p = _Pending(text, float(duration_scale), pcm_format)
        with self._submit_mu:
            if self._closed:
                raise RuntimeError("batcher is closed")
            self._q.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError(f"synthesis not ready within {timeout}s")
        if p.error is not None:
            raise p.error
        assert p.result is not None
        return p.result

    def close(self) -> None:
        """Stop the worker. Everything enqueued before the close still
        drains (the worker exits only at the sentinel, and the submit
        mutex guarantees nothing lands behind it)."""
        with self._submit_mu:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)
        self._worker.join(timeout=30)

    # -- worker side ----------------------------------------------------------
    def _drain_window(self, first: _Pending):
        """Collect stragglers for up to max_wait; returns (batch, stop)."""
        batch = [first]
        deadline = time.monotonic() + self.max_wait
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                return batch, True
            batch.append(item)
        return batch, False

    def _run(self) -> None:
        stop = False
        while not stop:
            first = self._q.get()
            if first is None:
                return
            batch, stop = self._drain_window(first)
            by_key: Dict[tuple, list] = {}
            for p in batch:
                by_key.setdefault((p.scale, p.pcm_format), []).append(p)
            for (scale, fmt), group in by_key.items():
                try:
                    with self.lock:
                        results = self.synth.synthesize_batch(
                            [p.text for p in group], scale, pcm_format=fmt)
                    self.batches_run += 1
                    self.requests_served += len(group)
                    for p, r in zip(group, results):
                        p.result = r
                except BaseException as e:  # fan the failure back out
                    logger.exception("batched synthesis failed "
                                     "(%d requests)", len(group))
                    for p in group:
                        p.error = e
                finally:
                    for p in group:
                        p.event.set()
