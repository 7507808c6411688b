"""Async device prefetcher: overlap host batch prep + H2D with compute.

The reference overlaps loading with torch DataLoader worker processes
(reference src/data/dataset.py:283-308, ``num_workers``/``prefetch_factor``);
the training hosts here have ONE CPU, so a single background *thread*
that runs the host-side prep (``put_fn``: segment slicing, dtype casts,
``jax.device_put``) while the main thread blocks on the compiled step is
the right shape — device transfers release the GIL, so the overlap is
real. Double-buffered by default (``depth=2``).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator

_OK, _DONE, _ERROR = 0, 1, 2


class DevicePrefetcher:
    """Wrap a batch iterator; apply ``put_fn`` ahead of the consumer.

    Iterator protocol: yields ``put_fn(batch)`` in source order, raises
    StopIteration on exhaustion, re-raises any source/``put_fn`` exception
    at the consumer's ``next()`` call. ``close()`` stops the worker thread
    (needed for infinite sources).
    """

    def __init__(self, source: Iterator[Any], put_fn: Callable[[Any], Any],
                 depth: int = 2):
        self._source = source
        self._put_fn = put_fn
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(int(depth), 1))
        self._stop = threading.Event()
        self._finished = False
        self._thread = threading.Thread(target=self._worker, daemon=True,
                                        name="device-prefetcher")
        self._thread.start()

    def _enqueue(self, item) -> None:
        # bounded put that aborts promptly on close()
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.05)
                return
            except queue.Full:
                continue

    def _worker(self) -> None:
        try:
            for batch in self._source:
                if self._stop.is_set():
                    return
                out = self._put_fn(batch)
                self._enqueue((_OK, out))
                if self._stop.is_set():
                    return
            self._enqueue((_DONE, None))
        except BaseException as e:  # propagate to the consumer thread
            self._enqueue((_ERROR, e))

    def __iter__(self) -> "DevicePrefetcher":
        return self

    def __next__(self) -> Any:
        if self._finished:
            raise StopIteration
        # bounded get: a consumer racing with (or arriving after) close()
        # must see StopIteration, not block forever on an empty queue the
        # stopped worker will never refill
        while True:
            try:
                kind, payload = self._queue.get(timeout=0.1)
                break
            except queue.Empty:
                if self._stop.is_set():
                    self._finished = True
                    raise StopIteration from None
        if kind == _OK:
            return payload
        self._finished = True
        if kind == _ERROR:
            raise payload
        raise StopIteration

    def close(self) -> None:
        """Stop the worker (drains the queue so a blocked put unblocks,
        then leaves a _DONE sentinel so any late consumer wakes)."""
        self._stop.set()
        while True:
            try:
                self._queue.get_nowait()
            except queue.Empty:
                break
        try:
            self._queue.put_nowait((_DONE, None))
        except queue.Full:  # worker refilled it; consumer still unblocks
            pass
        self._thread.join(timeout=5.0)
