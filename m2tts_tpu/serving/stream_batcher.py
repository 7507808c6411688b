"""Multi-stream batching for the streaming synthesis path.

The solo streaming path (`serving/streaming.py`) vocodes one chunk per
dispatch at batch 1 — under N concurrent streams the chip serializes N
tiny dispatches per chunk interval, and on tunneled hosts each dispatch
also pays the ~30 ms host round trip. But every stream's chunk window
has the SAME fixed shape ([window, mel_channels]) regardless of where in
its utterance the stream is, so any set of active streams can share ONE
batched vocoder dispatch per tick: stack the windows, run the compiled
chunk graph once at a padded batch bucket, scatter the per-stream
slices. Chunk latency stays one dispatch; concurrent capacity scales
with the batch bucket instead of dividing by it.

Two coalescing stages, mirroring `serving/batcher.py`'s request pattern:

- **Admission**: concurrent `stream()` calls' acoustic passes (text →
  mel) are collected for ``max_wait_ms`` and run as one batched
  dispatch per duration scale (the scale is a traced scalar of the
  compiled acoustic graph, so mixed scales split the batch). The
  admission worker also activates the stream, so by the time an
  admission resolves its chunks are already being scheduled.
- **Chunking**: a scheduler thread snapshots the active streams each
  tick, dispatches one batched window, and round-robins when more than
  ``max_streams`` are active.

Exactness: the chunk graph is batch-independent (pure convs), so the
batched windows reproduce the solo streaming output — asserted in
tests/test_stream_batcher.py against `StreamingSynthesizer.stream`.

The reference has no serving layer at all (its only inference surface is
the one-shot scripts/synthesize.py, reference scripts/synthesize.py:
91-161); this is rebuild-native machinery, spec'd by BASELINE.md's
serving/streaming north star.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from collections import deque
from typing import Dict, Iterator, List, Optional

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

_BUCKETS = (1, 2, 4, 8, 16)


def _bucket(n: int, cap: int) -> int:
    for b in _BUCKETS:
        if b >= n:
            return min(b, cap)
    return cap


class _Active:
    """One mid-flight stream: its mel, chunk cursor, and output queue."""

    __slots__ = ("mel", "frames", "ci", "n_chunks", "out")

    def __init__(self, mel: np.ndarray, frames: int, n_chunks: int):
        self.mel = mel
        self.frames = frames
        self.ci = 0
        self.n_chunks = n_chunks
        # (kind, payload): "chunk" | "done" | "error". Unbounded is safe:
        # a whole utterance of waveform chunks is small, and it keeps a
        # stalled consumer from ever blocking the shared scheduler.
        self.out: "queue.SimpleQueue[Tuple[str, Any]]" = queue.SimpleQueue()


class _PendingAdmit:
    __slots__ = ("ids", "length", "scale", "event", "mel", "frames",
                 "active", "error")

    def __init__(self, ids: np.ndarray, length: int, scale: float):
        self.ids = ids
        self.length = length
        self.scale = scale
        self.event = threading.Event()
        self.mel: Optional[np.ndarray] = None
        self.frames = 0
        self.active: Optional[_Active] = None  # None => short-utterance path
        self.error: Optional[BaseException] = None


class StreamBatcher:
    """Share batched dispatches across concurrent streaming sessions.

    Parameters
    ----------
    streamer : StreamingSynthesizer
        The shared compiled acoustic + chunked-vocoder pipeline.
    lock : threading.Lock, optional
        Device-access lock shared with the server's other routes.
    max_streams : int
        Chunk-dispatch batch cap (window batches pad up to the enclosing
        power-of-two bucket, so one compile per bucket).
    max_wait_ms : float
        Admission straggler window opened by the first queued request
        (first-chunk latency cost is bounded by this).
    """

    def __init__(self, streamer, lock: Optional[threading.Lock] = None,
                 max_streams: int = 8, max_wait_ms: float = 5.0):
        self.streamer = streamer
        self.lock = lock if lock is not None else threading.Lock()
        self.max_streams = int(max_streams)
        self.max_wait = float(max_wait_ms) / 1000.0
        sv = streamer.vocoder
        self._sv = sv
        self._U = sv.upsample
        self._W = sv._window
        self._chunk = sv.chunk_frames
        self._halo = sv.halo
        self._closed = False
        self._submit_mu = threading.Lock()
        self._admit_q: "queue.SimpleQueue[Optional[_PendingAdmit]]" = (
            queue.SimpleQueue())
        self._mu = threading.Lock()          # guards _active + _idle pairing
        self._active: deque = deque()
        self._wake = threading.Event()       # scheduler: work arrived
        self._idle = threading.Event()       # close(): scheduler drained
        self._idle.set()
        # introspection (tests + /healthz); streams_served counts
        # admitted utterance chunks (long-form texts admit one per
        # sentence chunk)
        self.streams_served = 0
        self.chunk_dispatches = 0
        self.chunks_emitted = 0
        self._admitter = threading.Thread(target=self._admit_loop,
                                          daemon=True, name="stream-admit")
        self._scheduler = threading.Thread(target=self._schedule_loop,
                                           daemon=True, name="stream-sched")
        self._admitter.start()
        self._scheduler.start()

    # -- client side ----------------------------------------------------------
    def stream(self, text: str, duration_scale: float = 1.0,
               timeout: Optional[float] = None, gap_ms: float = 120.0
               ) -> Iterator[np.ndarray]:
        """Admit ``text`` (blocks until its acoustic pass ran, coalesced
        with concurrent arrivals) and return the chunk iterator; safe
        from many threads. ``timeout`` bounds each wait.

        Texts of ANY length: over-budget texts are sentence-split (same
        splitter as the batch long-form path) and every sentence admits
        at once — they all synthesize concurrently in the shared batched
        dispatches while the consumer yields them in order, with
        ``gap_ms`` of join silence."""
        st = self.streamer
        pendings = []
        for chunk in st.split_long(text):
            enc = st.text_processor.batch([chunk], st.text_bucket)
            pendings.append(_PendingAdmit(np.asarray(enc["phoneme_ids"][0]),
                                          int(enc["lengths"][0]),
                                          float(duration_scale)))
        with self._submit_mu:
            if self._closed:
                raise RuntimeError("stream batcher is closed")
            for p in pendings:
                self._admit_q.put(p)
        for p in pendings:
            if not p.event.wait(timeout):
                raise TimeoutError(
                    f"acoustic pass not ready within {timeout}s")
            if p.error is not None:
                raise p.error
        return self._consume_all(pendings, timeout, gap_ms)

    def _consume_all(self, pendings: List[_PendingAdmit],
                     timeout: Optional[float], gap_ms: float
                     ) -> Iterator[np.ndarray]:
        for i, p in enumerate(pendings):
            if i:
                yield self.streamer.gap(gap_ms)
            if p.active is None:
                yield from self._stream_short(p.mel, p.frames)
            else:
                yield from self._consume(p.active, timeout)

    def _stream_short(self, mel: np.ndarray, frames: int
                      ) -> Iterator[np.ndarray]:
        # short utterance: the solo path's exact full-graph call (one
        # dispatch; batching padded mels would change edge behavior)
        with self.lock:
            chunks = list(self._sv.stream(mel, frames))
        with self._mu:  # consumer threads race on the counter
            self.streams_served += 1
        yield from chunks

    def _consume(self, s: _Active, timeout: Optional[float]
                 ) -> Iterator[np.ndarray]:
        while True:
            try:
                kind, payload = s.out.get(timeout=timeout)
            except queue.Empty:
                raise TimeoutError(f"chunk not ready within {timeout}s")
            if kind == "chunk":
                yield payload
            elif kind == "done":
                with self._mu:  # consumer threads race on the counter
                    self.streams_served += 1
                return
            else:
                raise payload

    def warmup(self) -> int:
        """Pre-compile the acoustic and chunk graphs at every batch
        bucket ≤ ``max_streams``. Without this, each arrival
        interleaving that first hits a new bucket pays that bucket's
        compile mid-request (measured: a cold 4-stream burst takes
        seconds; warm, a fraction of the serialized wall). Returns the
        number of graphs touched."""
        st = self.streamer
        sv = self._sv
        C = sv.model.mel_channels
        n = 0
        # exactly the buckets the dispatcher can select — including the
        # cap itself when max_streams is not a power of two (e.g. cap 6:
        # buckets 1, 2, 4, 6)
        reachable = sorted({_bucket(k, self.max_streams)
                            for k in range(1, self.max_streams + 1)})
        with self.lock:
            for b in reachable:
                ids = np.zeros((b, st.text_bucket), np.int32)
                lengths = np.ones((b,), np.int32)
                st._acoustic(st.params, jnp.asarray(ids),
                             jnp.asarray(lengths),
                             jnp.asarray(1.0, jnp.float32))
                sv._run_chunk(sv.params,
                              jnp.asarray(np.zeros((b, self._W, C),
                                                   np.float32)))
                n += 2
        return n

    def close(self) -> None:
        """Stop both workers. Admissions enqueued before the close still
        resolve, and already-admitted streams drain to completion.
        (The scheduler refuses to exit while the admitter is alive, so a
        close racing a slow admission — e.g. a cold acoustic compile —
        can never strand that admission's consumers.)"""
        with self._submit_mu:
            if self._closed:
                return
            self._closed = True
            self._admit_q.put(None)
        # no timeout: admissions always terminate (device calls return
        # or raise), and every admitted stream must be in _active before
        # the drain wait below can be trusted
        self._admitter.join()
        self._idle.wait(timeout=600)
        self._wake.set()
        self._scheduler.join(timeout=60)

    # -- admission worker -----------------------------------------------------
    def _admit_loop(self) -> None:
        while True:
            first = self._admit_q.get()
            if first is None:
                return
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            stop = False
            while len(batch) < self.max_streams:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._admit_q.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    stop = True
                    break
                batch.append(item)
            self._admit_batch(batch)
            if stop:
                return

    def _admit_batch(self, batch: List[_PendingAdmit]) -> None:
        by_scale: Dict[float, List[_PendingAdmit]] = {}
        for p in batch:
            by_scale.setdefault(p.scale, []).append(p)
        st = self.streamer
        for scale, group in by_scale.items():
            try:
                B = _bucket(len(group), self.max_streams)
                # pad slots repeat the last real row: discarded below, and
                # (unlike zeros) guaranteed as well-behaved as real inputs
                ids = np.stack([p.ids for p in group]
                               + [group[-1].ids] * (B - len(group)))
                lengths = np.array([p.length for p in group]
                                   + [group[-1].length] * (B - len(group)),
                                   np.int32)
                import jax

                with self.lock:
                    out = st._acoustic(
                        st.params, jnp.asarray(ids), jnp.asarray(lengths),
                        jnp.asarray(scale, jnp.float32))
                    # ONE blocking fetch for both outputs (a standalone
                    # transfer costs ~30 ms on tunneled hosts — straight
                    # off every stream's first-chunk latency)
                    mel, total = jax.device_get(out)
                for i, p in enumerate(group):
                    p.frames = int(min(int(total[i]), st.max_frames))
                    p.mel = mel[i]
                    if p.frames > self._W:
                        p.active = _Active(p.mel, p.frames,
                                           -(-p.frames // self._chunk))
                        with self._mu:
                            self._active.append(p.active)
                            self._idle.clear()
                        self._wake.set()
            except BaseException as e:
                logger.exception("batched acoustic pass failed "
                                 "(%d streams)", len(group))
                for p in group:
                    p.error = e
            finally:
                for p in group:
                    p.event.set()

    # -- chunk scheduler ------------------------------------------------------
    def _schedule_loop(self) -> None:
        while True:
            with self._mu:
                group = [self._active[i]
                         for i in range(min(len(self._active),
                                            self.max_streams))]
                self._active.rotate(-len(group))  # round-robin fairness
                if not group:
                    self._idle.set()
            if not group:
                # exit only when no admission can still activate a stream
                if self._closed and not self._admitter.is_alive():
                    return
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            done: List[_Active] = []
            try:
                n = len(group)
                B = _bucket(n, self.max_streams)
                # identical window math to StreamingVocoder.stream:
                # contiguous slices, shifted inward at utterance edges for
                # exact SAME padding; pad slots repeat the last window
                windows = []
                offs = []
                for s in group:
                    start = s.ci * self._chunk
                    w = min(max(start - self._halo, 0), s.frames - self._W)
                    windows.append(s.mel[w: w + self._W])
                    offs.append((start - w) * self._U)
                windows += [windows[-1]] * (B - n)
                with self.lock:
                    audio = np.asarray(self._sv._run_chunk(
                        self._sv.params, jnp.asarray(np.stack(windows))))
                self.chunk_dispatches += 1
                for i, s in enumerate(group):
                    start = s.ci * self._chunk
                    end = min(start + self._chunk, s.frames)
                    s.out.put(("chunk",
                               audio[i, offs[i]:
                                     offs[i] + (end - start) * self._U]))
                    self.chunks_emitted += 1
                    s.ci += 1
                    if s.ci >= s.n_chunks:
                        s.out.put(("done", None))
                        done.append(s)
            except BaseException as e:
                logger.exception("batched chunk dispatch failed "
                                 "(%d streams)", len(group))
                for s in group:
                    s.out.put(("error", e))
                done = list(group)
            if done:
                with self._mu:
                    for s in done:
                        try:
                            self._active.remove(s)
                        except ValueError:
                            pass
