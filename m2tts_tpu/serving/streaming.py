"""Streaming chunked vocoder: low-latency single-stream synthesis.

Named in BASELINE.json ("Streaming chunked vocoder inference with
overlap-add"). The vocoder stack is fully convolutional with a small
receptive field (input conv k3 → ~±2.5 input frames end-to-end across the
tconv/resblock stages), so chunked execution with a frame *halo* on each
side reproduces the full-graph output exactly:

- mel frames are processed in fixed ``chunk_frames`` windows with
  ``halo_frames`` of context on each side (zero-padded at utterance
  boundaries, matching the full graph's SAME-padding),
- one compiled graph serves every chunk; only the final partial chunk is
  masked on the host,
- the same vocoder params/kernels serve the batch path (BASELINE.json:
  "batched and streaming vocoder paths share the same kernels").

Exactness (streamed == full graph, bit-for-bit up to fp reassociation) is
asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from m2tts_tpu.models.tts_model import M2TTS
from m2tts_tpu.utils.tree import cast_params_bf16

# End-to-end receptive field of the vocoder in input (mel) frames:
# input conv ±1, first tconv ±1, then ±(2/r1 + 1/r1 + 2/(r1 r2) + ...)
# < 0.5 for every supported rate config. 4 frames is safely conservative.
DEFAULT_HALO_FRAMES = 4


class StreamingVocoder:
    """Chunked mel→waveform streaming over a shared compiled vocoder."""

    def __init__(self, model: M2TTS, params, chunk_frames: int = 64,
                 halo_frames: int = DEFAULT_HALO_FRAMES,
                 vocoder_backend: str = "xla",
                 compute_dtype: str = "f32"):
        """``vocoder_backend``: same implementations as the batch
        Synthesizer ('xla' | 'mm' | 'pallas' | 'pallas_packed'), all
        numerically identical — the streaming and batch paths literally
        share the kernels (BASELINE.json: "batched and streaming vocoder
        paths share the same kernels"). The packed kernel falls back to
        the XLA module per window shape its tiling cannot serve (the
        short-utterance path sees arbitrary lengths).

        ``compute_dtype``: 'bf16' casts params inside the compiled chunk
        (matching the batch Synthesizer's bf16 serving graph); 'auto' =
        bf16 on TPU. Default 'f32' — the streamed==full-graph exactness
        contract is tightest there."""
        import jax as _jax

        if compute_dtype == "auto":
            compute_dtype = ("bf16" if _jax.default_backend() == "tpu"
                             else "f32")
        self.compute_dtype = compute_dtype
        self.model = model
        self.params = params
        self.chunk_frames = chunk_frames
        self.halo = halo_frames
        self.upsample = 1
        for r in model.upsample_rates:
            self.upsample *= r

        if vocoder_backend in ("pallas", "pallas_packed"):
            # the fused kernels tile time in 16-frame blocks; widen the
            # halo until the window is tile-aligned (extra halo is pure
            # overcompute, never a semantics change)
            from m2tts_tpu.ops.pallas.vocoder import DEFAULT_TILE

            while (chunk_frames + 2 * self.halo) % DEFAULT_TILE:
                self.halo += 1
        window = self.halo + chunk_frames + self.halo
        self.vocoder_backend = vocoder_backend

        def xla_vf(p, mel):
            return model.apply(p, mel,
                               method=lambda m, x: m.vocoder(x))[..., 0]

        if vocoder_backend == "xla":
            vf = xla_vf
        else:
            # the SAME dispatch the batch path serves with — one shared
            # definition so the kernels (and their compute_dtype) cannot
            # drift between paths (a hand-copied version of this block
            # once ran the 'pallas' kernel f32 under a bf16 config)
            from m2tts_tpu.serving.pipeline import make_kernel_vocoder_fn

            vf = make_kernel_vocoder_fn(model, vocoder_backend,
                                        self.compute_dtype, xla_vf)

        bf16 = self.compute_dtype == "bf16" and vocoder_backend == "xla"

        def run_chunk(params, mel_window):
            """mel_window: [B, window, C] → window audio [B, window*U].
            The variable center slice happens on the host (the last chunk's
            offset differs, and output shapes under jit must be static)."""
            if bf16:  # packed-weight (mm/pallas) kernels stay f32
                params = cast_params_bf16(params)
                mel_window = mel_window.astype(jnp.bfloat16)
            return vf(params, mel_window).astype(jnp.float32)

        self._run_chunk = jax.jit(run_chunk)
        # un-jitted chunk body, for callers that fuse it into a larger
        # graph (StreamingSynthesizer's acoustic+first-chunk dispatch)
        self._chunk_body = run_chunk

        def run_chunk_at(params, mel, total, ci):
            """Chunk ``ci`` of a DEVICE-resident padded mel [B, Tmax, C]:
            the window start is computed in-graph from the true length and
            sliced with dynamic_slice — no per-chunk host↔device mel
            traffic (a standalone H2D upload costs ~30 ms on tunneled
            hosts). ``ci`` is a traced int32 scalar so one compilation
            serves every chunk position; the host mirrors the same w
            formula to trim the yielded center."""
            T = jnp.minimum(total[0].astype(jnp.int32), mel.shape[1])
            s = ci * self.chunk_frames
            w = jnp.clip(s - self.halo, 0, T - window)
            mel_w = jax.lax.dynamic_slice_in_dim(mel, w, window, axis=1)
            return run_chunk(params, mel_w)

        self._run_chunk_at = jax.jit(run_chunk_at)
        # tiny reusable device scalars for chunk indices (a fresh python
        # int argument would be one standalone H2D transfer per chunk)
        self._ci_cache: dict = {}
        # short-utterance path: one JITTED full-graph call (compiled per
        # length, cached). An eager apply here would dispatch op-by-op —
        # ~30 ms per dispatch on tunneled hosts — and the StreamBatcher
        # runs this path while holding the shared device lock.
        self._full = jax.jit(lambda p, mel: model.apply(
            p, mel, method=lambda m, x: m.vocoder(x))[..., 0])
        self._window = window

    def stream(self, mel: np.ndarray, total_frames: Optional[int] = None
               ) -> Iterator[np.ndarray]:
        """Yield waveform chunks for ``mel`` [T, C] (single utterance).

        Windows are contiguous slices of the true mel, shifted inward at
        the utterance edges so the window boundary coincides with the
        array boundary there — the convs' own SAME zero-padding then
        reproduces the full graph's edge behavior exactly. (Zero-padding a
        halo would NOT be exact: conv biases give "zero" halo frames
        nonzero activations, unlike the full graph's true boundary.)
        """
        mel = np.asarray(mel)
        T = int(total_frames) if total_frames is not None else mel.shape[0]
        mel = mel[:T]
        U = self.upsample
        W = self._window
        if T <= W:
            # short utterance: one exact jitted full-graph call (tiny
            # compile, cached per length)
            audio = np.asarray(self._full(self.params,
                                          jnp.asarray(mel[None])))[0]
            yield audio
            return
        n_chunks = -(-T // self.chunk_frames)
        for ci in range(n_chunks):
            s = ci * self.chunk_frames
            e = min(s + self.chunk_frames, T)
            w = min(max(s - self.halo, 0), T - W)
            window = mel[w: w + W][None]
            audio = np.asarray(self._run_chunk(self.params,
                                               jnp.asarray(window)))[0]
            off = (s - w) * U
            yield audio[off: off + (e - s) * U]

    def _ci(self, ci: int) -> jnp.ndarray:
        arr = self._ci_cache.get(ci)
        if arr is None:
            arr = jnp.asarray(ci, jnp.int32)
            if len(self._ci_cache) < 4096:
                self._ci_cache[ci] = arr
        return arr

    def stream_device(self, mel, total, total_frames: int,
                      start_chunk: int = 0) -> Iterator[np.ndarray]:
        """``stream()`` for a DEVICE-resident padded mel [1, Tmax, C]
        (``total`` is the device [B] frame-count array from the acoustic
        graph; ``total_frames`` its already-fetched host value).

        Two link-traffic differences from ``stream()``: windows are
        sliced on device (zero per-chunk H2D), and chunk i+1 is
        dispatched before chunk i's audio is fetched, overlapping device
        compute with the D2H copy. Yields identical values (same
        compiled chunk body on the same window values)."""
        T = int(total_frames)
        U, W, cf = self.upsample, self._window, self.chunk_frames
        if T <= W:
            # boundary-exact short path needs the true-length host mel
            yield from self.stream(np.asarray(mel[0]), T)
            return
        n_chunks = -(-T // cf)
        pending = None  # (device audio, center offset, center samples)
        for ci in range(start_chunk, n_chunks):
            s = ci * cf
            e = min(s + cf, T)
            w = min(max(s - self.halo, 0), T - W)  # mirrors run_chunk_at
            out = self._run_chunk_at(self.params, mel, total, self._ci(ci))
            if pending is not None:
                a, off, n = pending
                yield np.asarray(a)[0, off: off + n]
            pending = (out, (s - w) * U, (e - s) * U)
        if pending is not None:
            a, off, n = pending
            yield np.asarray(a)[0, off: off + n]

    def synthesize(self, mel: np.ndarray,
                   total_frames: Optional[int] = None) -> np.ndarray:
        """Convenience: concatenate all streamed chunks."""
        return np.concatenate(list(self.stream(mel, total_frames)))


class StreamingSynthesizer:
    """Text → first-audio-chunk latency path: one compiled acoustic pass,
    then chunked vocoding. Shares params with the batch Synthesizer."""

    def __init__(self, model: M2TTS, params, chunk_frames: int = 64,
                 max_frames: int = 1000, text_bucket: int = 128,
                 halo_frames: int = DEFAULT_HALO_FRAMES,
                 vocoder_backend: str = "xla",
                 compute_dtype: str = "f32",
                 sample_rate: int = 22050):
        from m2tts_tpu.frontend.text import TextProcessor

        self.model = model
        self.params = params
        self.max_frames = max_frames
        self.text_bucket = text_bucket
        self.sample_rate = sample_rate  # for gap sizing in long-form only
        self.text_processor = TextProcessor()
        self.vocoder = StreamingVocoder(model, params, chunk_frames,
                                        halo_frames,
                                        vocoder_backend=vocoder_backend,
                                        compute_dtype=compute_dtype)
        bf16 = self.vocoder.compute_dtype == "bf16"

        def acoustic(params, ids, lengths, scale):
            if bf16:  # match the batch Synthesizer's bf16 serving graph
                params = cast_params_bf16(params)
            enc, mask = model.apply(params, ids, lengths, True,
                                    method=lambda m, i, l, d:
                                    m.text_encoder(i, l, d))
            durations = model.apply(params, enc, True,
                                    method=lambda m, e, d:
                                    m.duration_predictor(e, d))
            # padded phonemes contribute zero frames (matches
            # M2TTS.acoustic; keeps streaming == batch pipeline)
            durations = durations * mask.astype(durations.dtype)
            from m2tts_tpu.ops.length_regulator import regulate_lengths

            regulated, frame_mask, total = regulate_lengths(
                enc, durations * scale, max_frames)
            mel = model.apply(
                params, regulated,
                frame_mask if model.mask_decoder else None,
                method=lambda m, x, mask: m.decoder(x, mask, True))
            # f32 at the host boundary regardless of compute dtype (the
            # chunked vocoder re-casts per chunk)
            return mel.astype(jnp.float32), total

        self._acoustic = jax.jit(acoustic)

        # Fused acoustic + first-chunk dispatch: the first audio chunk's
        # window is always mel[0:W] (the chunk-0 window start is 0
        # whenever total > W), so it can be vocoded INSIDE the acoustic
        # graph — first-chunk latency drops from (acoustic dispatch +
        # blocking total fetch + full-mel D2H + window H2D + chunk
        # dispatch + audio D2H) to ONE dispatch + ONE combined fetch.
        # On tunneled/PCIe hosts each eliminated blocking round trip is
        # ~30 ms (DESIGN.md §3). The mel stays device-resident for the
        # remaining chunks (StreamingVocoder.stream_device).
        W = self.vocoder._window
        cf = self.vocoder.chunk_frames
        U = self.vocoder.upsample
        chunk_body = self.vocoder._chunk_body

        def acoustic_first(params, ids, lengths, scale):
            mel, total = acoustic(params, ids, lengths, scale)
            audio0 = chunk_body(params, mel[:, :W])
            # only the chunk-0 center crosses the link (frames > W ≥ cf
            # on this path, so the center is always the full cf frames)
            return mel, total, audio0[:, : cf * U]

        self._acoustic_first = (jax.jit(acoustic_first)
                                if max_frames >= W else None)
        self._scale_cache: dict = {}

    def _scale_arr(self, duration_scale) -> jnp.ndarray:
        key = float(duration_scale)
        arr = self._scale_cache.get(key)
        if arr is None:
            arr = jnp.asarray(key, jnp.float32)
            if len(self._scale_cache) < 256:
                self._scale_cache[key] = arr
        return arr

    def split_long(self, text: str) -> list:
        """Over-budget texts sentence-split to the phoneme budget (same
        splitter as Synthesizer.synthesize_long); under-budget texts pass
        through whole. The frontend would otherwise silently truncate at
        ``text_bucket`` (frontend/text.py pads/clips to max_length)."""
        budget = self.text_bucket - 2  # room for the SIL wrap
        if len(self.text_processor.text_to_phonemes(text)) <= budget:
            return [text]
        from m2tts_tpu.serving.pipeline import split_text_to_budget

        return split_text_to_budget(text, self.text_processor, budget)

    def gap(self, gap_ms: float) -> np.ndarray:
        """Join silence between long-form sentence chunks (mirrors
        synthesize_long's gap policy)."""
        return np.zeros(int(self.sample_rate * gap_ms / 1000.0), np.float32)

    def stream(self, text: str, duration_scale: float = 1.0,
               gap_ms: float = 120.0) -> Iterator[np.ndarray]:
        """Yield waveform chunks for ``text`` of ANY length: over-budget
        texts are sentence-split and stream in sequence with ``gap_ms``
        of silence at joins — first-chunk latency stays one sentence
        regardless of total length."""
        for i, chunk in enumerate(self.split_long(text)):
            if i:
                yield self.gap(gap_ms)
            yield from self._stream_one(chunk, duration_scale)

    def _stream_one(self, text: str, duration_scale: float
                    ) -> Iterator[np.ndarray]:
        enc = self.text_processor.batch([text], self.text_bucket)
        ids = jnp.asarray(enc["phoneme_ids"])
        lens = jnp.asarray(enc["lengths"])
        scale = self._scale_arr(duration_scale)
        if self._acoustic_first is None:  # max_frames < one chunk window
            mel, total = self._acoustic(self.params, ids, lens, scale)
            frames = int(min(int(total[0]), self.max_frames))
            yield from self.vocoder.stream(np.asarray(mel[0]), frames)
            return
        mel, total, audio0 = self._acoustic_first(self.params, ids, lens,
                                                  scale)
        host = jax.device_get({"total": total, "audio0": audio0})
        frames = int(min(int(host["total"][0]), self.max_frames))
        W = self.vocoder._window
        cf = self.vocoder.chunk_frames
        if frames <= W:
            # short utterance: chunk 0's fixed [0:W] window would read
            # past the true length; the boundary-exact single full-graph
            # call is the correct (and cheap) path
            yield from self.vocoder.stream(np.asarray(mel[0]), frames)
            return
        yield host["audio0"][0]
        if frames > cf:
            yield from self.vocoder.stream_device(mel, total, frames,
                                                  start_chunk=1)
