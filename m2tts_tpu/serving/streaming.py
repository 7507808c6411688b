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
        mel, total = self._acoustic(
            self.params, jnp.asarray(enc["phoneme_ids"]),
            jnp.asarray(enc["lengths"]),
            jnp.asarray(duration_scale, jnp.float32))
        frames = int(min(int(total[0]), self.max_frames))
        yield from self.vocoder.stream(np.asarray(mel[0]), frames)
