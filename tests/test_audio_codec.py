"""G.711 μ-law codec: bit-exactness, round-trip, and quality floor.

The encoder must match the classic branching reference implementation
(ulaw.c-style, independent of the vectorized formulation) on every one
of the 65536 int16 codes — serving advertises standard G.711 bytes and
any deviation breaks third-party decoders.
"""

import numpy as np
import pytest

from m2tts_tpu.ops.audio_codec import (
    MULAW_DECODE_TABLE,
    mulaw_decode_np,
    mulaw_encode_f32,
    mulaw_encode_np,
    mulaw_encode_pcm16,
)

_EXP_LUT = np.zeros(256, dtype=np.int32)
for _i in range(1, 8):
    _EXP_LUT[1 << _i : 1 << (_i + 1)] = _i
_EXP_LUT[128:] = 7


def _encode_ref(sample: int) -> int:
    """Classic branching G.711 encoder (independent reference)."""
    BIAS, CLIP = 0x84, 32635
    sign = (sample >> 8) & 0x80
    if sign:
        sample = -sample
    if sample > CLIP:
        sample = CLIP
    sample += BIAS
    exponent = int(_EXP_LUT[(sample >> 7) & 0xFF])
    mantissa = (sample >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def test_encode_matches_branching_reference_all_codes():
    pcm = np.arange(-32768, 32768, dtype=np.int16)
    got = np.asarray(mulaw_encode_pcm16(pcm))
    want = np.array([_encode_ref(int(s)) for s in pcm], dtype=np.uint8)
    np.testing.assert_array_equal(got, want)


def test_host_table_encoder_matches_jax_encoder():
    pcm = np.arange(-32768, 32768, dtype=np.int16)
    np.testing.assert_array_equal(
        mulaw_encode_np(pcm), np.asarray(mulaw_encode_pcm16(pcm)))


def test_decode_encode_idempotent_on_all_bytes():
    # decode then re-encode reproduces every byte: the decode table hits
    # each segment's reconstruction level, which encodes back to itself.
    # Sole exception: negative zero (0x7F) decodes to 0, which re-encodes
    # as positive zero (0xFF) — canonical G.711 behavior.
    all_bytes = np.arange(256, dtype=np.uint8)
    linear = mulaw_decode_np(all_bytes)
    reenc = np.asarray(mulaw_encode_pcm16(linear))
    assert linear[0x7F] == 0 and reenc[0x7F] == 0xFF
    keep = all_bytes != 0x7F
    np.testing.assert_array_equal(reenc[keep], all_bytes[keep])


def test_decode_table_shape_and_range():
    assert MULAW_DECODE_TABLE.shape == (256,)
    assert MULAW_DECODE_TABLE.dtype == np.int16
    # canonical extrema of the G.711 decode table
    assert MULAW_DECODE_TABLE.min() == -32124
    assert MULAW_DECODE_TABLE.max() == 32124
    # 0xFF decodes to 0 (positive zero code)
    assert MULAW_DECODE_TABLE[0xFF] == 0


def test_f32_encode_matches_pcm_quantization_path():
    rng = np.random.default_rng(0)
    audio = rng.uniform(-1.3, 1.3, size=4096).astype(np.float32)
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    np.testing.assert_array_equal(
        np.asarray(mulaw_encode_f32(audio)),
        np.asarray(mulaw_encode_pcm16(pcm)))


def test_roundtrip_snr_on_speechlike_signal():
    rng = np.random.default_rng(1)
    t = np.arange(22050) / 22050.0
    # harmonic stack with an envelope, speech-like crest factor
    sig = sum(a * np.sin(2 * np.pi * f * t)
              for a, f in ((0.5, 180), (0.25, 360), (0.12, 720)))
    sig = (sig * (0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 3 * t)))
           + 0.002 * rng.standard_normal(t.size))
    pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int16)
    dec = mulaw_decode_np(np.asarray(mulaw_encode_pcm16(pcm)))
    err = dec.astype(np.float64) - pcm.astype(np.float64)
    snr_db = 10 * np.log10(
        np.mean(pcm.astype(np.float64) ** 2) / np.mean(err ** 2))
    assert snr_db > 30.0, snr_db


@pytest.mark.parametrize("shape", [(3, 17), (2, 4, 8)])
def test_encode_preserves_shape(shape):
    rng = np.random.default_rng(2)
    pcm = rng.integers(-32768, 32768, size=shape).astype(np.int16)
    out = np.asarray(mulaw_encode_pcm16(pcm))
    assert out.shape == shape and out.dtype == np.uint8
