"""Device-side audio codecs for bandwidth-bound serving.

The reference has no serving layer at all (synthesis writes WAV files,
``/root/reference/scripts/synthesize.py:91-161``); this module exists
for the TPU deployment reality that SURVEY/BASELINE set as the rebuild's
north star: on a PCIe or tunneled host the device→host link — not the
chip — bounds delivered audio throughput (bench r03: 41k audio-s/s on
device vs ~840 delivered through a ~37 MB/s link at int16). Halving the
bytes per sample halves the bottleneck.

G.711 μ-law is the standard 2:1 speech companding codec (8 bits/sample,
~38 dB SQNR on speech): every WAV player understands format tag 7 and
telephony stacks consume it natively. The encoder here is the exact
bit-level G.711 algorithm (bias 0x84, clip 32635, segment exponent +
4-bit mantissa, complemented output), written as branch-free vector ops
so it runs INSIDE the compiled synthesis graph on the VPU — the audio
leaves HBM already companded, so the transfer is half-size. The decoder
is a 256-entry table lookup for hosts/tests.

Encode/decode round-trips bit-exactly against the classic reference
tables (tests/test_audio_codec.py checks all 65536 int16 codes).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_BIAS = 0x84  # 132
_CLIP = 32635


def mulaw_encode_pcm16(pcm) -> jnp.ndarray:
    """Exact G.711 μ-law encode of int16 PCM, as jax ops (jit-safe).

    Branch-free formulation: the segment exponent floor(log2(biased>>7))
    is a sum of seven threshold comparisons and the mantissa shift is an
    elementwise variable right-shift — both VPU-native, no gathers.
    Returns uint8 with the same shape.
    """
    s = jnp.asarray(pcm, dtype=jnp.int32)
    sign = jnp.where(s < 0, jnp.int32(0x80), jnp.int32(0))
    mag = jnp.minimum(jnp.abs(s), _CLIP) + _BIAS  # [132, 32767]
    # exponent = floor(log2(mag >> 7)) over [1, 255] → 0..7
    exponent = (
        (mag >= 256).astype(jnp.int32)
        + (mag >= 512).astype(jnp.int32)
        + (mag >= 1024).astype(jnp.int32)
        + (mag >= 2048).astype(jnp.int32)
        + (mag >= 4096).astype(jnp.int32)
        + (mag >= 8192).astype(jnp.int32)
        + (mag >= 16384).astype(jnp.int32)
    )
    mantissa = jnp.right_shift(mag, exponent + 3) & 0x0F
    byte = ~(sign | (exponent << 4) | mantissa) & 0xFF
    return byte.astype(jnp.uint8)


def mulaw_encode_f32(audio) -> jnp.ndarray:
    """float32 waveform in [-1, 1] → μ-law bytes (clips, then exact
    int16 quantization identical to the serving PCM path, then G.711)."""
    pcm = (jnp.clip(audio, -1.0, 1.0) * 32767.0).astype(jnp.int16)
    return mulaw_encode_pcm16(pcm)


def _build_decode_table() -> np.ndarray:
    u = np.arange(256, dtype=np.int32) ^ 0xFF  # ~byte, as uint8 bits
    sign = (u & 0x80) != 0
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    t = ((mantissa << 3) + _BIAS) << exponent
    lin = np.where(sign, _BIAS - t, t - _BIAS)
    return lin.astype(np.int16)


#: 256-entry μ-law byte → linear int16 table (host-side decode).
MULAW_DECODE_TABLE: np.ndarray = _build_decode_table()


def mulaw_decode_np(data: np.ndarray) -> np.ndarray:
    """μ-law bytes → int16 PCM (one table-gather pass on the host)."""
    return MULAW_DECODE_TABLE[np.asarray(data, dtype=np.uint8)]


def _build_encode_table() -> np.ndarray:
    """All 65536 int16 codes → μ-law byte, via the same bit algorithm in
    numpy (used for host-side encode of streaming chunks and by tests as
    the independent cross-check of the jax encoder)."""
    s = np.arange(-32768, 32768, dtype=np.int32)
    sign = np.where(s < 0, 0x80, 0)
    mag = np.minimum(np.abs(s), _CLIP) + _BIAS
    exponent = np.zeros_like(mag)
    for threshold in (256, 512, 1024, 2048, 4096, 8192, 16384):
        exponent += (mag >= threshold).astype(np.int32)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    byte = ~(sign | (exponent << 4) | mantissa) & 0xFF
    return byte.astype(np.uint8)


_ENCODE_TABLE: np.ndarray | None = None


def mulaw_encode_np(pcm: np.ndarray) -> np.ndarray:
    """Host-side int16 → μ-law byte via a lazily-built 64 KiB table
    (one gather pass; used where the device graph already emitted
    int16, e.g. streaming chunk fan-out)."""
    global _ENCODE_TABLE
    if _ENCODE_TABLE is None:
        _ENCODE_TABLE = _build_encode_table()
    idx = np.asarray(pcm, dtype=np.int64) + 32768
    return _ENCODE_TABLE[idx]
