"""On-device STFT / mel ops (JAX) for training losses.

The reference computes spectral losses with torch.stft on the accelerator
(reference src/training/losses.py:26-35) and all dataset mels with librosa
on the host. Here the loss-side transforms are pure-JAX fixed-shape ops —
framing is a static gather, the FFT is jnp.fft.rfft — so they fuse into
the jitted train step. Semantics match torch.stft / librosa defaults:
centered reflect padding, periodic Hann.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax import Array

from m2tts_tpu.frontend.audio import hann_window, mel_filterbank


def _window(n_fft: int, win_length: Optional[int]) -> np.ndarray:
    win_length = win_length or n_fft
    w = hann_window(win_length).astype(np.float32)
    lpad = (n_fft - win_length) // 2
    return np.pad(w, (lpad, n_fft - win_length - lpad))


def frame(x: Array, n_fft: int, hop_length: int, center: bool = True) -> Array:
    """[B, T] → [B, n_frames, n_fft] framing via static gather."""
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(n_fft)[None, :])
    return x[:, idx]


def stft(x: Array, n_fft: int, hop_length: int,
         win_length: Optional[int] = None, center: bool = True) -> Array:
    """Complex STFT [B, n_frames, 1 + n_fft//2]."""
    w = jnp.asarray(_window(n_fft, win_length))
    frames = frame(x, n_fft, hop_length, center)
    return jnp.fft.rfft(frames * w[None, None, :], n=n_fft, axis=-1)


def stft_magnitude(x: Array, n_fft: int, hop_length: int,
                   win_length: Optional[int] = None) -> Array:
    return jnp.abs(stft(x, n_fft, hop_length, win_length))


def log_mel_features(x: Array, sample_rate: int = 22050, n_fft: int = 1024,
                     hop_length: int = 256, n_mels: int = 80) -> Array:
    """Log-mel features for the perceptual loss, using a *real* Slaney mel
    filterbank — the reference fakes one with `linspace` rows (reference
    src/training/losses.py:192-196); fixed here as SURVEY.md §7 recommends."""
    basis = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))  # [M, F]
    mag = stft_magnitude(x, n_fft, hop_length)  # [B, T, F]
    mel = jnp.einsum("btf,mf->btm", mag, basis)
    return jnp.log(mel + 1e-8)
