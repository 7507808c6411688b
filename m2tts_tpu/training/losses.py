"""Loss functions (stage 1 + stage 2), fully jit-compatible.

Functional rebuild of the reference losses:

- ``stage1_losses``: masked mel L1 + duration MSE (reference
  training/train.py:48-107). The reference computes the mel term with a
  Python loop over the batch and per-element ``.item()`` syncs
  (train.py:88-94); here it is a mask-weighted reduction that fuses into
  the train step. Numerically identical up to reduction order.
- ``multi_resolution_stft_loss``: magnitude L1 + 0.1-weighted phase L1 at
  n_fft 512/1024/2048 with hop = n_fft/4 (reference losses.py:13-56).
- ``perceptual_loss``: log-mel-feature L1 with a real Slaney filterbank
  (fixing reference losses.py:192-196's fake linspace filterbank).
- LSGAN discriminator/generator losses + feature matching over the
  multi-scale discriminator's intermediate features (reference
  losses.py:120-163), with the same normalization constants.
- ``combined_generator_loss`` mirrors CombinedTTSLoss's generator mode and
  weights (reference losses.py:208-343).
- ``EarlyStopping``: patience counter on validation loss (losses.py:352).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
from jax import Array

from m2tts_tpu.ops.stft import log_mel_features, stft

STFT_RESOLUTIONS = (512, 1024, 2048)


# ---------------------------------------------------------------------------
# Stage 1
# ---------------------------------------------------------------------------

def masked_mel_l1(mel_pred: Array, mel_target: Array,
                  mel_lengths: Optional[Array]) -> Array:
    """Per-sample masked L1, averaged over the batch.

    Equals the reference's per-sample loop (train.py:88-94): each sample's
    L1 is averaged over its valid [:mel_len] frames, then the batch mean.
    Shapes: [B, T, C] channel-last.
    """
    if mel_lengths is None:
        return jnp.abs(mel_pred - mel_target).mean()
    T = mel_pred.shape[1]
    mask = (jnp.arange(T)[None, :] < mel_lengths[:, None]).astype(mel_pred.dtype)
    per_frame = jnp.abs(mel_pred - mel_target).mean(axis=-1)  # [B, T]
    per_sample = (per_frame * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)
    return per_sample.mean()


def duration_mse(duration_pred: Array, duration_target: Array) -> Array:
    """Unmasked MSE over the padded grid, as the reference computes it
    (train.py:101; padding positions are zero in both)."""
    return jnp.mean((duration_pred - duration_target) ** 2)


def stage1_losses(mel_pred: Array, mel_target: Array, duration_pred: Array,
                  duration_target: Array, mel_lengths: Optional[Array],
                  mel_weight: float = 1.0, duration_weight: float = 0.1
                  ) -> Dict[str, Array]:
    mel_loss = masked_mel_l1(mel_pred, mel_target, mel_lengths)
    dur_loss = duration_mse(duration_pred, duration_target)
    return {
        "mel_loss": mel_loss,
        "duration_loss": dur_loss,
        "total_loss": mel_weight * mel_loss + duration_weight * dur_loss,
    }


# ---------------------------------------------------------------------------
# Stage 2: spectral + perceptual
# ---------------------------------------------------------------------------

def multi_resolution_stft_loss(pred: Array, target: Array,
                               resolutions: Sequence[int] = STFT_RESOLUTIONS,
                               phase_weight: float = 0.1) -> Array:
    """pred/target: [B, T] waveforms of equal length."""
    total = 0.0
    for n_fft in resolutions:
        hop = n_fft // 4
        sp = stft(pred, n_fft, hop)
        st = stft(target, n_fft, hop)
        mag = jnp.abs(jnp.abs(sp) - jnp.abs(st)).mean()
        phase = jnp.abs(jnp.angle(sp) - jnp.angle(st)).mean()
        total = total + mag + phase_weight * phase
    return total / len(resolutions)


def perceptual_loss(pred: Array, target: Array, sample_rate: int = 22050,
                    n_mels: int = 80) -> Array:
    fp = log_mel_features(pred, sample_rate, n_mels=n_mels)
    ft = log_mel_features(target, sample_rate, n_mels=n_mels)
    return jnp.abs(fp - ft).mean()


def envelope_correlation_loss(pred: Array, target: Array,
                              sample_rate: int = 22050, n_fft: int = 512,
                              hop_length: int = 128,
                              n_bands: int = 16) -> Array:
    """1 − mean Pearson correlation of per-band short-time energy
    envelopes — the quantity STOI measures (Taal et al. 2011), as a
    differentiable training loss.

    The r04 ablation (artifacts/evidence_r04/sweep_summary.md) showed
    full-utterance STOI *degrading* under the reference's loss surface
    even with the adversary off: magnitude L1 + log-mel L1 are envelope-
    blind, so the vocoder trades band-envelope coherence for per-bin
    accuracy. This term puts the envelope correlation itself into the
    objective. Beyond-reference (the reference has no envelope-domain
    loss; reference src/training/losses.py).

    pred/target: [B, T] waveforms. Envelopes are √(mel-band energy) over
    an n_fft/hop STFT (mel bands approximate STOI's third-octave bands);
    correlation is over the full segment per band, averaged.
    """
    from m2tts_tpu.frontend.audio import mel_filterbank

    basis = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_bands))
    def env(x):
        mag2 = stft(x, n_fft, hop_length)
        mag2 = (mag2.real ** 2 + mag2.imag ** 2)
        return jnp.sqrt(jnp.einsum("btf,mf->btm", mag2, basis) + 1e-8)
    ep, et = env(pred), env(target)  # [B, T', M]
    ep = ep - ep.mean(axis=1, keepdims=True)
    et = et - et.mean(axis=1, keepdims=True)
    num = (ep * et).sum(axis=1)
    # eps INSIDE the sqrt: the gradient of an unregularized L2 norm is
    # NaN at zero, and an all-silent band (zero-padded segment tail at
    # bf16) hits exactly that
    den = jnp.sqrt(((ep ** 2).sum(axis=1) + 1e-8)
                   * ((et ** 2).sum(axis=1) + 1e-8))
    return 1.0 - (num / den).mean()


# ---------------------------------------------------------------------------
# Stage 2: LSGAN + feature matching (discriminator outputs as inputs)
# ---------------------------------------------------------------------------

def lsgan_discriminator_loss(real_logits: List[Array],
                             fake_logits: List[Array]) -> Array:
    real = sum(jnp.mean((l - 1.0) ** 2) for l in real_logits)
    fake = sum(jnp.mean(l ** 2) for l in fake_logits)
    return (real + fake) / len(real_logits)


def lsgan_generator_loss(fake_logits: List[Array]) -> Array:
    return sum(jnp.mean((l - 1.0) ** 2) for l in fake_logits) / len(fake_logits)


def feature_matching_loss(real_features: List[List[Array]],
                          fake_features: List[List[Array]]) -> Array:
    total = 0.0
    for rf, ff in zip(real_features, fake_features):
        for r, f in zip(rf, ff):
            total = total + jnp.abs(f - r).mean()
    # reference normalization: scales * features-per-scale (losses.py:163)
    return total / (len(real_features) * len(real_features[0]))


# ---------------------------------------------------------------------------
# Combined generator objective (reference CombinedTTSLoss weights)
# ---------------------------------------------------------------------------

def combined_generator_loss(losses: Dict[str, Array],
                            mel_weight: float = 1.0,
                            duration_weight: float = 0.1,
                            adversarial_weight: float = 0.25,
                            feature_matching_weight: float = 2.0,
                            spectral_weight: float = 1.0,
                            perceptual_weight: float = 0.5,
                            envelope_weight: float = 0.0) -> Array:
    total = (mel_weight * losses["mel_loss"]
             + duration_weight * losses["duration_loss"])
    if "spectral_loss" in losses:
        total = total + spectral_weight * losses["spectral_loss"]
    if "perceptual_loss" in losses:
        total = total + perceptual_weight * losses["perceptual_loss"]
    if "envelope_loss" in losses:
        total = total + envelope_weight * losses["envelope_loss"]
    if "generator_loss" in losses:
        total = total + adversarial_weight * losses["generator_loss"]
    if "feature_matching_loss" in losses:
        total = total + feature_matching_weight * losses["feature_matching_loss"]
    return total


class EarlyStopping:
    """Patience counter on validation loss (reference losses.py:352-373)."""

    def __init__(self, patience: int = 10000, min_delta: float = 0.001):
        self.patience = patience
        self.min_delta = min_delta
        self.best_loss = float("inf")
        self.wait = 0

    def __call__(self, val_loss: float) -> bool:
        if val_loss < self.best_loss - self.min_delta:
            self.best_loss = val_loss
            self.wait = 0
        else:
            self.wait += 1
        return self.wait >= self.patience
