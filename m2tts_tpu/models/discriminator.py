"""Multi-scale waveform discriminator (MelGAN-style) for stage-2 GAN training.

Architecture parity with the reference MultiScaleDiscriminator (reference
src/training/losses.py:59-117): 3 scales (×1, ×2, ×4 average pooling), each
a 7-conv stack with grouped middle layers and LeakyReLU(0.2); per scale it
returns the final logits plus the 6 intermediate conv feature maps used by
the feature-matching loss. Channel-last [B, T, 1] waveform input.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
from jax import Array

from m2tts_tpu.models.components import Conv1d

# (features, kernel, stride, groups) per conv layer
_LAYERS = (
    (64, 15, 1, 1),
    (128, 41, 4, 4),
    (256, 41, 4, 16),
    (512, 41, 4, 64),
    (1024, 41, 4, 256),
    (1024, 5, 1, 1),
)


class ScaleDiscriminator(nn.Module):
    """Single-scale conv stack → (logits, feature maps).

    ``spectral_norm`` stabilizes GAN training by bounding each conv's
    Lipschitz constant (the reference ships an apply_spectral_norm helper
    it never calls, reference components.py:244-248; here it is wired).
    """

    spectral_norm: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, List[Array]]:
        features = []
        h = x
        for i, (ch, k, s, g) in enumerate(_LAYERS):
            h = Conv1d(ch, kernel_size=k, stride=s, groups=g,
                       spectral_norm=self.spectral_norm,
                       name=f"conv{i}")(h)
            features.append(h)  # pre-activation, as the reference collects
            h = nn.leaky_relu(h, negative_slope=0.2)
        logits = Conv1d(1, kernel_size=3, spectral_norm=self.spectral_norm,
                        name="conv_out")(h)
        return logits, features


def _avg_pool1d(x: Array, factor: int) -> Array:
    """Non-overlapping average pooling on [B, T, C] (torch avg_pool1d with
    kernel=stride=factor truncates the remainder; match that)."""
    B, T, C = x.shape
    T2 = (T // factor) * factor
    return x[:, :T2].reshape(B, T2 // factor, factor, C).mean(axis=2)


class MultiScaleDiscriminator(nn.Module):
    """3 discriminators over progressively downsampled audio."""

    scales: Sequence[int] = (1, 2, 4)
    spectral_norm: bool = False

    @nn.compact
    def __call__(self, audio: Array) -> Tuple[List[Array], List[List[Array]]]:
        """audio: [B, T] or [B, T, 1] → (logits per scale, features per scale)."""
        if audio.ndim == 2:
            audio = audio[..., None]
        logits, feature_maps = [], []
        for i, scale in enumerate(self.scales):
            x = _avg_pool1d(audio, scale) if scale > 1 else audio
            out, feats = ScaleDiscriminator(spectral_norm=self.spectral_norm,
                                            name=f"scale{i}")(x)
            logits.append(out)
            feature_maps.append(feats)
        return logits, feature_maps
