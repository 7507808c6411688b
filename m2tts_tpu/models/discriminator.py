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
import jax
import jax.numpy as jnp
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


# -- phase-packed lowering ----------------------------------------------------
# The strided grouped convs (k=41, s=4, groups up to 256) dominate the
# stage-2 GAN step through their GRADIENTS (docs/DESIGN.md §2b): XLA's
# input-gradient of a strided conv is a stride-dilated conv, and the
# per-group contraction dims (down to 2→4 channels) starve the MXU.
# Packing the s=4 time-phases into the channel axis re-lowers each one
# as a stride-1 conv with kernel ceil(k/s)+1 taps and 4× wider per-group
# channels: 44 tap-slots vs 41 (7% pad FLOPs), dense gradients, same
# math EXACTLY (the packed kernel is a zero-padded reshuffle of the
# original — tests/test_disc_packed.py asserts bit-level equivalence of
# outputs and gradients). Same trick as the packed vocoder kernel
# (ops/pallas/vocoder_packed.py), but pure XLA: autodiff works through
# the reshapes, so training gets the win without custom VJPs.


def _packed_strided_conv(x: Array, kernel: Array, bias: Array,
                         stride: int, groups: int,
                         wgrad: str = "xla") -> Array:
    """Exact re-lowering of Conv1d(k, stride, groups, padding=(k-1)//2)
    for ``x.shape[1] % stride == 0``: phase-pack time into channels
    (index c*s+p keeps group blocks contiguous), run a stride-1 conv
    with the correspondingly reshuffled kernel. ``wgrad`` selects the
    weight-gradient lowering (ops/grouped_conv.py)."""
    from m2tts_tpu.ops.grouped_conv import conv1d_s1

    k, cin_g, cout = kernel.shape
    s = stride
    pad = (k - 1) // 2
    B, T, C = x.shape
    xp = (x.reshape(B, T // s, s, C).transpose(0, 1, 3, 2)
          .reshape(B, T // s, C * s))
    r_lo = (0 - pad) // s                 # floor
    r_hi = (k - 1 - pad) // s
    kp = r_hi - r_lo + 1
    front = -(pad + r_lo * s)             # in [0, s)
    w_ext = jnp.concatenate([
        jnp.zeros((front, cin_g, cout), kernel.dtype), kernel,
        jnp.zeros((kp * s - k - front, cin_g, cout), kernel.dtype)])
    w_packed = (w_ext.reshape(kp, s, cin_g, cout).transpose(0, 2, 1, 3)
                .reshape(kp, cin_g * s, cout))
    out = conv1d_s1(xp, w_packed, (-r_lo, r_hi), groups, wgrad)
    return out + bias


def _plain_conv(x: Array, kernel: Array, bias: Array, stride: int,
                groups: int) -> Array:
    k = kernel.shape[0]
    pad = (k - 1) // 2
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=((pad, pad),),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups)
    return out + bias


def packed_scale_apply(scale_params, x: Array, wgrad: str = "xla"
                       ) -> Tuple[Array, List[Array]]:
    """ScaleDiscriminator forward on its own param subtree via the
    phase-packed lowering (strided layers only; falls back to the plain
    conv when T doesn't divide). Spectral-norm param trees are not
    supported — callers gate on it. ``wgrad``: weight-gradient lowering
    for the packed convs (ops/grouped_conv.py)."""
    features = []
    h = x
    for i, (ch, k, s, g) in enumerate(_LAYERS):
        p = scale_params[f"conv{i}"]["conv"]
        if s > 1 and h.shape[1] % s == 0:
            h = _packed_strided_conv(h, p["kernel"], p["bias"], s, g,
                                     wgrad=wgrad)
        else:
            h = _plain_conv(h, p["kernel"], p["bias"], s, g)
        features.append(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
    po = scale_params["conv_out"]["conv"]
    logits = _plain_conv(h, po["kernel"], po["bias"], 1, 1)
    return logits, features


def packed_multiscale_apply(params, audio: Array,
                            scales: Sequence[int] = (1, 2, 4),
                            wgrad: str = "xla"
                            ) -> Tuple[List[Array], List[List[Array]]]:
    """MultiScaleDiscriminator.apply({'params': params}, audio), exactly,
    through the phase-packed conv lowering. ``params`` is the same tree
    (no repacking of stored weights — the reshuffle happens in-graph, so
    checkpoints, TP rules, and the native apply stay interchangeable)."""
    if audio.ndim == 2:
        audio = audio[..., None]
    logits, feature_maps = [], []
    for i, scale in enumerate(scales):
        x = _avg_pool1d(audio, scale) if scale > 1 else audio
        out, feats = packed_scale_apply(params[f"scale{i}"], x, wgrad=wgrad)
        logits.append(out)
        feature_maps.append(feats)
    return logits, feature_maps


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
