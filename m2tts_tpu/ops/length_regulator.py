"""Static-shape length regulation (FastSpeech expand) as a fused XLA op.

The reference implements this as a Python double loop over batch × sequence
with per-element ``.item()`` device syncs (reference
src/models/tts_model.py:146-178) — the #1 hot loop in its training step.

TPU-native redesign: everything is fixed-shape tensor algebra that XLA fuses
into a handful of VPU ops + one gather:

    frames = floor(durations)                     # [B, S] int
    ends   = cumsum(frames)                       # [B, S]
    idx[b, t] = #{ j : ends[b, j] <= t }          # rank of frame t
    out[b, t] = x[b, idx[b, t]] * (t < total_b)

Frame ``t`` belongs to the first phoneme whose cumulative end exceeds ``t``;
phonemes with zero duration are skipped automatically because ``ends`` does
not advance. Output frames beyond the total are zeroed, matching the
reference's zero padding. ``int()`` truncation of durations matches the
reference (durations are non-negative, so floor == trunc).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import Array


def duration_to_frame_indices(durations: Array, max_frames: int
                              ) -> Tuple[Array, Array, Array]:
    """Map per-phoneme durations to per-frame phoneme indices.

    Args:
        durations: [B, S] non-negative durations (float or int).
        max_frames: static output length T.

    Returns:
        idx:   [B, T] int32 phoneme index for each output frame (clamped).
        mask:  [B, T] bool, True for frames < total duration.
        total: [B] int32 total frames per sample (uncapped).
    """
    frames = jnp.floor(durations).astype(jnp.int32)
    frames = jnp.maximum(frames, 0)
    ends = jnp.cumsum(frames, axis=1)  # [B, S]
    t = jnp.arange(max_frames, dtype=jnp.int32)  # [T]
    # idx[b, t] = number of phonemes fully emitted by frame t
    idx = jnp.sum(ends[:, None, :] <= t[None, :, None], axis=-1, dtype=jnp.int32)
    total = ends[:, -1]
    mask = t[None, :] < total[:, None]
    idx = jnp.minimum(idx, durations.shape[1] - 1)
    return idx, mask, total


def regulate_lengths(x: Array, durations: Array, max_frames: int
                     ) -> Tuple[Array, Array, Array]:
    """Expand phoneme hiddens to frame rate.

    Args:
        x: [B, S, H] encoder hiddens.
        durations: [B, S] per-phoneme durations (frames).
        max_frames: static output length T.

    Returns:
        out:   [B, T, H] frame-rate hiddens, zero beyond each total.
        mask:  [B, T] bool frame validity mask.
        total: [B] int32 total frames (may exceed T; output is truncated).
    """
    idx, mask, total = duration_to_frame_indices(durations, max_frames)
    out = jnp.take_along_axis(x, idx[..., None], axis=1)
    out = out * mask[..., None].astype(x.dtype)
    return out, mask, total
