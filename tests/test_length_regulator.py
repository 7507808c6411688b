"""Length regulator: static-shape gather vs a loop oracle with the
reference's semantics (int truncation, zero-duration skip, zero padding)."""

import numpy as np
import jax.numpy as jnp

from m2tts_tpu.ops.length_regulator import duration_to_frame_indices, regulate_lengths


def loop_oracle(x: np.ndarray, durations: np.ndarray, max_frames: int) -> np.ndarray:
    """Mirror of reference src/models/tts_model.py:126-178 behavior."""
    B, S, H = x.shape
    out = np.zeros((B, max_frames, H), dtype=x.dtype)
    for b in range(B):
        rows = []
        for s in range(S):
            d = int(durations[b, s])
            if d > 0:
                rows.extend([x[b, s]] * d)
        rows = np.asarray(rows[:max_frames]) if rows else np.zeros((0, H), x.dtype)
        out[b, : len(rows)] = rows
    return out


def test_matches_loop_oracle(rng):
    B, S, H, T = 3, 7, 5, 40
    x = rng.normal(size=(B, S, H)).astype(np.float32)
    durations = rng.uniform(0, 8, size=(B, S)).astype(np.float32)
    durations[1, 2] = 0.4  # floors to zero -> phoneme skipped
    durations[2, :] = 0.0  # all-zero row

    ours, mask, total = regulate_lengths(jnp.asarray(x), jnp.asarray(durations), T)
    expect = loop_oracle(x, durations, T)
    np.testing.assert_allclose(np.asarray(ours), expect, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(total), np.floor(durations).astype(np.int64).sum(axis=1))
    assert not np.asarray(mask)[2].any()


def test_truncation_when_total_exceeds_max():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
    durations = jnp.asarray([[5.0, 5.0, 5.0, 5.0]])
    out, mask, total = regulate_lengths(x, durations, 8)
    assert out.shape == (1, 8, 3)
    assert int(total[0]) == 20
    assert bool(mask.all())
    # first 5 frames are phoneme 0, next 3 phoneme 1
    np.testing.assert_allclose(np.asarray(out[0, :5]), np.tile(np.asarray(x[0, 0]), (5, 1)))
    np.testing.assert_allclose(np.asarray(out[0, 5:8]), np.tile(np.asarray(x[0, 1]), (3, 1)))


def test_frame_indices_monotone(rng):
    durations = jnp.asarray(rng.uniform(0, 4, size=(2, 10)).astype(np.float32))
    idx, mask, total = duration_to_frame_indices(durations, 50)
    idx = np.asarray(idx)
    assert (np.diff(idx, axis=1) >= 0).all()
    assert idx.max() <= 9
