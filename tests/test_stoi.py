"""STOI sanity: perfect score on identity, monotone under added noise,
graceful NaN on degenerate inputs."""

import numpy as np

from m2tts_tpu.evaluation.stoi import compute_stoi


def speechlike(seconds=1.0, sr=22050, seed=0):
    """Amplitude-modulated multi-harmonic signal — enough spectral and
    temporal structure for the band/segment correlations to be
    meaningful (white noise alone has no modulation to track)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.3 * t)
    sig = sum(np.sin(2 * np.pi * k * np.cumsum(f0) / sr + rng.uniform(0, 6))
              / k for k in range(1, 8))
    # modulated broadband component (fricative-like) so EVERY third-octave
    # band carries signal — bands with no clean energy are noise-dominated
    # at any SNR, which would floor the score
    fric = rng.standard_normal(len(t)) * 0.4 * (
        1 + np.sin(2 * np.pi * 3.1 * t))
    env = 0.5 * (1 + np.sin(2 * np.pi * 4 * t + 1.0))
    return ((sig + fric) * env).astype(np.float64)


def test_identity_is_one():
    x = speechlike()
    assert compute_stoi(x, x) > 0.999


def test_monotone_under_noise():
    x = speechlike()
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(x))
    scores = []
    for snr_db in (20, 10, 0, -10):
        scale = np.linalg.norm(x) / (np.linalg.norm(noise)
                                     * 10 ** (snr_db / 20))
        scores.append(compute_stoi(x, x + scale * noise))
    assert all(np.isfinite(scores))
    assert scores == sorted(scores, reverse=True), scores
    assert scores[0] > 0.85          # 20 dB SNR barely hurts
    assert scores[-1] < scores[0] - 0.2  # -10 dB clearly hurts


def test_short_and_silent_inputs():
    assert np.isnan(compute_stoi(np.zeros(10), np.zeros(10)))
    x = speechlike(seconds=0.3)  # shorter than one 30-frame segment
    assert compute_stoi(x, x) > 0.999


def test_different_sample_rates_resample():
    x = speechlike(sr=16000)
    assert compute_stoi(x, x, sample_rate=16000) > 0.999
