"""Native C++ mel frontend: exact parity with the NumPy pipeline."""

import numpy as np
import pytest

from m2tts_tpu.frontend import audio as A
from m2tts_tpu.frontend import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="no native toolchain")


def _rand_audio(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.3).astype(np.float32)


@pytest.mark.parametrize("n_samples", [2048, 22050, 66150])
def test_mel_parity_vs_numpy(n_samples):
    audio = _rand_audio(n_samples)
    ref = A.compute_mel_spectrogram(audio)
    got = native.compute_mel_native(audio)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_mel_parity_nondefault_params():
    audio = _rand_audio(32000, seed=3)
    kw = dict(sample_rate=16000, n_fft=512, hop_length=128, win_length=400,
              n_mels=80, fmin=30.0, fmax=7600.0)
    ref = A.compute_mel_spectrogram(audio, **kw)
    got = native.compute_mel_native(audio, **kw)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_tone_is_peaked_at_right_mel():
    sr = 22050
    t = np.arange(sr) / sr
    audio = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    mel = native.compute_mel_native(audio, sample_rate=sr)
    ref = A.compute_mel_spectrogram(audio, sample_rate=sr)
    assert np.argmax(mel.mean(axis=1)) == np.argmax(ref.mean(axis=1))


def test_batch_matches_single():
    audios = [_rand_audio(n, seed=i) for i, n in
              enumerate([4096, 8192, 22050, 5000])]
    batch = native.compute_mel_batch(audios, n_threads=4)
    for a, b in zip(audios, batch):
        np.testing.assert_array_equal(b, native.compute_mel_native(a))


def test_too_short_audio_raises():
    with pytest.raises((ValueError, RuntimeError)):
        native.compute_mel_native(_rand_audio(100))
