"""Audio DSP tests: STFT vs torch oracle, mel filterbank vs transformers
(librosa-equivalent) oracle, WAV IO round-trip, Griffin-Lim sanity."""

import numpy as np
import pytest

from m2tts_tpu.frontend import audio as A


@pytest.fixture(scope="module")
def tone():
    sr = 22050
    t = np.arange(sr) / sr  # 1 second
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1760 * t)
    return x.astype(np.float32), sr


def test_stft_matches_torch(tone):
    import torch

    x, _ = tone
    ours = A.stft(x, n_fft=1024, hop_length=256, win_length=1024)
    ref = torch.stft(
        torch.from_numpy(x), n_fft=1024, hop_length=256, win_length=1024,
        window=torch.hann_window(1024), center=True, pad_mode="reflect",
        return_complex=True,
    ).numpy()
    n = min(ours.shape[1], ref.shape[1])
    np.testing.assert_allclose(np.abs(ours[:, :n]), np.abs(ref[:, :n]),
                               rtol=1e-4, atol=1e-4)


def test_mel_filterbank_matches_librosa_semantics():
    from transformers.audio_utils import mel_filter_bank

    ours = A.mel_filterbank(22050, 1024, 64, 0.0, 11025.0)
    ref = mel_filter_bank(
        num_frequency_bins=513, num_mel_filters=64, min_frequency=0.0,
        max_frequency=11025.0, sampling_rate=22050, norm="slaney",
        mel_scale="slaney",
    ).T  # transformers returns [freq, mel]
    assert ours.shape == (64, 513)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_compute_mel_range_and_shape(tone):
    x, sr = tone
    mel = A.compute_mel_spectrogram(x, sr)
    assert mel.shape[0] == 64
    assert mel.shape[1] == 1 + len(x) // 256  # centered framing
    assert mel.dtype == np.float32
    assert mel.min() == pytest.approx(-1.0, abs=1e-6)
    assert mel.max() == pytest.approx(1.0, abs=1e-6)
    assert np.isfinite(mel).all()


def test_power_to_db_top_db_clipping():
    S = np.array([1.0, 1e-12])
    db = A.power_to_db(S)
    assert db[0] == pytest.approx(0.0)
    assert db[1] == pytest.approx(-80.0)  # clipped at ref - top_db


def test_istft_roundtrip(tone):
    x, _ = tone
    spec = A.stft(x, 1024, 256, 1024)
    y = A.istft(spec, 256, 1024, length=len(x))
    # interior samples reconstruct almost exactly
    np.testing.assert_allclose(y[1024:-1024], x[1024:-1024], atol=1e-4)


def test_wav_roundtrip(tmp_path, tone):
    x, sr = tone
    path = tmp_path / "t.wav"
    A.save_wav(x, path, sr)
    y, sr2 = A.load_wav(path, sr, normalize=False)
    assert sr2 == sr
    assert len(y) == len(x)
    np.testing.assert_allclose(y, x, atol=2e-4)  # 16-bit quantization


def test_resample():
    x = np.sin(2 * np.pi * 440 * np.arange(44100) / 44100).astype(np.float32)
    y = A.resample(x, 44100, 22050)
    assert abs(len(y) - 22050) <= 1


def test_griffin_lim_recovers_tone(tone):
    x, sr = tone
    mag = np.abs(A.stft(x, 1024, 256, 1024))
    y = A.griffin_lim(mag, n_iter=16)
    # spectral content should match: dominant bin at 440 Hz
    Y = np.abs(A.stft(y[: len(x)], 1024, 256, 1024)).mean(axis=1)
    X = np.abs(A.stft(x, 1024, 256, 1024)).mean(axis=1)
    assert np.argmax(Y) == np.argmax(X)


def test_mel_to_audio_finite(tone):
    x, sr = tone
    mel = A.compute_mel_spectrogram(x[:8192], sr)
    audio = A.mel_to_audio(mel, n_iter=4)
    assert np.isfinite(audio).all()
    assert np.max(np.abs(audio)) <= 1.0 + 1e-6


def test_audio_processor_facade(tmp_path, tone):
    x, sr = tone
    path = tmp_path / "t.wav"
    A.save_wav(x, path, sr)
    ap = A.AudioProcessor()
    audio, mel = ap.process_file(path)
    assert mel.shape[0] == 64
    np.testing.assert_allclose(
        mel, A.compute_mel_spectrogram(audio, sr), atol=1e-5)
