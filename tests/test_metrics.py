"""Evaluation metrics: formula parity vs the reference implementation where
importable (librosa-free parts) and invariant checks elsewhere."""

import numpy as np
import pytest

from m2tts_tpu.evaluation import metrics as M


@pytest.fixture(scope="module")
def tone_pair():
    sr = 22050
    t = np.arange(sr // 2) / sr
    clean = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    noisy = clean + 0.05 * np.random.default_rng(0).normal(size=len(t)).astype(np.float32)
    return clean, noisy, sr


def test_mel_distance_identities(rng):
    a = rng.normal(size=(50, 64)).astype(np.float32)
    d = M.compute_mel_distance(a, a)
    assert d["mel_l1_distance"] == 0.0
    assert d["mel_combined_distance"] == 0.0
    b = a + 1.0
    d = M.compute_mel_distance(b, a)
    assert d["mel_l1_distance"] == pytest.approx(1.0)
    assert d["mel_l2_distance"] == pytest.approx(1.0)
    assert d["mel_combined_distance"] == pytest.approx(2.0)


def test_spectral_convergence(tone_pair):
    clean, noisy, _ = tone_pair
    assert M.compute_spectral_convergence(clean, clean) == pytest.approx(0.0, abs=1e-7)
    sc = M.compute_spectral_convergence(noisy, clean)
    assert 0 < sc < 1


def test_lsd_ordering(tone_pair):
    clean, noisy, _ = tone_pair
    assert M.compute_log_spectral_distance(clean, clean) == pytest.approx(0.0, abs=1e-6)
    lsd_small = M.compute_log_spectral_distance(noisy, clean)
    very_noisy = clean + 0.5 * np.random.default_rng(1).normal(size=len(clean))
    lsd_big = M.compute_log_spectral_distance(very_noisy.astype(np.float32), clean)
    assert lsd_big > lsd_small > 0


def test_mcd(rng):
    mel = rng.normal(size=(64, 80)).astype(np.float32)  # [C, T]
    assert M.compute_mcd(mel, mel) == pytest.approx(0.0, abs=1e-9)
    assert M.compute_mcd(mel + 1.0, mel) > 0


def test_mfcc_matches_librosa_semantics(rng):
    """librosa.feature.mfcc(S=...) is dct-II ortho over the mel axis."""
    from scipy.fftpack import dct

    S = rng.normal(size=(64, 10))
    ours = M._mfcc_from_mel(S, 13)
    ref = dct(S, axis=0, type=2, norm="ortho")[:13]
    np.testing.assert_allclose(ours, ref)


def test_estimate_mos_range(tone_pair):
    clean, noisy, sr = tone_pair
    with_ref = M.estimate_mos_score(noisy, clean, sr)
    assert 1.0 <= with_ref["estimated_mos"] <= 5.0
    assert with_ref["snr_db"] > 10  # small noise -> decent SNR
    no_ref = M.estimate_mos_score(clean, sample_rate=sr)
    assert 1.0 <= no_ref["estimated_mos"] <= 5.0
    assert "snr_db" not in no_ref
    # identical signals -> max component scores
    perfect = M.estimate_mos_score(clean, clean, sr)
    assert perfect["estimated_mos"] > with_ref["estimated_mos"]


def test_duration_accuracy(rng):
    t = rng.uniform(1, 10, size=(4, 16)).astype(np.float32)
    out = M.compute_duration_accuracy(t, t)
    assert out["duration_l1_loss"] == 0.0
    assert out["duration_correlation"] == pytest.approx(1.0)
    out2 = M.compute_duration_accuracy(-t, t)
    assert out2["duration_correlation"] == pytest.approx(-1.0)


def test_evaluator_batch_and_report(rng):
    ev = M.TTSEvaluator()
    pred = rng.normal(size=(2, 30, 16)).astype(np.float32)
    target = pred + 0.1
    lengths = np.asarray([30, 20])
    metrics = ev.evaluate_batch(pred, target, mel_lengths=lengths)
    assert metrics["mel_l1_distance"] == pytest.approx(0.1, rel=1e-4)
    report = ev.generate_evaluation_report({"estimated_mos": 3.7, "x": 1.0})
    assert "Good" in report and "3.70" in report


def test_benchmark_model_performance(rng):
    import jax
    import jax.numpy as jnp

    from m2tts_tpu.data.dataset import DummyDataset, make_batches
    from m2tts_tpu.models import M2TTS

    model = M2TTS(hidden_dim=32, mel_channels=8, vocoder_channels=32,
                  text_encoder_layers=1, decoder_layers=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16)
    ds = DummyDataset(size=8, mel_dim=8, seed=0)
    batches = make_batches(ds, 4, [(64, 256)], seed=0)
    out = M.benchmark_model_performance(model, params, batches, num_samples=8)
    assert "mel_l1_distance" in out and np.isfinite(out["mel_l1_distance"])
    assert "duration_correlation" in out


def test_evaluate_cli(tmp_path):
    """End-to-end evaluate CLI over a fresh tiny checkpoint."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import json as json_mod

    import jax
    import jax.numpy as jnp

    from m2tts_tpu.models import build_model
    from m2tts_tpu.utils.checkpoint import CheckpointManager
    from m2tts_tpu.utils.config import Config

    cfg = Config({"model": {
        "text_encoder": {"vocab_size": 64, "hidden_dim": 32, "num_layers": 1,
                         "num_heads": 2, "dropout": 0.0},
        "decoder": {"mel_channels": 8, "num_layers": 1},
        "vocoder": {"hidden_channels": 16, "upsample_rates": [4, 4, 2, 2]},
    }})
    model = build_model(cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)
    ckpt = CheckpointManager(tmp_path / "ckpt")
    ckpt.save(1, {"params": params["params"], "step": 1}, config=cfg)
    ckpt.close()

    from scripts.evaluate import main
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["--checkpoint", str(tmp_path / "ckpt"),
                   "-t", "hello", "--json"])
    assert rc == 0
    out = json_mod.loads(buf.getvalue().strip().splitlines()[-1])
    assert "texts" in out and out["texts"][0]["estimated_mos"] >= 1.0


def test_aggregate_metrics_union_of_keys():
    """Per-sample dicts can be heterogeneous (e.g. 'stoi' omitted for a
    near-silent ground truth); the first sample must not decide which
    metrics the report carries."""
    dicts = [{"mel_l1": 1.0},                  # first sample: no stoi
             {"mel_l1": 3.0, "stoi": 0.8},
             {"mel_l1": 2.0, "stoi": 0.6}]
    out = M.aggregate_metrics(dicts)
    assert out["mel_l1"] == pytest.approx(2.0)
    assert out["stoi"] == pytest.approx(0.7)  # mean over present values only


def test_tree_finite_and_bf16_cast():
    import jax.numpy as jnp

    from m2tts_tpu.utils.tree import cast_params_bf16, tree_finite

    tree = {"w": np.ones((3, 3), np.float32), "ids": np.arange(4)}
    assert tree_finite(tree)
    tree["w"][1, 1] = np.nan
    assert not tree_finite(tree)
    # bf16 leaves (ml_dtypes kind 'V' on host) are checked too
    bf = {"w": np.asarray(jnp.asarray([1.0, jnp.nan], jnp.bfloat16))}
    assert not tree_finite(bf)
    cast = cast_params_bf16({"w": np.ones(2, np.float32),
                             "ids": np.arange(2)})
    assert cast["w"].dtype == jnp.bfloat16
    assert cast["ids"].dtype == np.arange(2).dtype
