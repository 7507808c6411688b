"""Loss functions: stage-1 parity vs reference semantics, stage-2 components."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.training import losses as L


def test_masked_mel_l1_matches_loop(rng):
    B, T, C = 3, 20, 8
    pred = rng.normal(size=(B, T, C)).astype(np.float32)
    target = rng.normal(size=(B, T, C)).astype(np.float32)
    lengths = np.asarray([20, 11, 5], np.int32)
    # per-sample loop oracle (reference train.py:88-94 semantics)
    expect = np.mean([np.abs(pred[i, :l] - target[i, :l]).mean()
                      for i, l in enumerate(lengths)])
    got = float(L.masked_mel_l1(jnp.asarray(pred), jnp.asarray(target),
                                jnp.asarray(lengths)))
    assert got == pytest.approx(expect, rel=1e-6)


def test_stage1_total_weighting(rng):
    B, T, C, S = 2, 10, 4, 6
    pred = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    dp = jnp.asarray(rng.normal(size=(B, S)), jnp.float32)
    dt = jnp.asarray(rng.normal(size=(B, S)), jnp.float32)
    out = L.stage1_losses(pred, tgt, dp, dt, None)
    assert float(out["total_loss"]) == pytest.approx(
        float(out["mel_loss"]) + 0.1 * float(out["duration_loss"]), rel=1e-6)


def test_multi_resolution_stft_loss_zero_for_identical(rng):
    x = jnp.asarray(rng.normal(size=(2, 4096)), jnp.float32)
    assert float(L.multi_resolution_stft_loss(x, x)) == pytest.approx(0.0, abs=1e-6)
    y = jnp.asarray(rng.normal(size=(2, 4096)), jnp.float32)
    assert float(L.multi_resolution_stft_loss(x, y)) > 0.1


def test_spectral_loss_matches_torch_reference_semantics(rng):
    """Magnitude part must match torch.stft-based L1 on the same signals."""
    import torch

    x = rng.normal(size=(1, 4096)).astype(np.float32)
    y = rng.normal(size=(1, 4096)).astype(np.float32)
    n_fft, hop = 512, 128
    from m2tts_tpu.ops.stft import stft

    sj_x = np.asarray(stft(jnp.asarray(x), n_fft, hop))
    st_x = torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
                      window=torch.hann_window(n_fft), return_complex=True
                      ).numpy().transpose(0, 2, 1)
    n = min(sj_x.shape[1], st_x.shape[1])
    np.testing.assert_allclose(np.abs(sj_x[:, :n]), np.abs(st_x[:, :n]),
                               atol=2e-3, rtol=1e-3)


def test_perceptual_loss_positive(rng):
    x = jnp.asarray(rng.normal(size=(1, 4096)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 4096)) * 0.1, jnp.float32)
    assert float(L.perceptual_loss(x, y)) > 0
    assert float(L.perceptual_loss(x, x)) == pytest.approx(0.0, abs=1e-6)


def test_lsgan_losses():
    ones = [jnp.ones((1, 10, 1))]
    zeros = [jnp.zeros((1, 10, 1))]
    # perfect discriminator: real->1, fake->0
    assert float(L.lsgan_discriminator_loss(ones, zeros)) == pytest.approx(0.0)
    # perfectly fooled: fake->1
    assert float(L.lsgan_generator_loss(ones)) == pytest.approx(0.0)
    assert float(L.lsgan_generator_loss(zeros)) == pytest.approx(1.0)


def test_feature_matching_normalization(rng):
    f1 = [[jnp.ones((1, 4, 2))] * 6 for _ in range(3)]
    f2 = [[jnp.zeros((1, 4, 2))] * 6 for _ in range(3)]
    # each |1-0| term contributes 1; sum=18, normalized by 3*6=18 -> wait,
    # reference normalizes by scales*features = 3*6, sum of means = 18
    assert float(L.feature_matching_loss(f1, f2)) == pytest.approx(1.0)


def test_discriminator_shapes(rng):
    from m2tts_tpu.models.discriminator import MultiScaleDiscriminator

    disc = MultiScaleDiscriminator()
    x = jnp.asarray(rng.normal(size=(2, 4096)), jnp.float32)
    params = disc.init(jax.random.PRNGKey(0), x)
    logits, feats = disc.apply(params, x)
    assert len(logits) == 3 and len(feats) == 3
    assert all(len(f) == 6 for f in feats)
    # scale i sees audio downsampled by (1,2,4)
    assert logits[1].shape[1] < logits[0].shape[1]

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    # reference MSD measures 16,757,379 params (SURVEY.md §2.4)
    assert n_params == 16_757_379


def test_discriminator_batched_apply_exact(rng):
    """The stage-2 trainers run ONE discriminator apply over [real; fake]
    and slice (trainer_stage2.py d_loss_fn/g_loss_fn) — exact only while
    the discriminator stays strictly per-sample (no batch-coupled ops
    like BatchNorm). Lock that invariant in."""
    from m2tts_tpu.models.discriminator import MultiScaleDiscriminator

    disc = MultiScaleDiscriminator()
    real = jnp.asarray(rng.normal(size=(2, 4096)), jnp.float32)
    fake = jnp.asarray(rng.normal(size=(2, 4096)), jnp.float32)
    params = disc.init(jax.random.PRNGKey(0), real)

    logits_r, feats_r = disc.apply(params, real)
    logits_f, feats_f = disc.apply(params, fake)
    logits_b, feats_b = disc.apply(params, jnp.concatenate([real, fake], axis=0))

    B = real.shape[0]
    for lr, lf, lb in zip(logits_r, logits_f, logits_b):
        np.testing.assert_allclose(np.asarray(lb[:B]), np.asarray(lr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(lb[B:]), np.asarray(lf), atol=1e-5)
    for fr, ff, fb in zip(feats_r, feats_f, feats_b):
        for a, b, c in zip(fr, ff, fb):
            np.testing.assert_allclose(np.asarray(c[:B]), np.asarray(a), atol=1e-5)
            np.testing.assert_allclose(np.asarray(c[B:]), np.asarray(b), atol=1e-5)

    d_sep = L.lsgan_discriminator_loss(logits_r, logits_f)
    d_bat = L.lsgan_discriminator_loss([l[:B] for l in logits_b],
                                       [l[B:] for l in logits_b])
    assert float(d_bat) == pytest.approx(float(d_sep), rel=1e-6)


def test_early_stopping():
    es = L.EarlyStopping(patience=2, min_delta=0.01)
    assert not es(1.0)
    assert not es(0.5)
    assert not es(0.5)   # wait=1
    assert es(0.5)       # wait=2 -> stop


def test_envelope_correlation_loss():
    """0 for identical signals, ~0 for small perturbations, ~1 for
    uncorrelated noise; finite gradients (the r04 STOI-aligned term)."""
    import jax
    import numpy as np

    from m2tts_tpu.training.losses import envelope_correlation_loss

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    # amplitude-modulate so the envelopes carry real structure
    t = np.arange(4096, dtype=np.float32)
    am = jnp.asarray(0.5 + 0.5 * np.sin(2 * np.pi * 7 * t / 4096))
    x = x * am[None, :]
    noise = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    assert float(envelope_correlation_loss(x, x)) == pytest.approx(0.0, abs=1e-5)
    near = float(envelope_correlation_loss(x, x + 0.05 * noise))
    far = float(envelope_correlation_loss(x, noise))
    assert near < 0.1 < far
    g = jax.grad(lambda p: envelope_correlation_loss(p, x))(x + 0.1 * noise)
    assert bool(jnp.isfinite(g).all())


def test_combined_generator_loss_envelope_term():
    losses = {"mel_loss": jnp.asarray(1.0), "duration_loss": jnp.asarray(0.0),
              "envelope_loss": jnp.asarray(0.5)}
    from m2tts_tpu.training.losses import combined_generator_loss

    base = float(combined_generator_loss(losses))
    with_env = float(combined_generator_loss(losses, envelope_weight=2.0))
    assert base == pytest.approx(1.0)
    assert with_env == pytest.approx(2.0)
