"""Spectral norm, functional grad clipping, audio param validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models.components import (Conv1d, clip_by_global_norm,
                                         spectral_normalize)


def test_spectral_normalize_bounds_sigma():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 16, 32)) * 5.0, jnp.float32)
    wn = spectral_normalize(w, n_iter=20)
    sigma = np.linalg.svd(np.asarray(wn).reshape(-1, 32), compute_uv=False)[0]
    # power iteration converges geometrically in (sigma2/sigma1)^2 — for a
    # random Gaussian matrix the top two are close, so allow ~2%
    assert abs(sigma - 1.0) < 2e-2
    assert sigma < 1.05  # and definitely bounded


def test_sn_conv_param_paths_match_plain_conv():
    x = jnp.ones((1, 16, 8))
    plain = Conv1d(4, 3).init(jax.random.PRNGKey(0), x)
    sn = Conv1d(4, 3, spectral_norm=True).init(jax.random.PRNGKey(0), x)

    def paths(tree, prefix=()):
        out = []
        for k, v in tree.items():
            if isinstance(v, dict):
                out += paths(v, prefix + (k,))
            else:
                out.append((prefix + (k,), v.shape))
        return sorted(out)

    assert paths(plain["params"]) == paths(sn["params"])


def test_sn_conv_output_is_scaled_plain_conv():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 8)),
                    jnp.float32)
    params = Conv1d(4, 3, use_bias=False).init(jax.random.PRNGKey(2), x)
    y_sn = Conv1d(4, 3, use_bias=False, spectral_norm=True).apply(params, x)
    # wiring check: SNConv output == plain conv applied to the
    # spectral_normalize'd kernel (exact, independent of convergence)
    k = params["params"]["conv"]["kernel"]
    params_n = {"params": {"conv": {"kernel": spectral_normalize(k)}}}
    y_ref = Conv1d(4, 3, use_bias=False).apply(params_n, x)
    np.testing.assert_allclose(np.asarray(y_sn), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


def test_discriminator_with_spectral_norm_runs():
    from m2tts_tpu.models.discriminator import MultiScaleDiscriminator

    d = MultiScaleDiscriminator(spectral_norm=True)
    audio = jnp.asarray(np.random.default_rng(3).standard_normal((1, 2048)),
                        jnp.float32)
    vars_ = d.init(jax.random.PRNGKey(0), audio)
    logits, feats = d.apply(vars_, audio)
    assert len(logits) == 3 and len(feats[0]) == 6
    assert all(bool(jnp.isfinite(l).all()) for l in logits)


def test_clip_by_global_norm():
    grads = {"a": jnp.full((4,), 3.0), "b": jnp.full((3,), 4.0)}
    clipped, gnorm = clip_by_global_norm(grads, 1.0)
    assert abs(float(gnorm) - np.sqrt(4 * 9 + 3 * 16)) < 1e-4
    leaves = jax.tree_util.tree_leaves(clipped)
    new_norm = float(jnp.sqrt(sum(jnp.sum(g**2) for g in leaves)))
    assert abs(new_norm - 1.0) < 1e-5
    # under the threshold → untouched
    same, _ = clip_by_global_norm(grads, 1e9)
    np.testing.assert_allclose(np.asarray(same["a"]), 3.0)


@pytest.mark.parametrize("kwargs,msg", [
    (dict(n_fft=1000), "power of two"),
    (dict(hop_length=2048), "hop_length"),
    (dict(n_mels=1024), "n_mels"),
    (dict(fmin=9000.0, fmax=8000.0), "fmin"),
    (dict(fmax=22050.0), "Nyquist"),
])
def test_validate_audio_params_rejects(kwargs, msg):
    from m2tts_tpu.frontend.audio import validate_audio_params

    base = dict(sample_rate=22050, n_fft=1024, hop_length=256,
                win_length=1024, n_mels=64)
    base.update(kwargs)
    with pytest.raises(ValueError, match=msg):
        validate_audio_params(**base)


def test_audio_processor_validates_on_construction():
    from m2tts_tpu.frontend.audio import AudioProcessor

    with pytest.raises(ValueError):
        AudioProcessor(n_fft=1000)
