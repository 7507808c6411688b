"""Matmul-form vocoder must equal the reference-parity Vocoder module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models import M2TTS
from m2tts_tpu.ops.vocoder_mm import pack_vocoder_weights, vocoder_mm_forward


@pytest.fixture(scope="module", params=[(4, 4, 2, 2), (8, 8, 2, 2)],
                ids=["64x", "256x"])
def setup(request):
    rates = request.param
    model = M2TTS(hidden_dim=32, mel_channels=16, vocoder_channels=64,
                  text_encoder_layers=1, decoder_layers=1,
                  upsample_rates=rates)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)
    packed = pack_vocoder_weights(params["params"]["vocoder"], rates)
    return model, params, packed, rates


def test_mm_equals_module(setup, rng):
    model, params, packed, rates = setup
    mel = jnp.asarray(rng.normal(size=(2, 48, 16)), jnp.float32)
    ref = model.apply(params, mel, method=lambda m, x: m.vocoder(x))[..., 0]
    mm = vocoder_mm_forward(mel, packed)
    up = int(np.prod(rates))
    assert mm.shape == (2, 48 * up)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_mm_jits(setup, rng):
    model, params, packed, rates = setup
    mel = jnp.asarray(rng.normal(size=(1, 32, 16)), jnp.float32)
    fn = jax.jit(lambda m: vocoder_mm_forward(m, packed))
    out = fn(mel)
    assert np.isfinite(np.asarray(out)).all()
