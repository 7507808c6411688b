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


def test_odd_upsample_rates_rejected():
    """(k=2r, s=r, p=r//2) is exact-L*r only for even r; both the flax
    module and the packed form must fail loudly instead of silently
    emitting L*r+1 samples."""
    from m2tts_tpu.models.tts_model import Vocoder
    from m2tts_tpu.ops.vocoder_mm import pack_tconv

    voc = Vocoder(mel_channels=16, hidden_channels=32,
                  upsample_rates=(5, 2))
    with pytest.raises(ValueError, match="even"):
        voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16), jnp.float32))

    with pytest.raises(ValueError, match="even"):
        pack_tconv(jnp.zeros((4, 2, 6), jnp.float32),
                   jnp.zeros((2,), jnp.float32), rate=3)
