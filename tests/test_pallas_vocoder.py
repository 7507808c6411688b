"""Fused Pallas vocoder == XLA vocoder module (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models import M2TTS
from m2tts_tpu.ops.pallas.vocoder import build_fused_vocoder
from m2tts_tpu.ops.vocoder_mm import pack_vocoder_weights


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


def test_fused_equals_module(setup, rng):
    model, params, packed, rates = setup
    fn = build_fused_vocoder(packed, rates, tile=16, halo=4, interpret=True)
    mel = jnp.asarray(rng.normal(size=(2, 64, 16)), jnp.float32)
    ref = np.asarray(model.apply(params, mel,
                                 method=lambda m, x: m.vocoder(x)))[..., 0]
    out = np.asarray(fn(mel))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)


def test_fused_edge_tiles_exact(setup, rng):
    """First/last tiles must reproduce the full graph's boundary padding."""
    model, params, packed, rates = setup
    fn = build_fused_vocoder(packed, rates, tile=16, halo=4, interpret=True)
    mel = jnp.asarray(rng.normal(size=(1, 32, 16)), jnp.float32)
    ref = np.asarray(model.apply(params, mel,
                                 method=lambda m, x: m.vocoder(x)))[0, :, 0]
    out = np.asarray(fn(mel))[0]
    U = int(np.prod(rates))
    np.testing.assert_allclose(out[: 2 * U], ref[: 2 * U], atol=3e-5)
    np.testing.assert_allclose(out[-2 * U:], ref[-2 * U:], atol=3e-5)


def test_shape_validation(setup):
    model, params, packed, rates = setup
    fn = build_fused_vocoder(packed, rates, tile=16, halo=4, interpret=True)
    with pytest.raises(ValueError):
        fn(jnp.zeros((1, 20, 16)))  # not a multiple of tile


def test_fused_bf16_close_to_module(setup, rng):
    """bf16 MXU mode: bf16 weights/activations, f32 accumulate — equal to
    the f32 XLA module within the bf16 mantissa floor."""
    model, params, packed, rates = setup
    fn = build_fused_vocoder(packed, rates, tile=16, halo=4, interpret=True,
                             compute_dtype="bf16")
    mel = jnp.asarray(rng.normal(size=(2, 64, 16)), jnp.float32)
    ref = np.asarray(model.apply(params, mel,
                                 method=lambda m, x: m.vocoder(x)))[..., 0]
    out = np.asarray(fn(mel))
    assert out.shape == ref.shape
    assert out.dtype == np.float32
    assert np.mean(np.abs(out - ref)) < 2e-2
    # tanh output: bounded, so abs tolerance is meaningful everywhere
    assert np.max(np.abs(out - ref)) < 0.15


def test_fused_multi_batch_pipelined(setup, rng):
    """The flat pipelined grid (prefetch + deferred output waits) crosses
    batch boundaries; every row must still match the module."""
    model, params, packed, rates = setup
    fn = build_fused_vocoder(packed, rates, tile=16, halo=4, interpret=True)
    mel = jnp.asarray(rng.normal(size=(4, 48, 16)), jnp.float32)
    ref = np.asarray(model.apply(params, mel,
                                 method=lambda m, x: m.vocoder(x)))[..., 0]
    out = np.asarray(fn(mel))
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)
