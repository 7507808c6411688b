"""Phase-packed fused Pallas vocoder == XLA vocoder module (interpret mode).

Covers both rate configs and two channel widths so every packing case in
_plan_and_pack runs: F=1 stages (C >= 128 after padding), packed stages
with phase-merge factor m in {1, 2, 4}, and the output-conv row-merge
repack (k in {2, 4}).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models import M2TTS
from m2tts_tpu.ops.pallas.vocoder_packed import (
    _choose_f,
    build_fused_vocoder_packed,
)
from m2tts_tpu.ops.vocoder_mm import pack_vocoder_weights


@pytest.fixture(scope="module",
                params=[((4, 4, 2, 2), 64), ((8, 8, 2, 2), 64),
                        ((8, 8, 2, 2), 128)],
                ids=["64x-c64", "256x-c64", "256x-c128"])
def setup(request):
    rates, channels = request.param
    model = M2TTS(hidden_dim=32, mel_channels=16, vocoder_channels=channels,
                  text_encoder_layers=1, decoder_layers=1,
                  upsample_rates=rates)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)
    packed = pack_vocoder_weights(params["params"]["vocoder"], rates)
    return model, params, packed, rates


def test_choose_f_invariants():
    # packed stages are exactly 128 lanes wide; F divides both the phase
    # count and 128 and leaves room for the channels
    for n, c in [(8, 64), (8, 128), (16, 16), (32, 4), (2, 64), (1, 80),
                 (8, 48), (3, 64), (6, 40)]:
        f, cpad = _choose_f(n, c)
        assert n % f == 0 and 128 % f == 0
        assert cpad >= c and f * cpad >= 128
        if f > 1:
            assert f * cpad == 128
    # cout > 128 forces F=1 with lane-padded channels
    f, cpad = _choose_f(8, 200)
    assert f == 1 and cpad == 256


def test_packed_equals_module(setup, rng):
    model, params, packed, rates = setup
    fn = build_fused_vocoder_packed(packed, rates, tile=16, halo=4,
                                    interpret=True)
    mel = jnp.asarray(rng.normal(size=(2, 64, 16)), jnp.float32)
    ref = np.asarray(model.apply(params, mel,
                                 method=lambda m, x: m.vocoder(x)))[..., 0]
    out = np.asarray(fn(mel))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)


def test_packed_edge_tiles_exact(setup, rng):
    """First/last tiles must reproduce the full graph's boundary padding."""
    model, params, packed, rates = setup
    fn = build_fused_vocoder_packed(packed, rates, tile=16, halo=4,
                                    interpret=True)
    mel = jnp.asarray(rng.normal(size=(1, 32, 16)), jnp.float32)
    ref = np.asarray(model.apply(params, mel,
                                 method=lambda m, x: m.vocoder(x)))[0, :, 0]
    out = np.asarray(fn(mel))[0]
    U = int(np.prod(rates))
    np.testing.assert_allclose(out[: 2 * U], ref[: 2 * U], atol=3e-5)
    np.testing.assert_allclose(out[-2 * U:], ref[-2 * U:], atol=3e-5)


def test_shape_validation(setup):
    model, params, packed, rates = setup
    fn = build_fused_vocoder_packed(packed, rates, tile=16, halo=4,
                                    interpret=True)
    with pytest.raises(ValueError):
        fn(jnp.zeros((1, 20, 16)))  # not a multiple of tile


def test_packed_bf16_close_to_module(setup, rng):
    """bf16 MXU mode: bf16 weights/activations, f32 accumulate."""
    model, params, packed, rates = setup
    fn = build_fused_vocoder_packed(packed, rates, tile=16, halo=4,
                                    interpret=True, compute_dtype="bf16")
    mel = jnp.asarray(rng.normal(size=(2, 64, 16)), jnp.float32)
    ref = np.asarray(model.apply(params, mel,
                                 method=lambda m, x: m.vocoder(x)))[..., 0]
    out = np.asarray(fn(mel))
    assert out.shape == ref.shape
    assert out.dtype == np.float32
    assert np.mean(np.abs(out - ref)) < 2e-2
    assert np.max(np.abs(out - ref)) < 0.15


def test_packed_multi_batch_pipelined(setup, rng):
    """The flat pipelined grid crosses batch boundaries; every row must
    still match the module (exercises the two-slot deferred DMA)."""
    model, params, packed, rates = setup
    fn = build_fused_vocoder_packed(packed, rates, tile=16, halo=4,
                                    interpret=True)
    mel = jnp.asarray(rng.normal(size=(4, 48, 16)), jnp.float32)
    ref = np.asarray(model.apply(params, mel,
                                 method=lambda m, x: m.vocoder(x)))[..., 0]
    out = np.asarray(fn(mel))
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)


def test_packed_matches_unpacked_kernel(setup, rng):
    """Both fused kernels are exact reformulations — identical output up
    to f32 matmul association order."""
    from m2tts_tpu.ops.pallas.vocoder import build_fused_vocoder

    model, params, packed, rates = setup
    fn_p = build_fused_vocoder_packed(packed, rates, tile=16, halo=4,
                                      interpret=True)
    fn_u = build_fused_vocoder(packed, rates, tile=16, halo=4,
                               interpret=True)
    mel = jnp.asarray(rng.normal(size=(2, 48, 16)), jnp.float32)
    np.testing.assert_allclose(np.asarray(fn_p(mel)), np.asarray(fn_u(mel)),
                               atol=3e-5, rtol=1e-4)
