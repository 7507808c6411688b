"""All serving vocoder backends must produce identical audio."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models import M2TTS
from m2tts_tpu.serving.pipeline import Synthesizer


@pytest.fixture(scope="module")
def model_and_params():
    model = M2TTS(hidden_dim=32, mel_channels=16, vocoder_channels=32,
                  text_encoder_layers=1, decoder_layers=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)
    return model, params


def _synth(model, params, backend):
    return Synthesizer(model, params, text_buckets=(32,), frame_buckets=(64,),
                       batch_buckets=(1, 2), vocoder_backend=backend)


def test_mm_backend_matches_xla(model_and_params):
    model, params = model_and_params
    texts = ["hello world", "the quick brown fox"]
    ref = _synth(model, params, "xla").synthesize_batch(texts)
    mm = _synth(model, params, "mm").synthesize_batch(texts)
    for r, m in zip(ref, mm):
        assert r["frames"] == m["frames"]
        np.testing.assert_allclose(r["audio"], m["audio"], atol=3e-4)


def test_pallas_backend_matches_xla_interpret(model_and_params):
    """Pallas backend off-TPU runs in interpret mode and must match the
    XLA module (the Synthesizer selects interpret automatically)."""
    model, params = model_and_params
    ref = _synth(model, params, "xla").synthesize("hello world")
    pal = _synth(model, params, "pallas").synthesize("hello world")
    assert ref["frames"] == pal["frames"]
    np.testing.assert_allclose(ref["audio"], pal["audio"], atol=3e-4)


def test_pallas_packed_backend_matches_xla_interpret(model_and_params):
    """Phase-packed kernel backend (interpret mode off-TPU) must match the
    XLA module, including the per-bucket tile pick."""
    model, params = model_and_params
    ref = _synth(model, params, "xla").synthesize("hello world")
    pal = _synth(model, params, "pallas_packed").synthesize("hello world")
    assert ref["frames"] == pal["frames"]
    np.testing.assert_allclose(ref["audio"], pal["audio"], atol=3e-4)


def test_pallas_packed_tile_fallback(model_and_params):
    """A frame bucket no kernel tile divides falls back to the XLA module
    inside the same backend (trace-time branch), still exact."""
    model, params = model_and_params
    ref = Synthesizer(model, params, text_buckets=(32,), frame_buckets=(40,),
                      batch_buckets=(1,), vocoder_backend="xla")
    pal = Synthesizer(model, params, text_buckets=(32,), frame_buckets=(40,),
                      batch_buckets=(1,), vocoder_backend="pallas_packed")
    r = ref.synthesize("hello world")
    p = pal.synthesize("hello world")
    assert r["frames"] == p["frames"]
    np.testing.assert_allclose(r["audio"], p["audio"], atol=3e-4)


def test_unknown_backend_rejected(model_and_params):
    model, params = model_and_params
    with pytest.raises(ValueError):
        _synth(model, params, "magic")
