"""Multi-chip serving: batch-sharded Synthesizer equals the 1-device path.

Synthesis has no cross-batch math, so sharding the batch axis over a
('data', 'model') mesh must reproduce the single-device outputs exactly.
Runs on the virtual 8-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models import M2TTS
from m2tts_tpu.parallel.mesh import make_mesh
from m2tts_tpu.serving.pipeline import Synthesizer

TEXTS = ["hello world", "the quick brown fox", "speech synthesis",
         "a longer sentence for the last slot of the batch"]


@pytest.fixture(scope="module")
def model_and_params():
    model = M2TTS(hidden_dim=32, mel_channels=16, vocoder_channels=32,
                  text_encoder_layers=1, decoder_layers=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)
    return model, params


def _make(model, params, mesh=None, batch_buckets=(8,)):
    return Synthesizer(model, params, text_buckets=(32,),
                       frame_buckets=(128,), batch_buckets=batch_buckets,
                       mesh=mesh)


def test_mesh_serving_matches_single_device(model_and_params):
    model, params = model_and_params
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(data=8)
    ref = _make(model, params, mesh=None)
    sharded = _make(model, params, mesh=mesh)
    out_ref = ref.synthesize_batch(TEXTS)
    out_shard = sharded.synthesize_batch(TEXTS)
    assert len(out_shard) == len(out_ref)
    for a, b in zip(out_ref, out_shard):
        assert a["frames"] == b["frames"]
        np.testing.assert_allclose(a["audio"], b["audio"], atol=2e-4)


def test_mesh_serving_with_model_axis(model_and_params):
    """dp=4 x tp=2 mesh: TP parameter specs applied at serve time."""
    model, params = model_and_params
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(data=4, model=2)
    ref = _make(model, params, mesh=None)
    sharded = _make(model, params, mesh=mesh)
    a = ref.synthesize_batch(TEXTS[:2])
    b = sharded.synthesize_batch(TEXTS[:2])
    for x, y in zip(a, b):
        np.testing.assert_allclose(x["audio"], y["audio"], atol=2e-4)


def test_mesh_rejects_indivisible_batch_buckets(model_and_params):
    model, params = model_and_params
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(data=8)
    with pytest.raises(ValueError, match="not divisible"):
        _make(model, params, mesh=mesh, batch_buckets=(1, 4))


def test_mesh_warmup_uses_shardable_single_stream(model_and_params):
    """reachable_shapes must not include batch 1 when a mesh is set."""
    model, params = model_and_params
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(data=8)
    s = _make(model, params, mesh=mesh, batch_buckets=(8, 16))
    shapes = s.reachable_shapes(full=False)
    assert all(b % 8 == 0 for b, _, _ in shapes)
