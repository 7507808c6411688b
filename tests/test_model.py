"""Model-core tests: shapes, jit-compilability, parameter-count parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models import M2TTS, build_model
from m2tts_tpu.models.tts_model import count_parameters, model_size_report
from m2tts_tpu.utils.config import Config


@pytest.fixture(scope="module")
def model_and_params():
    model = M2TTS(duration_norm="batch")  # reference-compatible variant
    ids = jnp.zeros((2, 16), jnp.int32)
    # run_vocoder=True so init creates vocoder params too (lazy setup)
    params = model.init(jax.random.PRNGKey(0), ids, max_frames=64,
                        run_vocoder=True)
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    ids = jnp.ones((2, 16), jnp.int32)
    lengths = jnp.asarray([16, 10])
    durations = jnp.full((2, 16), 3.0)
    out = model.apply(params, ids, lengths, durations, max_frames=64)
    assert out["mel_output"].shape == (2, 64, 64)
    assert out["duration_pred"].shape == (2, 16)
    assert out["encoder_output"].shape == (2, 16, 64)
    assert out["audio_output"] is None  # vocoder skipped by default
    assert np.isfinite(np.asarray(out["mel_output"])).all()


def test_synthesize_jit(model_and_params):
    model, params = model_and_params
    ids = jnp.ones((1, 16), jnp.int32)
    lengths = jnp.asarray([12])

    fn = jax.jit(
        lambda p, i, l, s: model.apply(p, i, l, duration_scale=s, max_frames=64,
                                       method=model.synthesize))
    out = fn(params, ids, lengths, 1.0)
    assert out["mel_output"].shape == (1, 64, 64)
    assert out["audio_output"].shape == (1, 64 * 64, 1)  # 64x upsampling
    assert np.abs(np.asarray(out["audio_output"])).max() <= 1.0

    # duration scaling is a traced scalar: same compiled graph, more frames
    out2 = fn(params, ids, lengths, 2.0)
    assert int(out2["total_frames"][0]) >= int(out["total_frames"][0])


def test_param_count_matches_reference_measurement():
    """Survey-measured reference sizes: stage1=321,154, stage2=1,066,610.

    With norm='batch' our ConvBlocks carry the same affine params plus the
    (non-trainable in torch) running stats; excluding bn_mean/bn_var the
    trainable count must match the reference exactly.
    """
    import flax

    def trainable_count(params):
        flat = flax.traverse_util.flatten_dict(params["params"])
        return sum(v.size for k, v in flat.items()
                   if k[-1] not in ("bn_mean", "bn_var"))

    m1 = M2TTS(duration_norm="batch")
    p1 = m1.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                 max_frames=16, run_vocoder=True)
    assert trainable_count(p1) == 321_154

    m2 = M2TTS(hidden_dim=96, mel_channels=80, text_encoder_layers=3,
               decoder_layers=3, vocoder_channels=256, duration_norm="batch")
    p2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                 max_frames=16, run_vocoder=True)
    assert trainable_count(p2) == 1_066_610


def test_build_model_from_config():
    cfg = Config({
        "text_encoder": {"vocab_size": 256, "hidden_dim": 96, "num_layers": 3,
                         "num_heads": 2, "dropout": 0.1},
        "decoder": {"mel_channels": 80, "num_layers": 3},
        "vocoder": {"hidden_channels": 256},
    })
    model = build_model(cfg)
    assert model.hidden_dim == 96
    assert model.mel_channels == 80
    assert model.decoder_layers == 3


def test_model_size_report(model_and_params):
    _, params = model_and_params
    report = model_size_report(params)
    assert set(report["components"]) == {
        "text_encoder", "duration_predictor", "decoder", "vocoder"}
    assert report["total_params"] == count_parameters(params)


def test_dropout_rngs_change_training_output(model_and_params):
    model, params = model_and_params
    ids = jnp.ones((1, 16), jnp.int32)
    durations = jnp.full((1, 16), 2.0)
    outs = []
    for seed in (0, 1):
        out = model.apply(params, ids, None, durations, max_frames=32,
                          deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(seed)})
        outs.append(np.asarray(out["mel_output"]))
    assert not np.allclose(outs[0], outs[1])


def test_reference_init_statistics():
    """From-scratch init reproduces the reference weight-init table
    (reference src/models/components.py:274-286): xavier-uniform dense
    kernels, kaiming-normal conv kernels, N(0,1) embeddings, unit/zero
    LayerNorm, zero biases."""
    model = M2TTS(vocab_size=128, hidden_dim=64, mel_channels=32,
                  vocoder_channels=64)
    params = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 16), jnp.int32),
                        max_frames=32, run_vocoder=True)["params"]

    emb = np.asarray(params["text_encoder"]["embedding"]["embedding"])
    assert abs(emb.std() - 1.0) < 0.05  # torch nn.Embedding default

    qkv = np.asarray(params["text_encoder"]["layer0"]["attn"]["qkv"]["kernel"])
    fi, fo = qkv.shape
    bound = np.sqrt(6.0 / (fi + fo))  # xavier-uniform support
    assert np.abs(qkv).max() <= bound + 1e-6
    assert np.isclose(qkv.std(), bound / np.sqrt(3.0), rtol=0.15)

    k = np.asarray(params["vocoder"]["input_conv"]["conv"]["kernel"])
    fan_in = k.shape[0] * k.shape[1]  # (ks, in, out)
    assert np.isclose(k.std(), np.sqrt(2.0 / fan_in), rtol=0.15)
    assert np.abs(k).max() > np.sqrt(2.0 / fan_in) * 2.5  # normal, not uniform

    ln = params["text_encoder"]["norm"]
    assert (np.asarray(ln["scale"]) == 1).all()
    assert (np.asarray(ln["bias"]) == 0).all()
    assert (np.asarray(
        params["text_encoder"]["layer0"]["attn"]["out"]["bias"]) == 0).all()
