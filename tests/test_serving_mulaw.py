"""μ-law serving path: device-companded bytes must be the exact G.711
encode of what the int16 path produces, and the decoded outputs must be
consumable by every downstream surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models import M2TTS
from m2tts_tpu.ops.audio_codec import mulaw_decode_np, mulaw_encode_np
from m2tts_tpu.serving.pipeline import Synthesizer


@pytest.fixture(scope="module")
def synth():
    model = M2TTS(hidden_dim=32, mel_channels=16, vocoder_channels=32,
                  text_encoder_layers=1, decoder_layers=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)
    return Synthesizer(model, params,
                       text_buckets=(16, 32), frame_buckets=(64, 128),
                       batch_buckets=(1, 2, 4))


def test_mulaw_bytes_match_host_encode_of_int16_path(synth):
    texts = ["hello world", "the quick brown fox"]
    ref = synth.synthesize_batch(texts)
    got = synth.synthesize_batch(texts, pcm_format="mulaw")
    for r, g in zip(ref, got):
        assert g["audio_mulaw"].dtype == np.uint8
        assert g["frames"] == r["frames"]
        # device-companded bytes ≡ G.711 encode of the int16 graph output
        np.testing.assert_array_equal(g["audio_mulaw"],
                                      mulaw_encode_np(r["audio_pcm"]))


def test_mulaw_decoded_fields_consistent(synth):
    res = synth.synthesize("hello world", pcm_format="mulaw")
    # audio_pcm is the μ-law reconstruction; audio is its f32 scaling
    np.testing.assert_array_equal(res["audio_pcm"],
                                  mulaw_decode_np(res["audio_mulaw"]))
    np.testing.assert_allclose(
        res["audio"], res["audio_pcm"].astype(np.float32) / 32767.0,
        atol=0)
    # companding error vs the int16 path stays within the μ-law step
    ref = synth.synthesize("hello world")
    err = (res["audio_pcm"].astype(np.int32)
           - ref["audio_pcm"].astype(np.int32))
    assert np.abs(err).max() <= 1024  # largest μ-law segment half-step


def test_mulaw_stream_matches_batch(synth):
    batches = [["hello"], ["hello world"]]
    streamed = list(synth.synthesize_stream(iter(batches), pcm_only=True,
                                            pcm_format="mulaw"))
    direct = [synth.synthesize_batch(b, pcm_format="mulaw") for b in batches]
    for s, d in zip(streamed, direct):
        np.testing.assert_array_equal(s[0]["audio_mulaw"],
                                      d[0]["audio_mulaw"])
        assert "audio" not in s[0]  # pcm_only skips host decode


def test_unknown_format_rejected(synth):
    with pytest.raises(ValueError, match="pcm_format"):
        synth.synthesize("hello", pcm_format="opus")


def test_mulaw_graphs_cached_separately(synth):
    synth.synthesize("hello")
    synth.synthesize("hello", pcm_format="mulaw")
    n = len(synth._synth)
    synth.synthesize("world", pcm_format="mulaw")  # same bucket: cached
    assert len(synth._synth) == n
