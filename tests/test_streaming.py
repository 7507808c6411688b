"""Streaming vocoder must equal the full-graph vocoder exactly across chunk
boundaries (the hard part per SURVEY.md §7: overlap correctness vs the
resblocks' receptive field)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models import M2TTS
from m2tts_tpu.serving.streaming import StreamingSynthesizer, StreamingVocoder


@pytest.fixture(scope="module", params=[(4, 4, 2, 2), (8, 8, 2, 2)],
                ids=["compat64x", "fixed256x"])
def model_and_params(request):
    model = M2TTS(hidden_dim=32, mel_channels=16, vocoder_channels=32,
                  text_encoder_layers=1, decoder_layers=1,
                  upsample_rates=request.param)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)
    return model, params


def full_vocoder(model, params, mel):
    return np.asarray(model.apply(params, jnp.asarray(mel[None]),
                                  method=lambda m, x: m.vocoder(x)))[0, :, 0]


def test_streaming_equals_full(model_and_params, rng):
    model, params = model_and_params
    mel = rng.normal(size=(100, 16)).astype(np.float32)
    sv = StreamingVocoder(model, params, chunk_frames=32)
    streamed = sv.synthesize(mel)
    full = full_vocoder(model, params, mel)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=2e-6)


def test_streaming_partial_last_chunk(model_and_params, rng):
    model, params = model_and_params
    mel = rng.normal(size=(45, 16)).astype(np.float32)  # 45 = 32 + 13
    sv = StreamingVocoder(model, params, chunk_frames=32)
    chunks = list(sv.stream(mel))
    assert len(chunks) == 2
    up = sv.upsample
    assert chunks[0].shape == (32 * up,)
    assert chunks[1].shape == (13 * up,)
    np.testing.assert_allclose(np.concatenate(chunks),
                               full_vocoder(model, params, mel), atol=2e-6)


def test_streaming_single_chunk(model_and_params, rng):
    model, params = model_and_params
    mel = rng.normal(size=(10, 16)).astype(np.float32)
    sv = StreamingVocoder(model, params, chunk_frames=32)
    np.testing.assert_allclose(sv.synthesize(mel),
                               full_vocoder(model, params, mel), atol=2e-6)


def test_streaming_synthesizer_end_to_end(model_and_params):
    model, params = model_and_params
    ss = StreamingSynthesizer(model, params, chunk_frames=16, max_frames=64,
                              text_bucket=32)
    chunks = list(ss.stream("hello world"))
    assert len(chunks) >= 1
    audio = np.concatenate(chunks)
    assert np.isfinite(audio).all()

    # must agree with the batch pipeline on the same params, except within
    # the vocoder's receptive field of the utterance end: the bucketed
    # batch graph sees zeroed padding frames there while streaming sees
    # the true utterance boundary
    from m2tts_tpu.serving.pipeline import Synthesizer

    batch = Synthesizer(model, params, text_buckets=(32,), frame_buckets=(64,),
                        batch_buckets=(1,))
    res = batch.synthesize("hello world")
    assert len(audio) == len(res["audio"])
    tail = 4 * ss.vocoder.upsample
    np.testing.assert_allclose(audio[:-tail], res["audio"][:-tail], atol=2e-4)


def test_streaming_long_text_sentence_split(model_and_params):
    """Over-budget texts sentence-split and stream in sequence with join
    gaps (the frontend would otherwise silently truncate at the
    bucket)."""
    model, params = model_and_params
    ss = StreamingSynthesizer(model, params, chunk_frames=16, max_frames=64,
                              text_bucket=16, sample_rate=1000)
    long_text = "one two three. four five six. seven eight nine."
    chunks = ss.split_long(long_text)
    assert len(chunks) > 1
    audio = np.concatenate(list(ss.stream(long_text, 4.0)))
    expected = []
    for i, c in enumerate(chunks):
        if i:
            expected.append(ss.gap(120.0))
        expected.append(np.concatenate(list(ss.stream(c, 4.0))))
    expected = np.concatenate(expected)
    assert audio.shape == expected.shape
    np.testing.assert_allclose(audio, expected, atol=2e-6)


@pytest.mark.parametrize("backend", ["mm", "pallas", "pallas_packed"])
def test_streaming_backends_equal_xla(model_and_params, rng, backend):
    """All vocoder backends must stream identical audio."""
    model, params = model_and_params
    mel = rng.normal(size=(100, 16)).astype(np.float32)
    ref = StreamingVocoder(model, params, chunk_frames=32).synthesize(mel)
    alt = StreamingVocoder(model, params, chunk_frames=32,
                           vocoder_backend=backend).synthesize(mel)
    assert alt.shape == ref.shape
    np.testing.assert_allclose(alt, ref, atol=3e-4)


def test_streaming_unknown_backend_rejected(model_and_params):
    model, params = model_and_params
    with pytest.raises(ValueError, match="vocoder_backend"):
        StreamingVocoder(model, params, vocoder_backend="magic")


def test_streaming_synthesizer_backend_passthrough(model_and_params):
    model, params = model_and_params
    ss = StreamingSynthesizer(model, params, vocoder_backend="mm")
    assert ss.vocoder.vocoder_backend == "mm"
    chunks = list(ss.stream("hello backend"))
    assert chunks and all(c.ndim == 1 for c in chunks)


def test_stream_device_matches_host_stream(model_and_params, rng):
    """Device-resident streaming (in-graph window slicing, pipelined
    fetch) must yield the same chunks as the host-mel path."""
    model, params = model_and_params
    sv = StreamingVocoder(model, params, chunk_frames=16)
    Tmax, T = 64, 50
    mel = jnp.asarray(rng.standard_normal((Tmax, 16)), jnp.float32)
    total = jnp.asarray([T], jnp.int32)
    dev_chunks = list(sv.stream_device(mel[None], total, T))
    host_chunks = list(sv.stream(np.asarray(mel), T))
    assert len(dev_chunks) == len(host_chunks)
    for d, h in zip(dev_chunks, host_chunks):
        np.testing.assert_allclose(d, h, atol=2e-6)


def test_stream_device_short_utterance_fallback(model_and_params, rng):
    """T <= window falls back to the boundary-exact full-graph path."""
    model, params = model_and_params
    sv = StreamingVocoder(model, params, chunk_frames=16)
    T = sv._window - 2
    mel = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    total = jnp.asarray([T], jnp.int32)
    dev = np.concatenate(list(sv.stream_device(mel[None], total, T)))
    np.testing.assert_allclose(dev, full_vocoder(model, params,
                                                 np.asarray(mel[:T])),
                               atol=2e-6)


def test_fused_first_chunk_matches_unfused(model_and_params):
    """The fused acoustic+chunk-0 dispatch must produce the same stream
    as the unfused path (separate acoustic graph + host-mel chunking) up
    to cross-graph float reassociation."""
    model, params = model_and_params
    ss = StreamingSynthesizer(model, params, chunk_frames=16, max_frames=64,
                              text_bucket=32)
    assert ss._acoustic_first is not None
    fused = list(ss.stream("hello streaming world", 8.0))
    # multi-chunk run ⇒ frames > window ⇒ the fused path actually ran
    assert len(fused) >= 3

    ss_unfused = StreamingSynthesizer(model, params, chunk_frames=16,
                                      max_frames=64, text_bucket=32)
    ss_unfused._acoustic_first = None
    unfused = list(ss_unfused.stream("hello streaming world", 8.0))
    assert len(fused) == len(unfused)
    for f, u in zip(fused, unfused):
        assert f.shape == u.shape
        np.testing.assert_allclose(f, u, atol=2e-4)
