"""StreamBatcher must reproduce the solo streaming output exactly while
actually sharing dispatches across concurrent streams."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models import M2TTS
from m2tts_tpu.serving.stream_batcher import StreamBatcher
from m2tts_tpu.serving.streaming import StreamingSynthesizer

TEXTS = ["hello world", "streaming in batches", "a", "the quick brown fox",
         "packed lanes share one dispatch"]


@pytest.fixture(scope="module")
def model_and_params():
    model = M2TTS(hidden_dim=32, mel_channels=16, vocoder_channels=32,
                  text_encoder_layers=1, decoder_layers=1,
                  upsample_rates=(4, 4, 2, 2))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)
    return model, params


@pytest.fixture(scope="module")
def streamer(model_and_params):
    model, params = model_and_params
    return StreamingSynthesizer(model, params, chunk_frames=16,
                                max_frames=64, text_bucket=32)


def solo(streamer, text, scale=1.0):
    return np.concatenate(list(streamer.stream(text, scale)))


def run_concurrent(batcher, jobs):
    """jobs: list of (text, scale); returns list of concatenated audio."""
    results = [None] * len(jobs)
    errors = []
    barrier = threading.Barrier(len(jobs))

    def worker(i, text, scale):
        try:
            barrier.wait(timeout=30)
            it = batcher.stream(text, scale, timeout=120)
            results[i] = np.concatenate(list(it))
        except BaseException as e:  # surface in the test thread
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i, t, s))
               for i, (t, s) in enumerate(jobs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert not errors, errors
    assert all(r is not None for r in results)
    return results


def test_concurrent_streams_equal_solo(streamer):
    # duration_scale >1 pushes past the chunk window so the batched
    # chunked path (not just the short-utterance path) is exercised
    batcher = StreamBatcher(streamer, max_streams=4, max_wait_ms=200)
    try:
        got = run_concurrent(batcher, [(t, 8.0) for t in TEXTS])
    finally:
        batcher.close()
    for text, audio in zip(TEXTS, got):
        ref = solo(streamer, text, 8.0)
        assert audio.shape == ref.shape
        np.testing.assert_allclose(audio, ref, atol=3e-5)


def test_dispatches_are_shared(streamer):
    batcher = StreamBatcher(streamer, max_streams=8, max_wait_ms=300)
    try:
        run_concurrent(batcher, [(t, 8.0) for t in TEXTS])
        # streams_served counts admitted utterance chunks (over-budget
        # texts sentence-split into several)
        expected = sum(len(streamer.split_long(t)) for t in TEXTS)
        assert batcher.streams_served == expected
        # with every admission coalesced, at least one chunk dispatch must
        # have carried more than one stream's window
        assert 0 < batcher.chunk_dispatches < batcher.chunks_emitted
    finally:
        batcher.close()


def test_short_utterance_path(streamer):
    batcher = StreamBatcher(streamer, max_streams=4)
    try:
        audio = np.concatenate(list(batcher.stream("a", timeout=120)))
    finally:
        batcher.close()
    np.testing.assert_allclose(audio, solo(streamer, "a"), atol=3e-5)


def test_mixed_duration_scales(streamer):
    batcher = StreamBatcher(streamer, max_streams=4, max_wait_ms=200)
    jobs = [("hello world", 4.0), ("hello world", 8.0)]
    try:
        got = run_concurrent(batcher, jobs)
    finally:
        batcher.close()
    for (text, scale), audio in zip(jobs, got):
        np.testing.assert_allclose(audio, solo(streamer, text, scale),
                                   atol=3e-5)


def test_long_text_through_batcher(streamer):
    """Over-budget texts admit one stream per sentence chunk; the
    consumer yields them in order with join gaps, matching the solo
    long-form stream."""
    long_text = ("hello world again and again. " * 4).strip()
    assert len(streamer.split_long(long_text)) > 1
    batcher = StreamBatcher(streamer, max_streams=4, max_wait_ms=50)
    try:
        audio = np.concatenate(list(batcher.stream(long_text, 8.0,
                                                   timeout=120)))
    finally:
        batcher.close()
    expected = np.concatenate(list(streamer.stream(long_text, 8.0)))
    assert audio.shape == expected.shape
    np.testing.assert_allclose(audio, expected, atol=3e-5)


def test_warmup_covers_non_power_of_two_cap(streamer):
    """Review finding: the cap itself is a reachable dispatch bucket when
    it is not a power of two — warmup must compile it."""
    batcher = StreamBatcher(streamer, max_streams=6)
    try:
        assert batcher.warmup() == 2 * 4  # buckets 1, 2, 4, 6
    finally:
        batcher.close()


def test_warmup_compiles_buckets(streamer):
    batcher = StreamBatcher(streamer, max_streams=4)
    try:
        n = batcher.warmup()
        assert n == 2 * 3  # buckets 1, 2, 4: acoustic + chunk each
        audio = np.concatenate(list(batcher.stream("hello", 8.0,
                                                   timeout=120)))
        np.testing.assert_allclose(audio, solo(streamer, "hello", 8.0),
                                   atol=3e-5)
    finally:
        batcher.close()


def test_closed_batcher_rejects(streamer):
    batcher = StreamBatcher(streamer)
    batcher.close()
    with pytest.raises(RuntimeError, match="closed"):
        batcher.stream("too late")
    batcher.close()  # idempotent


def test_churn_staggered_arrivals(streamer):
    """Stress: more streams than the dispatch cap, staggered arrivals,
    mixed lengths and scales — every stream still matches its solo
    output and the batcher drains clean."""
    import time

    jobs = [(TEXTS[i % len(TEXTS)], 4.0 + (i % 3) * 2.0) for i in range(10)]
    batcher = StreamBatcher(streamer, max_streams=4, max_wait_ms=20)
    results = [None] * len(jobs)
    errors = []

    def worker(i, text, scale):
        try:
            time.sleep(0.015 * i)  # staggered, overlapping arrivals
            results[i] = np.concatenate(
                list(batcher.stream(text, scale, timeout=120)))
        except BaseException as e:
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i, t, s))
               for i, (t, s) in enumerate(jobs)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert not errors, errors
        assert all(r is not None for r in results)
    finally:
        batcher.close()
    for (text, scale), audio in zip(jobs, results):
        ref = solo(streamer, text, scale)
        assert audio.shape == ref.shape
        np.testing.assert_allclose(audio, ref, atol=3e-5)
    # the scheduler must have drained everything
    assert len(batcher._active) == 0


def test_serve_stream_route_uses_batcher(model_and_params):
    """serve.py --dynamic-batch: concurrent /synthesize_stream POSTs all
    succeed through the shared StreamBatcher and match the solo path."""
    import json
    import sys
    import urllib.request
    from http.server import ThreadingHTTPServer
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.serve import make_handler

    from m2tts_tpu.serving.pipeline import Synthesizer

    model, params = model_and_params
    synth = Synthesizer(model, params, text_buckets=(32,),
                        frame_buckets=(64,), batch_buckets=(1, 2))
    info = {"device": "test", "backend": jax.default_backend(),
            "vocoder_backend": synth.vocoder_backend, "sample_rate": 22050}
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(synth, info, stream_chunk_frames=16,
                     dynamic_batch_wait_ms=100.0))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}/synthesize_stream"
    texts = TEXTS[:3]
    try:
        bodies = [None] * len(texts)

        def post(i):
            req = urllib.request.Request(
                url, data=json.dumps({"text": texts[i],
                                      "duration_scale": 8.0}).encode(),
                headers={"Content-Type": "application/json"}, method="POST")
            with urllib.request.urlopen(req, timeout=180) as resp:
                bodies[i] = (resp.status, resp.read())

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(texts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)

        ss = StreamingSynthesizer(
            synth.model, synth.params, chunk_frames=16,
            max_frames=max(synth.frame_buckets),
            text_bucket=max(synth.text_buckets),
            vocoder_backend=synth.vocoder_backend,
            compute_dtype=synth.compute_dtype)
        for text, got in zip(texts, bodies):
            assert got is not None, "request did not complete"
            status, body = got
            assert status == 200 and body[:4] == b"RIFF"
            pcm = np.frombuffer(body[44:], "<i2")
            local = np.concatenate(list(ss.stream(text, 8.0)))
            local_pcm = (np.clip(local, -1.0, 1.0) * 32767.0)
            assert len(pcm) == len(local_pcm)
            # int16 quantization of near-equal floats: off-by-one only
            assert np.max(np.abs(pcm.astype(np.int32)
                                 - local_pcm.astype(np.int16)
                                   .astype(np.int32))) <= 2
    finally:
        server.shutdown()
