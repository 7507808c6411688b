"""Dynamic request batching: coalescing, per-scale grouping, result
parity with the direct path, error fan-out, server integration."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models import M2TTS
from m2tts_tpu.serving.batcher import DynamicBatcher
from m2tts_tpu.serving.pipeline import Synthesizer

TEXTS = ["hello world", "a second caller", "third request here",
         "four is a crowd", "five alive", "the sixth sense"]


@pytest.fixture(scope="module")
def synth():
    model = M2TTS(hidden_dim=32, mel_channels=16, vocoder_channels=32,
                  text_encoder_layers=1, decoder_layers=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)
    s = Synthesizer(model, params, text_buckets=(32,), frame_buckets=(64,),
                    batch_buckets=(1, 2, 8))
    s.synthesize_batch(TEXTS, 1.0)  # compile the wide bucket up front
    s.synthesize_batch([TEXTS[0]], 1.0)
    return s


class _Counting:
    """Wrap a Synthesizer, counting synthesize_batch dispatches."""

    def __init__(self, inner):
        self._inner = inner
        self.calls = []

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def synthesize_batch(self, texts, scale, **kw):
        self.calls.append(len(texts))
        return self._inner.synthesize_batch(texts, scale, **kw)


def test_concurrent_requests_coalesce(synth):
    counting = _Counting(synth)
    b = DynamicBatcher(counting, max_wait_ms=250.0)
    try:
        results = [None] * len(TEXTS)

        def call(i):
            results[i] = b.submit(TEXTS[i], 1.0)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(TEXTS))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        # random-init durations can legitimately round a text to 0 frames
        # ("five alive" does), so assert presence, not audio length
        assert all(r is not None and "audio_pcm" in r for r in results)
        # 6 requests must have taken fewer than 6 dispatches (the window
        # is generous, so typically exactly 1)
        assert b.batches_run < len(TEXTS)
        assert b.requests_served == len(TEXTS)
        assert sum(counting.calls) == len(TEXTS)
    finally:
        b.close()


def test_batched_result_matches_direct(synth):
    """A coalesced request returns the same audio as a direct
    single-text synthesize_batch (padding rows don't bleed)."""
    direct = synth.synthesize_batch([TEXTS[0]], 1.0)[0]
    b = DynamicBatcher(synth, max_wait_ms=150.0)
    try:
        out = [None, None]

        def c0():
            out[0] = b.submit(TEXTS[0], 1.0)

        def c1():
            out[1] = b.submit(TEXTS[1], 1.0)

        t0, t1 = threading.Thread(target=c0), threading.Thread(target=c1)
        t0.start(), t1.start()
        t0.join(timeout=120), t1.join(timeout=120)
        np.testing.assert_array_equal(out[0]["audio_pcm"],
                                      direct["audio_pcm"])
    finally:
        b.close()


def test_scale_groups_are_separate_dispatches(synth):
    """duration_scale is one traced scalar per compiled batch, so mixed
    scales in one window must split into per-scale dispatches."""
    counting = _Counting(synth)
    b = DynamicBatcher(counting, max_wait_ms=250.0)
    try:
        out = [None] * 4
        scales = [1.0, 2.0, 1.0, 2.0]

        def call(i):
            out[i] = b.submit(TEXTS[0], scales[i])  # same text, two scales

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert all(r is not None for r in out)
        # scale-2 audio is longer than scale-1 audio for the same text
        assert len(out[1]["audio_pcm"]) > len(out[0]["audio_pcm"])
    finally:
        b.close()


def test_worker_error_fans_out_and_recovers(synth):
    class Boom(RuntimeError):
        pass

    class Flaky(_Counting):
        def synthesize_batch(self, texts, scale, **kw):
            if not self.calls:
                self.calls.append(len(texts))
                raise Boom("simulated device failure")
            return super().synthesize_batch(texts, scale, **kw)

    b = DynamicBatcher(Flaky(synth), max_wait_ms=5.0)
    try:
        with pytest.raises(Boom):
            b.submit(TEXTS[0], 1.0, timeout=120)
        # the worker survived: the next request succeeds
        r = b.submit(TEXTS[1], 1.0, timeout=120)
        assert len(r["audio_pcm"]) > 0
    finally:
        b.close()


def test_submit_after_close_raises(synth):
    b = DynamicBatcher(synth, max_wait_ms=1.0)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit("x", 1.0)


def test_serve_route_uses_batcher(synth):
    """serve.py --dynamic-batch: concurrent /synthesize POSTs all succeed
    through the coalescing path."""
    import json
    import sys
    import urllib.request
    from http.server import ThreadingHTTPServer
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.serve import make_handler

    info = {"device": "test", "backend": jax.default_backend(),
            "vocoder_backend": synth.vocoder_backend, "sample_rate": 22050}
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(synth, info, stream_chunk_frames=16,
                     dynamic_batch_wait_ms=100.0))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}/synthesize"
    try:
        bodies = [None] * 3

        def post(i):
            req = urllib.request.Request(
                url, data=json.dumps({"text": TEXTS[i]}).encode(),
                headers={"Content-Type": "application/json"}, method="POST")
            with urllib.request.urlopen(req, timeout=120) as resp:
                bodies[i] = (resp.status, resp.read())

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for status, body in bodies:
            assert status == 200 and body[:4] == b"RIFF"
    finally:
        server.shutdown()


def test_mixed_pcm_formats_group_separately(synth):
    """Concurrent mulaw and int16 submissions must split into their own
    dispatches (different compiled-graph families) and each caller must
    get its own format back."""
    from m2tts_tpu.ops.audio_codec import mulaw_encode_np

    b = DynamicBatcher(synth, max_wait_ms=120.0)
    try:
        results = {}

        def call(i, fmt):
            results[(i, fmt)] = b.submit(TEXTS[i], 1.0, timeout=120,
                                         pcm_format=fmt)

        threads = [threading.Thread(target=call, args=(i, fmt))
                   for i in range(2) for fmt in ("int16", "mulaw")]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        for i in range(2):
            r16 = results[(i, "int16")]
            rmu = results[(i, "mulaw")]
            assert "audio_mulaw" not in r16
            assert rmu["audio_mulaw"].dtype == np.uint8
            np.testing.assert_array_equal(
                rmu["audio_mulaw"], mulaw_encode_np(r16["audio_pcm"]))
    finally:
        b.close()
