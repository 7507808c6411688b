"""HTTP synthesis server: routes, WAV payloads, error handling."""

import base64
import io
import json
import threading
import urllib.request
import wave
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import pytest

from m2tts_tpu.models import M2TTS
from m2tts_tpu.serving.pipeline import Synthesizer


@pytest.fixture(scope="module")
def serve_synth():
    model = M2TTS(hidden_dim=32, mel_channels=16, vocoder_channels=32,
                  text_encoder_layers=1, decoder_layers=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)
    return Synthesizer(model, params, text_buckets=(32,), frame_buckets=(64,),
                       batch_buckets=(1, 2))


@pytest.fixture(scope="module")
def server_url(serve_synth):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.serve import make_handler

    synth = serve_synth
    info = {"device": "test", "backend": jax.default_backend(),
            "vocoder_backend": synth.vocoder_backend, "sample_rate": 22050}
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(synth, info,
                                              stream_chunk_frames=16))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz") as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok"
    assert body["sample_rate"] == 22050


def test_synthesize_returns_wav(server_url):
    status, ctype, body = _post(server_url + "/synthesize",
                                {"text": "hello server"})
    assert status == 200 and ctype == "audio/wav"
    with wave.open(io.BytesIO(body)) as f:
        assert f.getframerate() == 22050
        assert f.getnframes() > 0


def test_synthesize_batch(server_url):
    status, _, body = _post(server_url + "/synthesize_batch",
                            {"texts": ["one", "two longer text"]})
    assert status == 200
    results = json.loads(body)["results"]
    assert len(results) == 2
    wav = base64.b64decode(results[0]["audio_b64"])
    assert wav[:4] == b"RIFF"
    assert results[1]["seconds"] > 0


def test_missing_text_is_400(server_url):
    status, _, body = _post(server_url + "/synthesize", {"nope": 1})
    assert status == 400
    assert "text" in json.loads(body)["error"]


def test_bad_json_is_400(server_url):
    req = urllib.request.Request(server_url + "/synthesize", data=b"not json",
                                 method="POST")
    try:
        with urllib.request.urlopen(req) as resp:
            status = resp.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_unknown_route_404(server_url):
    status, _, _ = _post(server_url + "/nope", {"x": 1})
    assert status == 404


def test_bad_duration_scale_is_400(server_url):
    status, _, body = _post(server_url + "/synthesize",
                            {"text": "x", "duration_scale": "fast"})
    assert status == 400
    assert "duration_scale" in json.loads(body)["error"]


def test_long_text_auto_chunks(server_url):
    text = "the quick brown fox jumps over the lazy dog. " * 6
    status, ctype, body = _post(server_url + "/synthesize", {"text": text})
    assert status == 200 and ctype == "audio/wav"
    with wave.open(io.BytesIO(body)) as f:
        assert f.getnframes() > 0


def test_synthesize_stream_chunked_wav(server_url, serve_synth):
    """/synthesize_stream returns a chunked streaming WAV whose PCM
    matches the StreamingSynthesizer (same kernels/params) exactly and
    the batch path up to cross-jit float reassociation (VERDICT r3
    task 4)."""
    import numpy as np

    from m2tts_tpu.serving.streaming import StreamingSynthesizer

    text = "hello streaming world"
    status, ctype, body = _post(server_url + "/synthesize_stream",
                                {"text": text, "duration_scale": 8.0})
    assert status == 200
    assert ctype == "audio/wav"
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    pcm = np.frombuffer(body[44:], "<i2")
    assert len(pcm) > 0

    synth = serve_synth
    ss = StreamingSynthesizer(
        synth.model, synth.params, chunk_frames=16,
        max_frames=max(synth.frame_buckets),
        text_bucket=max(synth.text_buckets),
        vocoder_backend=synth.vocoder_backend,
        compute_dtype=synth.compute_dtype)
    local = np.concatenate(list(ss.stream(text, 8.0)))
    local_pcm = (np.clip(local, -1.0, 1.0) * 32767.0).astype(np.int16)
    assert len(local_pcm) == len(pcm)
    np.testing.assert_array_equal(pcm, local_pcm)

    # batch path at the same frame budget: same audio up to fp
    # reassociation across separately-jitted graphs (±1 PCM LSB)
    batch = synth.synthesize_batch([text], duration_scale=8.0,
                                   max_frames=max(synth.frame_buckets))[0]
    bp = batch["audio_pcm"]
    n = min(len(bp), len(pcm))
    assert abs(len(bp) - len(pcm)) <= 2 * 16  # chunk-boundary trim slack
    assert np.max(np.abs(pcm[:n].astype(np.int32)
                         - bp[:n].astype(np.int32))) <= 2


def test_stream_is_http11(server_url):
    """Chunked transfer-encoding requires an HTTP/1.1 status line;
    version-honoring clients would otherwise read the raw chunk framing
    as body bytes."""
    import http.client
    from urllib.parse import urlparse

    u = urlparse(server_url)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=120)
    conn.request("POST", "/synthesize_stream",
                 body=json.dumps({"text": "version check"}),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.version == 11
    assert resp.headers.get("Transfer-Encoding") == "chunked"
    body = resp.read()
    assert body[:4] == b"RIFF"
    conn.close()


def test_stream_midstream_error_terminates_body(serve_synth, monkeypatch):
    """A synthesis failure after headers are sent must terminate the
    chunked body early — NOT append a second HTTP response (JSON 500)
    to the same connection — and the server must stay serviceable."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.serve import make_handler

    from m2tts_tpu.serving import streaming as streaming_mod

    def boom_stream(self, text, duration_scale=1.0):
        yield __import__("numpy").zeros(64, "float32")
        raise RuntimeError("simulated mid-stream device failure")

    monkeypatch.setattr(streaming_mod.StreamingSynthesizer, "stream",
                        boom_stream)
    info = {"device": "test", "backend": jax.default_backend(),
            "vocoder_backend": serve_synth.vocoder_backend,
            "sample_rate": 22050}
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(serve_synth, info, stream_chunk_frames=16))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        status, ctype, body = _post(url + "/synthesize_stream",
                                    {"text": "will fail mid-stream"})
        # one clean (truncated) chunked WAV: header + first chunk, no
        # trailing second response after the terminator
        assert status == 200 and ctype == "audio/wav"
        assert body[:4] == b"RIFF"
        assert b"HTTP/" not in body and b"error" not in body
        # the worker thread died with its request; the server still serves
        status2, _, body2 = _post(url + "/synthesize",
                                  {"text": "still alive"})
        assert status2 == 200 and body2[:4] == b"RIFF"
    finally:
        server.shutdown()


def _parse_mulaw_wav(body: bytes):
    """Parse the hand-rolled G.711 WAV (stdlib wave is PCM-only):
    returns (sample_rate, mulaw_payload_bytes)."""
    import struct

    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    assert body[12:16] == b"fmt " and struct.unpack("<I", body[16:20])[0] == 18
    tag, ch, sr, br, ba, bits, cb = struct.unpack("<HHIIHHH", body[20:38])
    assert (tag, ch, bits) == (7, 1, 8)   # WAVE_FORMAT_MULAW, mono, 8-bit
    assert (br, ba, cb) == (sr, 1, 0)
    assert body[38:42] == b"fact"
    assert body[50:54] == b"data"
    n = struct.unpack("<I", body[54:58])[0]
    data = body[58:]
    return sr, (data[:n] if n != 0xFFFFFFFF else data)


def test_synthesize_mulaw_wav(server_url):
    import numpy as np

    from m2tts_tpu.ops.audio_codec import mulaw_decode_np

    s16, _, body16 = _post(server_url + "/synthesize", {"text": "mu law"})
    smu, _, bodymu = _post(server_url + "/synthesize",
                           {"text": "mu law", "format": "mulaw"})
    assert s16 == 200 and smu == 200
    sr, payload = _parse_mulaw_wav(bodymu)
    assert sr == 22050
    pcm16 = np.frombuffer(body16[44:], "<i2")
    assert len(payload) == len(pcm16)  # 1 byte/sample vs 2: half the WAV
    dec = mulaw_decode_np(np.frombuffer(payload, np.uint8))
    err = dec.astype(np.int32) - pcm16.astype(np.int32)
    assert np.abs(err).max() <= 1024  # companding quantization bound


def test_synthesize_batch_mulaw(server_url):
    status, _, body = _post(server_url + "/synthesize_batch",
                            {"texts": ["hello mu law world",
                                       "two longer text here"],
                             "format": "mulaw"})
    assert status == 200
    results = json.loads(body)["results"]
    assert any(r["seconds"] > 0 for r in results)
    for r in results:
        wav = base64.b64decode(r["audio_b64"])
        sr, payload = _parse_mulaw_wav(wav)
        assert sr == 22050
        assert r["seconds"] == pytest.approx(len(payload) / 22050)


def test_stream_mulaw_matches_pcm_stream(server_url):
    import numpy as np

    from m2tts_tpu.ops.audio_codec import MULAW_DECODE_TABLE

    body16 = _post(server_url + "/synthesize_stream",
                   {"text": "stream mu"})[2]
    bodymu = _post(server_url + "/synthesize_stream",
                   {"text": "stream mu", "format": "mulaw"})[2]
    sr, payload = _parse_mulaw_wav(bodymu)
    pcm16 = np.frombuffer(body16[44:], "<i2")
    assert len(payload) == len(pcm16)
    dec = MULAW_DECODE_TABLE[np.frombuffer(payload, np.uint8)]
    err = dec.astype(np.int32) - pcm16.astype(np.int32)
    assert np.abs(err).max() <= 1024


def test_bad_format_is_400(server_url):
    status, _, body = _post(server_url + "/synthesize",
                            {"text": "x", "format": "opus"})
    assert status == 400
    assert "format" in json.loads(body)["error"]
