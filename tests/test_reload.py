"""Zero-downtime weight swap: Synthesizer.swap_params and the serve.py
/reload route. The compiled graphs take params as arguments, so a swap
must change the audio without any recompilation."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models import M2TTS
from m2tts_tpu.serving.pipeline import Synthesizer


def _model_and_params(seed):
    model = M2TTS(hidden_dim=32, mel_channels=16, vocoder_channels=32,
                  text_encoder_layers=1, decoder_layers=1)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)
    return model, params


BUCKETS = dict(text_buckets=(32,), frame_buckets=(64,), batch_buckets=(1,))


def test_swap_params_changes_output_without_recompile():
    model, p_a = _model_and_params(0)
    _, p_b = _model_and_params(1)
    synth = Synthesizer(model, p_a, **BUCKETS)
    text = "rolling checkpoint update"
    audio_a = synth.synthesize(text)["audio_pcm"]
    compiled_before = dict(synth._synth)  # the jitted-graph cache

    synth.swap_params(p_b)
    audio_b = synth.synthesize(text)["audio_pcm"]
    # same executables, new weights
    assert synth._synth == compiled_before
    assert not np.array_equal(audio_a, audio_b)
    # matches a synthesizer built on the new weights from scratch
    fresh = Synthesizer(model, p_b, **BUCKETS)
    np.testing.assert_array_equal(audio_b, fresh.synthesize(text)["audio_pcm"])
    # and swapping back restores the original audio exactly
    synth.swap_params(p_a)
    np.testing.assert_array_equal(synth.synthesize(text)["audio_pcm"],
                                  audio_a)


def test_swap_params_rejects_mismatched_tree():
    model, p_a = _model_and_params(0)
    other = M2TTS(hidden_dim=64, mel_channels=16, vocoder_channels=32,
                  text_encoder_layers=1, decoder_layers=1)
    p_other = other.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                         max_frames=16, run_vocoder=True)
    synth = Synthesizer(model, p_a, **BUCKETS)
    with pytest.raises(ValueError, match="mismatch"):
        synth.swap_params(p_other)
    # serving params unchanged after the rejected swap
    assert synth.synthesize("still serving")["audio_pcm"].size > 0


def test_serve_reload_route(monkeypatch, tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.serve import make_handler

    model, p_a = _model_and_params(0)
    _, p_b = _model_and_params(1)
    synth = Synthesizer(model, p_a, **BUCKETS)
    monkeypatch.setattr("m2tts_tpu.utils.checkpoint.load_for_inference",
                        lambda ck, step=None: (p_b, None, 7))
    info = {"device": "test", "backend": jax.default_backend(),
            "vocoder_backend": synth.vocoder_backend, "sample_rate": 22050}
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(synth, info))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"

    def post(path, obj):
        req = urllib.request.Request(
            url + path, data=json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, r.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    try:
        _, wav_a = post("/synthesize", {"text": "before the rollout"})
        status, body = post("/reload", {"checkpoint": str(tmp_path)})
        assert status == 200 and json.loads(body)["step"] == 7
        _, wav_b = post("/synthesize", {"text": "before the rollout"})
        assert wav_a != wav_b  # new weights serve immediately

        status, body = post("/reload", {})
        assert status == 400

        fresh = Synthesizer(model, p_b, **BUCKETS)
        expected = fresh.synthesize("before the rollout")["audio_pcm"]
        got = np.frombuffer(wav_b[44:], "<i2")
        np.testing.assert_array_equal(got, expected)
    finally:
        server.shutdown()
