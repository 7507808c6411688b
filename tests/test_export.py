"""StableHLO export artifacts: roundtrip equality with the live
Synthesizer, manifest/params integrity, CLI surface."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models import M2TTS
from m2tts_tpu.serving.export import (ExportedSynthesizer,
                                      export_synthesizer)
from m2tts_tpu.serving.pipeline import Synthesizer


@pytest.fixture(scope="module")
def synth():
    model = M2TTS(hidden_dim=32, mel_channels=16, vocoder_channels=32,
                  text_encoder_layers=1, decoder_layers=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)
    return Synthesizer(model, params, text_buckets=(16, 32),
                       frame_buckets=(32, 64), batch_buckets=(1, 2))


@pytest.fixture(scope="module")
def artifact(synth, tmp_path_factory):
    out = tmp_path_factory.mktemp("export")
    manifest = export_synthesizer(synth, out, full=True)
    return out, manifest


def test_manifest_and_files(artifact):
    out, manifest = artifact
    assert manifest["artifact_version"] == 1
    # full=True: every (batch, text, frame) combination
    assert len(manifest["graphs"]) == 2 * 2 * 2
    assert len(manifest["probes"]) == 2 * 2
    for g in manifest["graphs"] + manifest["probes"]:
        assert (out / g["file"]).stat().st_size > 0
    assert json.loads((out / "manifest.json").read_text()) == manifest


def test_params_roundtrip_exact(artifact, synth):
    out, _ = artifact
    ex = ExportedSynthesizer(out)
    flat_live, _ = jax.tree_util.tree_flatten(jax.device_get(synth.params))
    flat_back, _ = jax.tree_util.tree_flatten(ex.params)
    assert len(flat_live) == len(flat_back)
    for a, b in zip(flat_live, flat_back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_matches_live_synthesizer(artifact, synth):
    out, _ = artifact
    ex = ExportedSynthesizer(out)
    texts = ["hello exported world", "two at once"]
    live = synth.synthesize_batch(texts, 1.0)
    back = ex.synthesize_batch(texts, 1.0)
    for lr, br in zip(live, back):
        assert lr["frames"] == br["frames"]
        np.testing.assert_array_equal(lr["audio_pcm"], br["audio_pcm"])


def test_exported_single_and_scale(artifact, synth):
    out, _ = artifact
    ex = ExportedSynthesizer(out)
    live = synth.synthesize("scaled speech", 1.5)
    back = ex.synthesize("scaled speech", 1.5)
    assert back["frames"] == live["frames"]
    np.testing.assert_array_equal(back["audio_pcm"], live["audio_pcm"])
    assert back["audio"].dtype == np.float32


def test_single_stream_export_is_small(synth, tmp_path):
    manifest = export_synthesizer(synth, tmp_path, full=False)
    # smallest batch bucket only
    assert {g["batch"] for g in manifest["graphs"]} == {1}


def test_lexicon_travels_in_manifest(tmp_path):
    """Custom lexicon entries must pronounce identically from the
    artifact (review finding: the loader used a bare TextProcessor)."""
    model = M2TTS(hidden_dim=32, mel_channels=16, vocoder_channels=32,
                  text_encoder_layers=1, decoder_layers=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)
    lex = {"zyzzyva": ["Z", "IH", "Z", "IH", "V", "AH"]}
    s = Synthesizer(model, params, text_buckets=(16,), frame_buckets=(32,),
                    batch_buckets=(1,), extra_lexicon=lex)
    manifest = export_synthesizer(s, tmp_path)
    assert manifest["extra_lexicon"] == lex
    ex = ExportedSynthesizer(tmp_path)
    assert (ex.text_processor.text_to_phonemes("zyzzyva")
            == s.text_processor.text_to_phonemes("zyzzyva"))
    live = s.synthesize("zyzzyva")
    back = ex.synthesize("zyzzyva")
    np.testing.assert_array_equal(live["audio_pcm"], back["audio_pcm"])


def test_cli_export(synth, tmp_path, monkeypatch):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import scripts.export_model as cli

    # stub the factory so the CLI exports our tiny fixture model
    monkeypatch.setattr("m2tts_tpu.serving.pipeline.from_config",
                        lambda cfg, **kw: synth)
    rc = cli.main(["--random-init", "--config", "configs/stage1_poc.yaml",
                   "--output", str(tmp_path / "art")])
    assert rc == 0
    ex = ExportedSynthesizer(tmp_path / "art")
    r = ex.synthesize("command line artifact")
    assert r["audio_pcm"].dtype == np.int16 and len(r["audio_pcm"]) > 0
