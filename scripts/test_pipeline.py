#!/usr/bin/env python
"""End-to-end pipeline smoke suite (standalone, prints PASS/FAIL per part).

Covers the reference's scripts/test_pipeline.py seven-part suite
(device, text processing, phoneme dict, model forward, inference + WAV,
dataset batching, config loading; reference scripts/test_pipeline.py:210-265)
against the TPU-native stack. Runs on whatever JAX backend is available;
`--cpu` forces the host platform with a virtual 8-device mesh so the
sharded paths are exercised too.

Exit code 0 iff every part passes. The pytest suite under tests/ is the
real test surface; this script is the quick operator-facing health check
(`make test-quick`).
"""

import argparse
import os
import sys
import tempfile
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _part(name):
    def deco(fn):
        fn._part_name = name
        return fn
    return deco


@_part("device setup")
def test_device():
    import jax
    from m2tts_tpu.utils.device import get_device_info, setup_devices

    devices = setup_devices()
    info = get_device_info()
    assert len(devices) >= 1
    print(f"    backend={jax.default_backend()} devices={len(devices)} "
          f"host_mem_gb={info.get('host_memory_total_gb', 0):.1f}")


@_part("text processing")
def test_text():
    from m2tts_tpu.frontend.text import TextProcessor

    tp = TextProcessor()
    out = tp.process("Hello world, this is a test!", max_length=64)
    ids, length = out["phoneme_ids"], out["length"]
    assert len(ids) == 64 and 0 < length <= 64
    assert all(0 <= i < 256 for i in ids)
    print(f"    {length} phonemes (padded to 64)")


@_part("phoneme dictionary")
def test_phoneme_dict():
    from m2tts_tpu.frontend.text import PHONEMES, PHONEME_TO_ID, write_phoneme_dict

    assert len(PHONEMES) == len(set(PHONEMES)) == len(PHONEME_TO_ID)
    with tempfile.TemporaryDirectory() as d:
        path = Path(d) / "phonemes.tsv"
        write_phoneme_dict(path)
        lines = path.read_text().strip().splitlines()
        assert len(lines) == len(PHONEMES)
    print(f"    {len(PHONEMES)} phonemes")


@_part("model forward")
def test_model_forward():
    import jax
    import jax.numpy as jnp
    from m2tts_tpu.models import build_model, init_params
    from m2tts_tpu.utils.config import load_config

    cfg = load_config(REPO / "configs" / "stage1_poc.yaml")
    model = build_model(cfg.model)
    ids = jnp.zeros((2, 32), jnp.int32).at[:, :10].set(5)
    lengths = jnp.array([10, 8], jnp.int32)
    # CPU init + one transfer — a direct model.init on a tunneled TPU
    # backend dispatches per-op (~90 s for flagship; CLAUDE.md)
    params = init_params(model, jax.random.PRNGKey(0), ids, lengths,
                         max_frames=128)
    out = model.apply(params, ids, lengths, max_frames=128)
    mel = out["mel_output"]
    assert mel.shape[0] == 2 and mel.shape[2] == cfg.model.decoder.mel_channels
    assert bool(jnp.isfinite(mel).all())
    print(f"    mel {tuple(mel.shape)} finite")


@_part("inference + WAV")
def test_inference_wav():
    import jax
    import numpy as np
    from m2tts_tpu.frontend.audio import save_wav
    from m2tts_tpu.serving import pipeline
    from m2tts_tpu.utils.config import load_config

    cfg = load_config(REPO / "configs" / "stage1_poc.yaml")
    synth = pipeline.from_config(cfg, rng=jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    results = synth.synthesize_batch(["Testing speech synthesis on TPU."])
    audio = np.asarray(results[0]["audio"], np.float32)
    assert audio.ndim == 1 and audio.size > 0 and np.isfinite(audio).all()
    with tempfile.TemporaryDirectory() as d:
        save_wav(audio, Path(d) / "smoke.wav", 22050)
    print(f"    {audio.size} samples in {time.perf_counter() - t0:.2f}s "
          f"(includes compile)")


@_part("dataset batching")
def test_dataset():
    from m2tts_tpu.data.dataset import DummyDataset, make_batches

    ds = DummyDataset(size=16)
    buckets = [(64, 256), (128, 512)]
    batches = list(make_batches(ds, batch_size=4, buckets=buckets, seed=0))
    assert batches, "no batches produced"
    b = batches[0]
    assert b["phoneme_ids"].shape[0] == 4
    assert b["mel"].shape[1] in (256, 512)
    print(f"    {len(batches)} batches, first mel {tuple(b['mel'].shape)}")


@_part("config loading")
def test_config():
    from m2tts_tpu.utils.config import load_config

    names = ("stage1_poc.yaml", "stage2_quality.yaml", "flagship_tpu.yaml",
             "flagship_xl.yaml")
    for name in names:
        cfg = load_config(REPO / "configs" / name)
        for group in ("model", "training", "data", "system", "paths"):
            assert group in cfg, f"{name} missing group {group}"
    print(f"    {len(names)} configs x 5 groups ok")


ALL_PARTS = [test_device, test_text, test_phoneme_dict, test_model_forward,
             test_inference_wav, test_dataset, test_config]


def main(argv=None):
    p = argparse.ArgumentParser(description="pipeline smoke suite")
    p.add_argument("--cpu", action="store_true",
                   help="force CPU backend with a virtual 8-device mesh")
    p.add_argument("--quick", action="store_true",
                   help="skip the inference+WAV part (slowest: full compile)")
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    parts = [f for f in ALL_PARTS if not (args.quick and f is test_inference_wav)]
    failed = []
    for fn in parts:
        name = fn._part_name
        print(f"[ .. ] {name}")
        try:
            fn()
            print(f"[ OK ] {name}")
        except Exception:
            traceback.print_exc()
            print(f"[FAIL] {name}")
            failed.append(name)

    print(f"\n{len(parts) - len(failed)}/{len(parts)} parts passed"
          + (f"; FAILED: {', '.join(failed)}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
