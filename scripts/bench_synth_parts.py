#!/usr/bin/env python
"""Device-only breakdown of the batched synthesis graph.

Splits bench.py's flagship serving dispatch (batch 64, text 128, frames
512, bf16, packed-vocoder auto backend) into its parts, each timed as a
back-to-back dispatch chain with ONE trailing block (the bench.py
device-only recipe — nothing is fetched inside a timed window):

  full        : the production _get_synth graph (acoustic + vocoder + PCM)
  acoustic    : text -> masked mel (encoder + duration + regulator + decoder)
  vocoder     : mel -> audio through the serving vocoder dispatch
  probe       : encoder + duration predictor (the frame-count probe)

Prints one JSON object with per-batch walls in ms. The parts are
measured on distinct inputs derived per-iteration from a counter, so
the tunnel's execution memoizer cannot collapse repeated dispatches
(see scripts/bench_vocoder.py for the same trick).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 64
TEXT_BUCKET = 128
FRAME_BUCKET = 512
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from m2tts_tpu.utils.device import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from m2tts_tpu.models import build_model, init_params
    from m2tts_tpu.serving.pipeline import Synthesizer
    from m2tts_tpu.utils.config import load_config

    root = Path(__file__).resolve().parent.parent
    cfg = load_config(root / "configs/flagship_tpu.yaml")
    model = build_model(cfg.model)
    params = init_params(model, jax.random.PRNGKey(0),
                         jnp.zeros((1, 8), jnp.int32), max_frames=16,
                         run_vocoder=True)
    synth = Synthesizer(model, params, text_buckets=(TEXT_BUCKET,),
                        frame_buckets=(FRAME_BUCKET,),
                        batch_buckets=(1, BATCH), vocoder_backend="auto")

    texts = ["The quick brown fox jumps over the lazy dog."] * BATCH
    ids, lengths = synth._encode_batch(texts)
    packed = synth._put(synth._pack(ids, lengths))
    frames = synth.predict_frames(ids, lengths, 1.0)
    scale = synth._scale_arr(float(FRAME_BUCKET * 0.85 / max(frames.mean(), 1.0)))

    bf16 = synth.compute_dtype == "bf16"

    def timed(fn, args_for):
        """Per-batch wall (ms): dispatch ITERS chained, block on last."""
        fn(*args_for(0))  # compile + warm
        walls = []
        for _ in range(3):
            argsets = [args_for(i) for i in range(ITERS)]
            t0 = time.perf_counter()
            outs = [fn(*a) for a in argsets]
            jax.block_until_ready(outs[-1])
            walls.append((time.perf_counter() - t0) / ITERS * 1000.0)
        return min(walls)

    # vary the duration scale per iteration so dispatches are distinct
    scales = [synth._scale_arr(float(scale) * (1.0 + 1e-4 * i))
              for i in range(ITERS)]

    # -- full production graph
    full_fn = synth._get_synth(FRAME_BUCKET, False)
    t_full = timed(full_fn, lambda i: (synth.params, packed, scales[i]))

    # -- acoustic only (same bf16-inside-graph policy as _get_synth)
    def acoustic_fn(p, pk, sc):
        i, l = pk[:, :-1], pk[:, -1]
        pc = synth._bf16_params(p) if bf16 else p
        out = model.apply(pc, i, l, duration_scale=sc,
                          max_frames=FRAME_BUCKET, method=model.acoustic)
        return out["mel_output"], out["total_frames"]

    acoustic_jit = jax.jit(acoustic_fn)
    t_acoustic = timed(acoustic_jit, lambda i: (synth.params, packed, scales[i]))

    # -- vocoder only, through the serving dispatch (packed kernel on TPU)
    mel0 = np.random.default_rng(0).standard_normal(
        (BATCH, FRAME_BUCKET, model.mel_channels)).astype(np.float32)
    mels = [jnp.asarray(mel0 + 1e-4 * i) for i in range(ITERS)]
    vf = synth._vocoder_fn
    if vf is not None:
        voc_jit = jax.jit(lambda p, m: vf(p, m))
    else:
        def voc_xla(p, m):
            pc = synth._bf16_params(p) if bf16 else p
            return model.apply(pc, m.astype(jnp.bfloat16 if bf16 else
                                            jnp.float32),
                               method=lambda mdl, mm: mdl.vocoder(mm))
        voc_jit = jax.jit(voc_xla)
    t_vocoder = timed(voc_jit, lambda i: (synth.params, mels[i]))

    # -- duration probe (encoder + duration predictor)
    probe = synth._get_probe()
    t_probe = timed(probe, lambda i: (synth.params, packed, scales[i]))

    audio_sec = BATCH * FRAME_BUCKET * synth.upsample / 22050.0
    out = {
        "full_ms": round(t_full, 2),
        "acoustic_ms": round(t_acoustic, 2),
        "vocoder_ms": round(t_vocoder, 2),
        "probe_ms": round(t_probe, 2),
        "residual_ms": round(t_full - t_acoustic - t_vocoder, 2),
        "device_audio_sec_per_sec": round(audio_sec / (t_full / 1000.0), 1),
        "batch": BATCH, "text_bucket": TEXT_BUCKET,
        "frame_bucket": FRAME_BUCKET,
        "vocoder_backend": synth.vocoder_backend,
        "compute_dtype": synth.compute_dtype,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
