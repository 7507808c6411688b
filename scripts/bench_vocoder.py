#!/usr/bin/env python
"""Vocoder backend shootout: device-only per-batch wall for every backend.

Times ONLY the vocoder (mel -> audio) as one jitted graph per backend,
with weights threaded as arguments (packing inside the trace) so Pallas
kernels compile through remote-Mosaic setups. Prints one JSON line per
(backend, dtype) with the median per-batch wall in ms.

The r3 DESIGN.md S2 table (xla/mm/pallas at 256/512 channels) came from
this measurement recipe; this script makes it repeatable and adds the
phase-packed kernel (ops/pallas/vocoder_packed.py).

Usage:
  python scripts/bench_vocoder.py --channels 256 --batch 64 --frames 512
  python scripts/bench_vocoder.py --backends xla,pallas_packed --dtypes bf16
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--channels", type=int, default=256,
                    help="vocoder hidden_channels")
    ap.add_argument("--mel-channels", type=int, default=80)
    ap.add_argument("--rates", default="8,8,2,2")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--backends", default="xla,mm,pallas,pallas_packed")
    ap.add_argument("--dtypes", default="f32,bf16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--scan", type=int, default=10,
                    help="inner lax.scan steps for the device-only wall "
                         "(removes per-dispatch tunnel latency, like "
                         "bench.py's device-only train rate)")
    args = ap.parse_args()

    from m2tts_tpu.utils.device import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    from m2tts_tpu.models.tts_model import Vocoder
    from m2tts_tpu.ops.vocoder_mm import (pack_vocoder_weights,
                                          vocoder_mm_forward)

    rates = tuple(int(r) for r in args.rates.split(","))
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    voc = Vocoder(args.mel_channels, args.channels, 3, rates)

    # init on host CPU (per-op round trips on a tunneled TPU are ~90 s),
    # ship the finished tree in one transfer
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            params = voc.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 8, args.mel_channels), jnp.float32))
    except RuntimeError:
        params = voc.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8, args.mel_channels), jnp.float32))
    params = jax.device_put(params, jax.devices()[0])

    rng = np.random.default_rng(0)
    mel = jax.device_put(jnp.asarray(
        rng.normal(size=(args.batch, args.frames, args.mel_channels)),
        jnp.float32), jax.devices()[0])
    # distinct inputs per timed call: the tunneled runtime memoizes
    # identical (executable, args) executions, which turns a repeated
    # per-dispatch wall into a vacuous ~0.04 ms cache hit
    mels = jax.block_until_ready(
        [mel + i * 1e-6 for i in range(args.iters + args.warmup)])

    def make_fn(backend: str, dtype: str):
        if backend == "xla":
            cdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32

            def f(p, m):
                pc = jax.tree.map(lambda a: a.astype(cdt), p)
                return voc.apply(pc, m.astype(cdt))[..., 0].astype(
                    jnp.float32)
        elif backend == "mm":
            if dtype != "f32":
                return None  # mm path is f32-only by design

            def f(p, m):
                return vocoder_mm_forward(
                    m, pack_vocoder_weights(p["params"], rates))
        elif backend == "pallas":
            from m2tts_tpu.ops.pallas.vocoder import fused_vocoder_forward

            def f(p, m):
                return fused_vocoder_forward(
                    m, pack_vocoder_weights(p["params"], rates), rates,
                    tile=args.tile, interpret=interpret,
                    compute_dtype=dtype)
        elif backend == "pallas_packed":
            from m2tts_tpu.ops.pallas.vocoder_packed import (
                fused_vocoder_packed_forward)

            def f(p, m):
                return fused_vocoder_packed_forward(
                    m, pack_vocoder_weights(p["params"], rates), rates,
                    tile=args.tile, interpret=interpret,
                    compute_dtype=dtype)
        else:
            raise SystemExit(f"unknown backend {backend!r}")
        return jax.jit(f)

    ref = None
    for backend in args.backends.split(","):
        for dtype in args.dtypes.split(","):
            fn = make_fn(backend, dtype)
            if fn is None:
                continue
            try:
                t0 = time.perf_counter()
                out = jax.block_until_ready(fn(params, mel))
                compile_s = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001 - report and continue
                print(json.dumps({"backend": backend, "dtype": dtype,
                                  "error": f"{type(e).__name__}: {e}"[:300]}))
                continue
            if ref is None and dtype == "f32":
                ref = np.asarray(out)
            err = (float(np.mean(np.abs(np.asarray(out) - ref)))
                   if ref is not None else None)
            for j in range(args.warmup):
                out = fn(params, mels[args.iters + j])
            jax.block_until_ready(out)
            walls = []
            for j in range(args.iters):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(params, mels[j]))
                walls.append(time.perf_counter() - t0)
            ms_delivered = float(np.median(walls) * 1e3)

            # device-only: chain --scan calls in ONE dispatch; the tiny
            # audio-dependent perturbation of the carry serializes steps
            # so XLA cannot collapse the loop body
            raw = fn.__wrapped__

            def body(m, _):
                a = raw(params, m)
                return m + 0.0 * a[:, :1, None], ()

            scanned = jax.jit(lambda m: jax.lax.scan(
                body, m, None, length=args.scan)[0])
            jax.block_until_ready(scanned(mel))
            walls = []
            for _ in range(max(2, args.iters // 4)):
                t0 = time.perf_counter()
                jax.block_until_ready(scanned(mel))
                walls.append(time.perf_counter() - t0)
            ms = float(np.median(walls) * 1e3 / args.scan)
            audio_s = args.batch * args.frames * int(np.prod(rates)) / 22050
            print(json.dumps({
                "backend": backend, "dtype": dtype, "ms": round(ms, 2),
                "ms_delivered": round(ms_delivered, 2),
                "audio_sec_per_s": round(audio_s / (ms / 1e3), 1),
                "mae_vs_f32ref": None if err is None else round(err, 6),
                "compile_s": round(compile_s, 1),
                "platform": jax.default_backend(),
                "shape": [args.batch, args.frames, args.channels],
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
