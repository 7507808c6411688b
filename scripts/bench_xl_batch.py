#!/usr/bin/env python
"""XL (18.5M, configs/flagship_xl.yaml) batch-size scan for training MFU
(VERDICT r4 task 8): stage-1 step rate + MFU at batch 32/64/128 on the
(128,512) bucket, the stage-2 fused GAN step at the feasible subset, and
XL serving MFU at its measured bucket. One JSON line per leg.

The r04 number (xl_train_mfu 0.139) was a single point at batch 32; if
MFU keeps rising with batch, the "compute-shape-bound" conclusion from
docs/DESIGN.md §2c is premature — this scan measures the knee.

Usage: python scripts/bench_xl_batch.py [--batches 32 64 128] [--gan]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _chip_peak():
    import bench

    return bench._chip_peak()


def scan_stage1(batch: int, n_steps: int = 20):
    import jax
    import numpy as np

    from m2tts_tpu.data.dataset import DummyDataset
    from m2tts_tpu.training.trainer import Stage1Trainer
    from m2tts_tpu.utils.config import load_config

    cfg = load_config(Path(__file__).parent.parent
                      / "configs/flagship_xl.yaml")
    cfg.set("training.batch_size", batch)
    cfg.set("training.save_every", 10**9)
    cfg.set("training.validate_every", 10**9)
    cfg.set("training.device_data_cache", True)
    cfg.set("data.buckets", [[128, 512]])
    out = f"/tmp/bench_xlscan_b{batch}"
    cfg.set("paths.output_dir", out)
    cfg.set("paths.checkpoint_dir", out + "/ckpt")
    cfg.set("paths.log_dir", out + "/logs")
    n_mels = int(cfg.get("model.decoder.mel_channels", 80))
    ds = DummyDataset(size=2 * batch, mel_dim=n_mels, max_text_length=96,
                      max_mel_length=480, seed=0)
    tr = Stage1Trainer(cfg, dataset=ds)
    it = tr._device_cached_iterator()
    if it is None:
        raise RuntimeError(f"device cache unavailable at batch {batch}")
    b0 = next(it)
    tr.state, losses = tr._train_step(tr.state, b0, tr.base_rng)
    jax.block_until_ready(losses)  # compile
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            tr.state, losses = tr._train_step(tr.state, next(it),
                                              tr.base_rng)
        jax.block_until_ready(losses)
        best = max(best, n_steps / (time.perf_counter() - t0))
    assert all(np.isfinite(float(v)) for v in losses.values())
    res = {"leg": "xl_stage1", "batch": batch,
           "steps_per_sec": round(best, 2)}
    ca = tr._train_step.lower(tr.state, b0, tr.base_rng
                              ).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    peak = _chip_peak()
    if flops > 0 and peak:
        res["step_tflops"] = round(flops / 1e12, 4)
        res["mfu"] = round(flops * best / peak, 5)
    del tr, it
    return res


def scan_stage2(batch: int, n_steps: int = 10):
    import jax
    import numpy as np

    from m2tts_tpu.data.dataset import DummyDataset
    from m2tts_tpu.training.trainer_stage2 import Stage2Trainer
    from m2tts_tpu.utils.config import load_config

    # flagship_xl (no EMA / spectral norm): the same harness as
    # bench.py's xl_train2 leg — the quality recipe's EMA shadow breaks
    # the repeated-donation pattern this quick scan uses
    cfg = load_config(Path(__file__).parent.parent
                      / "configs/flagship_xl.yaml")
    cfg.set("training.batch_size", batch)
    cfg.set("training.save_every", 10**9)
    cfg.set("training.validate_every", 10**9)
    cfg.set("training.device_data_cache", True)
    cfg.set("data.buckets", [[128, 512]])
    out = f"/tmp/bench_xlscan2_b{batch}"
    cfg.set("paths.output_dir", out)
    cfg.set("paths.checkpoint_dir", out + "/ckpt")
    cfg.set("paths.log_dir", out + "/logs")
    n_mels = int(cfg.get("model.decoder.mel_channels", 80))
    ds = DummyDataset(size=batch, mel_dim=n_mels, max_text_length=96,
                      max_mel_length=480, seed=0, keep_audio=True)
    tr = Stage2Trainer(cfg, dataset=ds)
    it = tr._device_cached_iterator()
    if it is None:
        raise RuntimeError(f"device cache unavailable at batch {batch}")
    m = tr.train_step(next(it))
    jax.block_until_ready(jax.tree_util.tree_leaves(m))  # compile
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            m = tr.train_step(next(it))
        jax.block_until_ready(jax.tree_util.tree_leaves(m))
        best = max(best, n_steps / (time.perf_counter() - t0))
    assert all(np.isfinite(float(v)) for v in m.values())
    res = {"leg": "xl_stage2", "batch": batch,
           "steps_per_sec": round(best, 2),
           "step_ms": round(1000.0 / best, 1)}
    b2 = next(it)
    ca = tr._gd_step_cached.lower(tr.g_state, tr.d_state, b2, tr.base_rng
                                  ).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    peak = _chip_peak()
    if flops > 0 and peak:
        res["mfu"] = round(flops * best / peak, 5)
    del tr, it
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 64, 128])
    ap.add_argument("--gan", action="store_true",
                    help="also scan the stage-2 fused GAN step")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    from m2tts_tpu.utils.device import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    results = []
    for b in args.batches:
        try:
            r = scan_stage1(b)
        except Exception as e:
            r = {"leg": "xl_stage1", "batch": b, "error": repr(e)}
        print(json.dumps(r))
        results.append(r)
    if args.gan:
        for b in args.batches:
            try:
                r = scan_stage2(b)
            except Exception as e:
                r = {"leg": "xl_stage2", "batch": b, "error": repr(e)}
            print(json.dumps(r))
            results.append(r)
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
