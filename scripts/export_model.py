#!/usr/bin/env python
"""Export a deployable StableHLO serving artifact from a checkpoint.

The artifact (graphs + weights + manifest; m2tts_tpu/serving/export.py)
synthesizes via ``ExportedSynthesizer`` without the model's Python code
— the deployment story the reference lacks entirely (its inference
re-instantiates the torch model per run, reference
scripts/synthesize.py:91-161).

Usage:
  python scripts/export_model.py --checkpoint outputs/stage1/checkpoints \
      --output exported/ [--full] [--platforms tpu,cpu]
  python scripts/export_model.py --random-init --config configs/flagship_tpu.yaml \
      --output exported/   # untrained demo artifact
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Export a deployable StableHLO serving artifact")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--torch-checkpoint", type=str, default=None)
    p.add_argument("--random-init", action="store_true",
                   help="untrained demo artifact from --config")
    p.add_argument("--config", type=str, default="configs/flagship_tpu.yaml")
    p.add_argument("--output", type=str, required=True,
                   help="artifact directory to write")
    p.add_argument("--full", action="store_true",
                   help="export EVERY reachable (batch, text, frame) "
                        "bucket graph, not just the single-stream path")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma-separated lowering targets (e.g. "
                        "'tpu,cpu'); default: the exporting host's "
                        "platform")
    p.add_argument("--compute-dtype", type=str, default="auto",
                   choices=("auto", "bf16", "f32"))
    p.add_argument("--step", type=str, default=None,
                   help="checkpoint step to export ('best' allowed)")
    args = p.parse_args(argv)

    from m2tts_tpu.utils.device import (enable_persistent_compile_cache,
                                        honor_platform_env)
    honor_platform_env()
    enable_persistent_compile_cache()

    from m2tts_tpu.serving import pipeline
    from m2tts_tpu.serving.export import export_synthesizer

    kwargs = {"compute_dtype": args.compute_dtype}
    if args.checkpoint:
        ck = {"step": args.step} if args.step else {}
        synth = pipeline.from_checkpoint(args.checkpoint, **ck, **kwargs)
    elif args.torch_checkpoint:
        synth = pipeline.from_torch_checkpoint(args.torch_checkpoint,
                                               **kwargs)
    elif args.random_init:
        from m2tts_tpu.utils.config import load_config

        synth = pipeline.from_config(load_config(args.config), **kwargs)
    else:
        p.error("one of --checkpoint / --torch-checkpoint / --random-init "
                "is required")

    platforms = (tuple(s.strip() for s in args.platforms.split(","))
                 if args.platforms else None)
    manifest = export_synthesizer(synth, args.output, full=args.full,
                                  platforms=platforms)
    total = sum(f.stat().st_size
                for f in Path(args.output).rglob("*") if f.is_file())
    print(f"exported {len(manifest['graphs'])} synthesis graphs + "
          f"{len(manifest['probes'])} probes for platforms "
          f"{manifest['platforms']} -> {args.output} "
          f"({total / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
