#!/usr/bin/env python
"""Stage-2 GAN training CLI (reference training/train_stage2.py surface).

    python scripts/train_stage2.py --config configs/stage2_quality.yaml \
        [--resume] [key.path=value ...]
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description="m2tts_tpu stage-2 GAN training")
    p.add_argument("--config", type=str, default="configs/stage2_quality.yaml")
    p.add_argument("--resume", action="store_true")
    p.add_argument("overrides", nargs="*", help="key.path=value overrides")
    args = p.parse_args(argv)

    from m2tts_tpu.utils.device import (enable_persistent_compile_cache,
                                        honor_platform_env)
    honor_platform_env()
    enable_persistent_compile_cache()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    from m2tts_tpu.training.trainer_stage2 import Stage2Trainer
    from m2tts_tpu.utils.config import load_config
    from m2tts_tpu.utils.device import get_device_info

    config = load_config(args.config, overrides=args.overrides)
    logging.info("Devices: %s", get_device_info())
    trainer = Stage2Trainer(config)
    trainer.train(resume=args.resume)
    trainer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
