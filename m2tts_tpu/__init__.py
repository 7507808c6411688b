"""m2tts_tpu — a TPU-native (JAX/XLA/Pallas/pjit) non-autoregressive TTS framework.

A ground-up rebuild of the capabilities of the `m2-tts` reference (a
FastSpeech-style PyTorch/MPS system), redesigned TPU-first:

- Host-side text/audio frontend producing fixed-shape, bucketed batches
  (no recompilation inside the serving/training loops).
- Flax model core compiled to fused XLA graphs; the length regulator is a
  static-shape cumsum/gather op instead of a Python loop.
- HiFi-GAN-lite vocoder with both a pure-XLA path and a fused Pallas
  kernel path operating on VMEM-resident tiles.
- Data/tensor-parallel scaling via `jax.sharding.Mesh` + jit shardings;
  gradients ride ICI collectives inserted by XLA.
- Orbax checkpoints that embed the config (self-describing, like the
  reference's torch.save dicts, cf. reference training/train.py:240-250).
"""

__version__ = "0.1.0"

from m2tts_tpu.utils.config import Config, load_config  # noqa: F401
