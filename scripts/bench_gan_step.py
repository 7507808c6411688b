"""Ablation bench for the stage-2 fused GAN step (device-only walls).

Answers "where do the 57 ms go?" for the flagship (128, 512) bucket by
timing jitted `lax.scan` chains of the full fused step and of its parts
(acoustic+vocoder fwd, discriminator fwd / fwd+bwd, STFT losses), so the
per-dispatch tunnel latency (CLAUDE.md: ~30 ms per blocking transfer)
never enters the numbers. Each part is timed as its own scan, and every
scan threads a real data dependency through its carry so XLA cannot
dead-code or CSE the work away across iterations.

Usage: python scripts/bench_gan_step.py [--config configs/flagship_tpu.yaml]
       [--steps 20] [--json out.json]

No reference counterpart (the reference never profiles its training
step); this is the rebuild's own roofline tooling, same spirit as
scripts/bench_vocoder.py.
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

from m2tts_tpu.data.dataset import DummyDataset, make_batches
from m2tts_tpu.training import losses as L
from m2tts_tpu.training.trainer_stage2 import Stage2Trainer
from m2tts_tpu.utils.config import load_config
from m2tts_tpu.utils.device import enable_persistent_compile_cache


def _bench(fn, carry, steps: int, warmup: int = 1, name: str = "") -> float:
    """Device-only per-step ms of `fn(carry) -> carry` via lax.scan."""

    @jax.jit
    def run(c):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, c, None, length=steps)
        return out

    t0 = time.perf_counter()
    for _ in range(warmup):
        out = run(carry)
        jax.block_until_ready(out)
    print(f"[bench_gan_step] {name}: compiled+warm in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    out = run(carry)
    jax.block_until_ready(out)
    ms = round((time.perf_counter() - t0) * 1e3 / steps, 3)
    print(f"[bench_gan_step] {name}: {ms} ms/step", file=sys.stderr, flush=True)
    return ms


def _fold(tree, scalar):
    """Thread `scalar` into a tree leaf without changing its value
    (keeps a live data dependency across scan iterations)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    leaves[0] = leaves[0] + (scalar * 1e-30).astype(leaves[0].dtype)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/flagship_tpu.yaml")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--bucket", type=int, nargs=2, default=None,
                   help="text/frame bucket (default: middle config bucket)")
    p.add_argument("--json", default=None)
    args = p.parse_args()

    enable_persistent_compile_cache()
    cfg = load_config(args.config)
    if args.batch_size:
        cfg.set("training.batch_size", args.batch_size)
    cfg.set("training.max_steps", 1)
    cfg.set("training.validate_quality", False)
    cfg.set("paths.output_dir", "/tmp/bench_gan/out")
    cfg.set("paths.checkpoint_dir", "/tmp/bench_gan/ckpt")
    cfg.set("paths.log_dir", "/tmp/bench_gan/logs")

    buckets = [tuple(b) for b in cfg.get("data.buckets")]
    bucket = tuple(args.bucket) if args.bucket else buckets[len(buckets) // 2]
    bs = int(cfg.get("training.batch_size", 32))

    ds = DummyDataset(size=max(bs, 16), mel_dim=int(cfg.get("data.n_mels", 80)),
                      max_text_length=bucket[0], max_mel_length=bucket[1],
                      seed=0, keep_audio=True)
    trainer = Stage2Trainer(cfg, dataset=ds)
    raw = next(iter(make_batches(
        ds, bs, buckets=[bucket], seed=0, shuffle=False,
        audio_samples=bucket[1] * trainer.hop)))
    dbatch = trainer._prepare(raw)
    rng = jax.random.PRNGKey(0)
    g_params, d_params = trainer.g_state.params, trainer.d_state.params
    g_state, d_state = trainer.g_state, trainer.d_state
    results = {}

    # ---- full fused step (state-carried scan) ----
    def fused(carry):
        g, d = carry
        g2, d2, _ = trainer._gd_step_fn(g, d, dbatch, rng)
        return (g2, d2)

    results["fused_gd_step"] = _bench(fused, (g_state, d_state),
                                      steps=args.steps, name="fused_gd_step")

    # ---- D step / G step alone ----
    def d_only(d):
        d2, _ = trainer._d_step_fn(g_params, d, dbatch, rng)
        return d2

    results["d_step"] = _bench(d_only, d_state, steps=args.steps, name="d_only")

    def g_only(g):
        g2, _ = trainer._g_step_fn(g, d_params, dbatch, rng)
        return g2

    results["g_step"] = _bench(g_only, g_state, steps=args.steps, name="g_only")

    # ---- forward pieces ----
    def acoustic_fwd(g):
        _, _, audio_pred = trainer._acoustic_and_segment(
            g, trainer._upcast(dbatch), rng, True)
        return _fold(g, jnp.sum(audio_pred))

    results["acoustic_plus_vocoder_fwd"] = _bench(acoustic_fwd, g_params, steps=args.steps, name="acoustic_fwd")

    audio_seg = jnp.asarray(dbatch["audio_seg"], jnp.float32)

    def _carry_eps(tree):
        """A carry-derived ~0 scalar: added to a part's INPUT it defeats
        XLA's loop-invariant code motion (folding only the OUTPUT into
        the carry defeats DCE but still lets the whole computation hoist
        out of the scan, reporting ~total/steps)."""
        return jax.tree_util.tree_leaves(tree)[0].ravel()[0] * 1e-30

    # the same bf16-under-training.bf16 compute policy the fused step
    # being decomposed actually runs (raw f32 applies would overstate
    # the discriminator's share)
    def disc_fwd(d):
        seg = audio_seg + _carry_eps(d)
        logits, _ = trainer._disc_apply(d, seg)
        return _fold(d, sum(jnp.sum(x) for x in logits))

    results["discriminator_fwd"] = _bench(disc_fwd, d_params, steps=args.steps, name="disc_fwd")

    def disc_fwd_bwd(d):
        def loss(dp):
            seg = audio_seg + _carry_eps(dp)
            logits, _ = trainer._disc_apply(dp, seg)
            return sum(jnp.mean(x ** 2) for x in logits)
        _, grads = jax.value_and_grad(loss)(d)
        return grads

    results["discriminator_fwd_bwd"] = _bench(disc_fwd_bwd, d_params, steps=args.steps, name="disc_fwd_bwd")

    noise = audio_seg + 0.01

    def stft_losses(d):
        pred = noise + _carry_eps(d)  # carry-dependent input: not hoistable
        l1 = L.multi_resolution_stft_loss(pred, audio_seg)
        l2 = L.perceptual_loss(pred, audio_seg, n_mels=trainer.n_mels)
        return _fold(d, l1 + l2)

    results["stft_plus_perceptual_loss"] = _bench(stft_losses, d_params, steps=args.steps, name="stft_losses")

    def stft_losses_bwd(d):
        def loss(pred):
            l1 = L.multi_resolution_stft_loss(pred, audio_seg)
            l2 = L.perceptual_loss(pred, audio_seg, n_mels=trainer.n_mels)
            return l1 + l2
        pred = noise + _carry_eps(d)
        _, g = jax.value_and_grad(loss)(pred)
        return _fold(d, jnp.sum(g))

    results["stft_plus_perceptual_fwd_bwd"] = _bench(
        stft_losses_bwd, d_params, steps=args.steps, name="stft_losses_bwd")

    def generator_fwd_bwd(g):
        def loss(gp):
            _, _, audio_pred = trainer._acoustic_and_segment(
                gp, trainer._upcast(dbatch), rng, True)
            return jnp.sum(audio_pred ** 2)
        _, grads = jax.value_and_grad(loss)(g)
        return grads

    results["acoustic_plus_vocoder_fwd_bwd"] = _bench(
        generator_fwd_bwd, g_params, steps=args.steps, name="generator_fwd_bwd")

    results["batch_size"] = bs
    results["bucket"] = list(bucket)
    results["seg_samples"] = trainer.seg_frames * trainer.upsample
    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    trainer.close()


if __name__ == "__main__":
    main()
