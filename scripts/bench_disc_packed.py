"""Shootout: native grouped-conv discriminator vs the phase-packed
lowering (models/discriminator.py::packed_multiscale_apply), fwd and
fwd+bwd, device-only walls via lax.scan (same harness discipline as
scripts/bench_gan_step.py — a carry-derived ε keeps XLA from hoisting
work out of the timing loop).

The strided grouped convs' GRADIENTS dominate the stage-2 GAN step
(docs/DESIGN.md §2b); this measures whether re-lowering them as
stride-1 phase-packed convs (dense per-group contractions, plain-conv
gradients) beats XLA's native strided grouped lowering at the training
shapes ([B, 8192] segments, bf16 policy).

Usage: python scripts/bench_disc_packed.py [--batch 32] [--steps 20]
       [--json out.json]
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

from m2tts_tpu.models.discriminator import (
    MultiScaleDiscriminator,
    packed_multiscale_apply,
)
from m2tts_tpu.utils.device import enable_persistent_compile_cache


def _bench(fn, carry, steps: int, name: str) -> float:
    @jax.jit
    def run(c):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, c, None, length=steps)
        return out

    t0 = time.perf_counter()
    out = run(carry)
    jax.block_until_ready(out)
    print(f"[disc_packed] {name}: compiled+warm {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    out = run(carry)
    jax.block_until_ready(out)
    ms = round((time.perf_counter() - t0) * 1e3 / steps, 3)
    print(f"[disc_packed] {name}: {ms} ms/step", file=sys.stderr, flush=True)
    return ms


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--segment", type=int, default=8192)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--json", type=str, default=None)
    args = p.parse_args(argv)

    enable_persistent_compile_cache()
    disc = MultiScaleDiscriminator()
    audio0 = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, args.segment, 1)), jnp.float32)
    params = disc.init(jax.random.PRNGKey(0), audio0[:1])["params"]

    cast = ((lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), t)) if args.bf16
        else (lambda t: t))

    def native_apply(p, x):
        return disc.apply({"params": cast(p)},
                          x.astype(jnp.bfloat16) if args.bf16 else x)

    def packed_apply(p, x):
        return packed_multiscale_apply(
            cast(p), x.astype(jnp.bfloat16) if args.bf16 else x)

    def loss_of(apply_fn):
        def loss(p, x):
            logits, feats = apply_fn(p, x)
            return (sum(jnp.mean(l.astype(jnp.float32) ** 2)
                        for l in logits)
                    + sum(jnp.mean(jnp.abs(f.astype(jnp.float32)))
                          for fs in feats for f in fs))
        return loss

    results = {}
    for name, apply_fn in (("native", native_apply),
                           ("packed", packed_apply)):
        loss = loss_of(apply_fn)

        # fwd: carry is a scalar folded into the input so every scan
        # iteration does real new work
        def fwd_real(c, _loss=loss):
            eps, x = c
            v = _loss(params, x * (1.0 + eps * 1e-9))
            return (v, x)

        results[f"{name}_fwd_ms"] = _bench(
            lambda c, f=fwd_real: f(c), (jnp.float32(0.0), audio0),
            args.steps, f"{name} fwd")

        # fwd+bwd wrt params AND input (both gradient chains the GAN
        # step needs: D-loss chain wrt params, G-loss chain wrt input)
        def fb(c, _loss=loss):
            eps, x = c
            g_p, g_x = jax.grad(_loss, argnums=(0, 1))(
                params, x * (1.0 + eps * 1e-9))
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(g_p))
            return (s * 1e-12 + jnp.sum(g_x) * 1e-12, x)

        results[f"{name}_fwdbwd_ms"] = _bench(
            lambda c, f=fb: f(c), (jnp.float32(0.0), audio0),
            args.steps, f"{name} fwd+bwd")

        # input-gradient only (the G-loss chain in isolation)
        def fbx(c, _loss=loss):
            eps, x = c
            g_x = jax.grad(_loss, argnums=1)(params,
                                             x * (1.0 + eps * 1e-9))
            return (jnp.sum(g_x) * 1e-12, x)

        results[f"{name}_fwd_xgrad_ms"] = _bench(
            lambda c, f=fbx: f(c), (jnp.float32(0.0), audio0),
            args.steps, f"{name} fwd+xgrad")

    results["speedup_fwd"] = round(
        results["native_fwd_ms"] / results["packed_fwd_ms"], 3)
    results["speedup_fwdbwd"] = round(
        results["native_fwdbwd_ms"] / results["packed_fwdbwd_ms"], 3)
    results["batch"] = args.batch
    results["segment"] = args.segment
    results["bf16"] = args.bf16
    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
