#!/usr/bin/env python
"""Shootout: grouped-conv weight-gradient lowerings for the stage-2
discriminator (VERDICT r4 task 9; ops/grouped_conv.py has the design
notes). Measures fwd+bwd wall of the phase-packed multiscale apply at
the GAN-step shapes (batch 32 × 8192-sample segments, bf16 policy) for
each wgrad variant, device-only via a lax.scan so per-dispatch tunnel
latency cannot pollute the comparison. One JSON line per variant.

Usage: python scripts/bench_disc_wgrad.py [--batch 32] [--samples 8192]

Harness caveat (r5, docs/disc_wgrad_shootout.json): the 'xla' row
times near zero — its carry-coupling epsilon (1e-20) folds away under
the bf16 input cast, XLA hoists the then-loop-invariant body, and the
tunnel memoizes what remains. The custom-vjp rows resist the hoist and
are honest upper bounds; the native baseline at identical shapes is
scripts/bench_disc_packed.py's 10.6 ms fwd+bwd. Verdict recorded in
docs/DESIGN.md §2b: both variants lose; rejection stands on their own
measured walls.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--samples", type=int, default=8192)
    ap.add_argument("--scan", type=int, default=20)
    ap.add_argument("--bf16", action="store_true", default=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from m2tts_tpu.models.discriminator import (MultiScaleDiscriminator,
                                                packed_multiscale_apply)
    from m2tts_tpu.ops.grouped_conv import VARIANTS
    from m2tts_tpu.utils.device import enable_persistent_compile_cache
    from m2tts_tpu.utils.tree import cast_params_bf16

    enable_persistent_compile_cache()
    disc = MultiScaleDiscriminator()
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(jax.random.PRNGKey(1),
                              (args.batch, args.samples))
    params = disc.init(rng, audio[:1])["params"]

    def loss(p, a, wgrad):
        pc = cast_params_bf16({"params": p})["params"] if args.bf16 else p
        ac = a.astype(jnp.bfloat16) if args.bf16 else a
        logits, feats = packed_multiscale_apply(pc, ac, wgrad=wgrad)
        return (sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in logits)
                + sum(jnp.sum(jnp.abs(f.astype(jnp.float32)))
                      for fs in feats for f in fs))

    results = {}
    for variant in VARIANTS:
        @jax.jit
        def scan_fwd_bwd(p, a, seed):
            # ``seed`` varies per timed call: the tunneled backend
            # memoizes byte-identical executions (returns the cached
            # result in ~5 µs), so every wall measured on it must be a
            # distinct computation
            a = a + seed * 1e-20

            def body(c, _):
                # the carry feeds the input (no hoisting) AND absorbs a
                # reduction of EVERY gradient leaf (no dead-code
                # elimination of the backward — the first harness lost
                # the whole backward to DCE and timed 0.004 ms)
                val, grads = jax.value_and_grad(
                    lambda pp: loss(pp, a + c * 1e-20, variant))(p)
                gsum = sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(grads))
                return val + gsum * 1e-12, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                length=args.scan)
            return c

        try:
            out = scan_fwd_bwd(params, audio, jnp.float32(0.0))
            jax.block_until_ready(out)  # compile
            best = None
            for i in range(3):
                t0 = time.perf_counter()
                out = scan_fwd_bwd(params, audio, jnp.float32(i + 1.0))
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / args.scan * 1000.0
                best = dt if best is None else min(best, dt)
            assert np.isfinite(float(out))
            results[variant] = round(best, 3)
            print(json.dumps({"variant": variant, "fwd_bwd_ms": results[variant],
                              "batch": args.batch, "samples": args.samples}))
        except Exception as e:
            print(json.dumps({"variant": variant, "error": repr(e)[:200]}))
    if "xla" in results:
        for v, ms in results.items():
            if v != "xla":
                print(json.dumps({"speedup_vs_xla": round(results['xla'] / ms, 3),
                                  "variant": v}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
