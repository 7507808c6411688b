"""Custom-VJP weight-gradient lowerings for grouped 1-D convolutions.

Why this exists (docs/DESIGN.md §2b): the stage-2 GAN step's floor is
the discriminator's grouped-conv WEIGHT gradients (d_step ~16.5 ms at
the (128,512)×32 bucket after batching, bf16 and phase-packing). XLA's
native wgrad lowering contracts per group, and the per-group output
tile (cin_g × cout_g, e.g. 16×4 after packing) is a rounding error
against the 128×128 MXU — utilization, not FLOPs, is the bound.

Two alternative lowerings, each EXACT (same math, fp reassociation
only), wrapped as a ``jax.custom_vjp`` around the stride-1 conv the
phase-packed discriminator path uses (``_packed_strided_conv`` packs
strided convs to stride-1 first):

- ``pergroup``: per-tap ``dot_general`` with groups as a batch dim —
  [B,T,g,ci] × [B,T,g,co] → [g,ci,co]. Same tiny per-group tiles as
  XLA, but one dot per tap instead of a conv lowering.
- ``dense``: per-tap DENSE [Cin, Cout] cross-correlation (one
  MXU-shaped matmul with K = B·T) followed by block-diagonal
  extraction. Computes g× more FLOPs than needed, but at dense-MXU
  rates — the bet is that (FLOPs × g) / dense-rate beats
  FLOPs / starved-rate. For g=256: 550 GFLOP dense vs 23 GFLOP at
  ~0.4% utilization.

The input gradient keeps XLA's native lowering in all variants (it was
already dense enough after phase-packing). ``wgrad_variant('xla')``
returns the plain conv untouched.

Measured verdict: scripts/bench_disc_wgrad.py; ledger in
docs/DESIGN.md §2b.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

VARIANTS = ("xla", "pergroup", "dense")


def _conv_s1(x: Array, w: Array, pad: Tuple[int, int], groups: int) -> Array:
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=(pad,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups)


def _wgrad_pergroup(xp: Array, dy: Array, kp: int, groups: int) -> Array:
    """dW[k, ci, cout] via per-tap grouped dot_general."""
    B, _, Cin = xp.shape
    T = dy.shape[1]
    Cout = dy.shape[2]
    ci, co = Cin // groups, Cout // groups
    dyg = dy.reshape(B, T, groups, co)
    taps = []
    for k in range(kp):
        xg = xp[:, k:k + T].reshape(B, T, groups, ci)
        # contract (b, t), batch (g) → [g, ci, co]
        d = jax.lax.dot_general(
            xg, dyg, (((0, 1), (0, 1)), ((2,), (2,))),
            preferred_element_type=jnp.float32)
        taps.append(d.transpose(1, 0, 2).reshape(ci, Cout))
    return jnp.stack(taps, axis=0)


def _wgrad_dense(xp: Array, dy: Array, kp: int, groups: int) -> Array:
    """dW[k, ci, cout] via per-tap dense [Cin, Cout] matmul + block-diag
    extraction (g× surplus FLOPs at dense-MXU rates)."""
    B, _, Cin = xp.shape
    T = dy.shape[1]
    Cout = dy.shape[2]
    ci, co = Cin // groups, Cout // groups
    gi = jnp.arange(groups)
    taps = []
    for k in range(kp):
        d = jax.lax.dot_general(
            xp[:, k:k + T], dy, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)  # [Cin, Cout] dense
        blk = d.reshape(groups, ci, groups, co)[gi, :, gi]  # [g, ci, co]
        taps.append(blk.transpose(1, 0, 2).reshape(ci, Cout))
    return jnp.stack(taps, axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv1d_s1_wgrad(x: Array, w: Array, pad: Tuple[int, int], groups: int,
                    variant: str) -> Array:
    """Stride-1 grouped conv whose backward computes the WEIGHT gradient
    with the chosen lowering ('pergroup' | 'dense'); the input gradient
    stays XLA-native. Forward is bit-identical to the plain conv."""
    return _conv_s1(x, w, pad, groups)


def _fwd(x, w, pad, groups, variant):
    return _conv_s1(x, w, pad, groups), (x, w)


def _bwd(pad, groups, variant, res, dy):
    x, w = res
    kp = w.shape[0]
    # input gradient: XLA's native transposed lowering (dense enough)
    _, vjp_x = jax.vjp(lambda xx: _conv_s1(xx, w, pad, groups), x)
    dx, = vjp_x(dy)
    xp = jnp.pad(x, ((0, 0), pad, (0, 0)))
    f32 = (xp.astype(jnp.float32) if xp.dtype == jnp.float32
           else xp)  # keep bf16 inputs bf16: the MXU contracts bf16→f32
    wg = (_wgrad_dense if variant == "dense" else _wgrad_pergroup)(
        f32, dy, kp, groups)
    return dx, wg.astype(w.dtype)


conv1d_s1_wgrad.defvjp(_fwd, _bwd)


def conv1d_s1(x: Array, w: Array, pad: Tuple[int, int], groups: int,
              wgrad: str = "xla") -> Array:
    """Entry point: stride-1 grouped conv with a selectable weight-
    gradient lowering. 'xla' = untouched native conv."""
    if wgrad not in VARIANTS:
        raise ValueError(f"unknown wgrad variant {wgrad!r}")
    if wgrad == "xla":
        return _conv_s1(x, w, pad, groups)
    return conv1d_s1_wgrad(x, w, pad, groups, wgrad)
