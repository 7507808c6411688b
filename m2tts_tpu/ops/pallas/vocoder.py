"""Fused Pallas TPU kernel: the entire vocoder stack per time-tile in VMEM.

Motivation (BASELINE.json: "the HiFi-GAN-style vocoder's transposed-conv
upsampling and multi-receptive-field residual stacks become Pallas
kernels"): XLA executes the vocoder as a chain of small-channel 1D convs
with an HBM round-trip between stages; measured utilization on v5e is <1%
of peak. This kernel runs ALL stages — input conv, every (tconv →
leaky → resblock) pair, output conv, tanh — on one VMEM-resident tile of
mel frames, using the dense matmul reformulation from
m2tts_tpu/ops/vocoder_mm.py (time on the MXU's M axis, packed sub-pixel
tconv weights). Intermediate activations never touch HBM; weights
(~1-3 MB) stay in VMEM across the grid.

Tiling: grid = (batch, T/tile). Each program DMAs a window of
``tile + 2*halo`` frames from HBM (window start clamped into [0, T-win]
so at utterance edges the window boundary coincides with the true mel
boundary — the in-kernel zero-padded shifts then reproduce the full
graph's SAME-padding exactly, the same trick as the streaming vocoder),
computes the full stack on the window, and writes the center
``tile*U`` samples. Halo of 4 frames covers the end-to-end receptive
field (~2.5 mel frames).

Equivalence to the XLA vocoder module is asserted in
tests/test_pallas_vocoder.py (interpret mode on CPU; compiled on TPU).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 32
DEFAULT_HALO = 4


def _flatten_packed(packed: Dict) -> List[np.ndarray]:
    """Packed weights → flat list in the kernel's argument order. tconv
    biases are pre-tiled to [r*Cout] so they add before the phase merge."""
    flat = [packed["input_conv"]["w"], packed["input_conv"]["b"]]
    for st in packed["stages"]:
        t = st["tconv"]
        flat += [t["w"], np.tile(t["b"], t["rate"]),
                 st["res1"]["w"], st["res1"]["b"],
                 st["res2"]["w"], st["res2"]["b"]]
    flat += [packed["output_conv"]["w"], packed["output_conv"]["b"]]
    return [np.asarray(a, np.float32) for a in flat]


def _shifted3(x: Array) -> Array:
    """[N, C] → [N, 3C] = [x_{t-1}; x_t; x_{t+1}] with zero boundaries."""
    z = jnp.zeros((1, x.shape[1]), x.dtype)
    up = jnp.concatenate([z, x[:-1]], axis=0)
    dn = jnp.concatenate([x[1:], z], axis=0)
    return jnp.concatenate([up, x, dn], axis=1)


def _mm(x3: Array, w, b) -> Array:
    return jnp.dot(x3, w[:], preferred_element_type=jnp.float32) + b[:]


def build_fused_vocoder(packed: Dict, rates: Sequence[int],
                        tile: int = DEFAULT_TILE, halo: int = DEFAULT_HALO,
                        interpret: bool = False):
    """Returns fn(mel [B, T, C]) → audio [B, T*U]; T % tile == 0, T ≥ win."""
    rates = tuple(rates)
    U = 1
    for r in rates:
        U *= r
    win = tile + 2 * halo
    flat_weights = _flatten_packed(packed)
    n_w = len(flat_weights)

    def kernel(mel_hbm, *refs):
        w_refs = refs[:n_w]
        out_ref = refs[n_w]
        win_buf, sem = refs[n_w + 1], refs[n_w + 2]

        b = pl.program_id(0)
        q = pl.program_id(1)
        T = mel_hbm.shape[1]
        start = jnp.clip(q * tile - halo, 0, T - win)
        dma = pltpu.make_async_copy(
            mel_hbm.at[b, pl.ds(start, win), :], win_buf, sem)
        dma.start()
        dma.wait()

        x = win_buf[:]
        wi = 0

        def take():
            nonlocal wi
            pair = (w_refs[wi], w_refs[wi + 1])
            wi += 2
            return pair

        w, bias = take()
        x = _mm(_shifted3(x), w, bias)  # input conv
        for r in rates:
            tw, tb = take()
            y = _mm(_shifted3(x), tw, tb)          # [N, r*Cout]
            n, rc = y.shape
            y = y.reshape(n * r, rc // r)          # phase merge
            y = jnp.where(y >= 0, y, 0.1 * y)      # leaky_relu(0.1)
            r1w, r1b = take()
            h = _mm(_shifted3(y), r1w, r1b)
            h = jnp.where(h >= 0, h, 0.1 * h)
            r2w, r2b = take()
            x = y + _mm(_shifted3(h), r2w, r2b)
        ow, ob = take()
        audio = jnp.tanh(_mm(_shifted3(x), ow, ob))[:, 0]  # [win*U]

        off = (q * tile - start) * U
        out_ref[0, :] = jax.lax.dynamic_slice(audio, (off,), (tile * U,))

    def fn(mel: Array) -> Array:
        B, T, C = mel.shape
        if T % tile or T < win:
            raise ValueError(f"T={T} must be a multiple of tile={tile} and >= {win}")
        grid = (B, T // tile)
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_w)]
        out_spec = pl.BlockSpec((1, tile * U), lambda b, q: (b, q),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, T * U), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((win, C), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(mel, *[jnp.asarray(w) for w in flat_weights])

    return fn
