"""Matmul-form vocoder: the HiFi-GAN-lite stack as dense GEMMs.

The vocoder's ops (k=3 convs, k=2r/s=r transposed convs) have tiny channel
counts, which XLA's generic conv lowering handles poorly on TPU. Both ops
have exact dense-matmul reformulations that put the long time axis on the
MXU's M dimension:

- conv k3  →  concat(x_{t-1}, x_t, x_{t+1}) [T, 3C] @ W [3C, C']
- tconv(k=2r, s=r, p=r/2)  →  sub-pixel conv: every output sample
  o = q*r + j draws on exactly two inputs (q-1/q or q/q+1 depending on
  j vs r/2), so out[q] = concat(x_{q-1}, x_q, x_{q+1}) @ W' [3C, r*C']
  followed by a (T, r, C') → (T*r, C') merge. W' is the torch/our
  (in, out, k) kernel scattered by m = (q-i)*r + j + r/2 (zeros where the
  tap index falls outside [0, 2r)).

``pack_vocoder_weights`` converts flax Vocoder params into this form once;
``vocoder_mm_forward`` runs the whole stack as plain-XLA GEMMs. The Pallas
kernel (ops/pallas/vocoder.py) consumes the same packed weights and fuses
all stages per time tile in VMEM. Equivalence to the reference-parity
Vocoder module is asserted in tests/test_vocoder_mm.py.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from jax import Array


def pack_conv3(kernel, bias) -> Dict[str, Array]:
    """flax Conv kernel [3, Cin, Cout] → rows [x_{t-1}; x_t; x_{t+1}]."""
    k, cin, cout = kernel.shape
    assert k == 3
    return {"w": jnp.asarray(kernel, jnp.float32).reshape(3 * cin, cout),
            "b": jnp.asarray(bias, jnp.float32)}


def pack_tconv(kernel, bias, rate: int) -> Dict[str, Array]:
    """(in, out, 2r) tconv kernel → [3*Cin, r*Cout] sub-pixel matrix.

    jnp ops with static indices throughout, so packing can run INSIDE a
    jitted graph with the model params as arguments — packing at trace
    time would bake multi-MB weight constants into every compiled
    serving bucket (and constant-heavy modules break some remote-compile
    setups for Pallas kernels).
    """
    cin, cout, k = kernel.shape
    assert k == 2 * rate
    if rate % 2:
        # the sub-pixel mapping (and the flax ConvTranspose1d it mirrors)
        # is exact-L*r only for even rates; see Vocoder.__call__
        raise ValueError(f"pack_tconv requires an even rate, got {rate}")
    half = rate // 2
    kernel = jnp.asarray(kernel, jnp.float32)
    W = jnp.zeros((3 * cin, rate * cout), jnp.float32)
    for j in range(rate):
        for block, delta in ((0, -1), (1, 0), (2, 1)):
            m = -delta * rate + j + half
            if 0 <= m < k:
                W = W.at[block * cin: (block + 1) * cin,
                         j * cout: (j + 1) * cout].set(kernel[:, :, m])
    return {"w": W, "b": jnp.asarray(bias, jnp.float32), "rate": rate,
            "cout": cout}


def pack_vocoder_weights(vocoder_params: Dict, rates: Sequence[int]
                         ) -> Dict[str, Dict]:
    """flax Vocoder param subtree → packed matmul-form weights.

    Works on concrete arrays (eager, tests) and on tracers (inside jit).
    """
    p = vocoder_params

    def conv(tree):
        return pack_conv3(tree["conv"]["kernel"], tree["conv"]["bias"])

    packed: Dict[str, Dict] = {
        "input_conv": conv(p["input_conv"]),
        "output_conv": conv(p["output_conv"]),
        "stages": [],
    }
    for i, r in enumerate(rates):
        up = p[f"upsample{i}"]
        res = p[f"resblock{i}"]
        packed["stages"].append({
            "tconv": pack_tconv(up["kernel"], up["bias"], r),
            "res1": conv(res["conv1"]),
            "res2": conv(res["conv2"]),
        })
    return packed


def _neighbors(x: Array) -> Array:
    """[..., T, C] → [..., T, 3C] with zero boundary (SAME padding)."""
    zeros = jnp.zeros_like(x[..., :1, :])
    up = jnp.concatenate([zeros, x[..., :-1, :]], axis=-2)   # x_{t-1}
    dn = jnp.concatenate([x[..., 1:, :], zeros], axis=-2)    # x_{t+1}
    return jnp.concatenate([up, x, dn], axis=-1)


def conv3_mm(x: Array, w, b) -> Array:
    return jnp.dot(_neighbors(x), jnp.asarray(w),
                   preferred_element_type=jnp.float32) + jnp.asarray(b)


def tconv_mm(x: Array, packed) -> Array:
    """[B, T, Cin] → [B, T*r, Cout]."""
    B, T, _ = x.shape
    r, cout = packed["rate"], packed["cout"]
    y = jnp.dot(_neighbors(x), jnp.asarray(packed["w"]),
                preferred_element_type=jnp.float32)
    y = y.reshape(B, T * r, cout) + jnp.asarray(packed["b"])
    return y


def vocoder_mm_forward(mel: Array, packed: Dict) -> Array:
    """[B, T, mel] → [B, T*prod(rates)] waveform (tanh output)."""
    x = conv3_mm(mel, **packed["input_conv"])
    for stage in packed["stages"]:
        x = tconv_mm(x, stage["tconv"])
        x = jnp.where(x >= 0, x, 0.1 * x)  # leaky_relu(0.1)
        h = conv3_mm(x, **stage["res1"])
        h = jnp.where(h >= 0, h, 0.1 * h)
        x = x + conv3_mm(h, **stage["res2"])
    audio = jnp.tanh(conv3_mm(x, **packed["output_conv"]))
    return audio[..., 0]
