"""Core neural blocks (Flax linen), channel-last, fixed-shape, fusion-friendly.

Functional rebuild of the reference building blocks (reference
src/models/components.py): sinusoidal PE, fused-QKV self-attention,
pre-norm transformer layer, conv blocks, lightweight residual blocks, and
the variance predictor. Differences by design:

- channel-last ``[B, T, C]`` layouts throughout (TPU/XLA-friendly; the
  reference transposes to ``[B, C, T]`` for every conv),
- ConvBlock normalization defaults to LayerNorm — the reference's
  BatchNorm1d (components.py:160) couples samples across the batch, which
  is hostile to fixed-shape padded batches and data-parallel meshes; a
  ``norm='batch'`` compat mode (inference-style, running stats as affine
  constants) is kept so reference checkpoints convert exactly,
- dropout layers are deterministic unless a ``dropout`` RNG is provided,
- optional rematerialization (``jax.checkpoint``) replaces the reference's
  always-on torch gradient checkpointing (components.py:126).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import Array


# Reference weight-init table (reference src/models/components.py:274-286,
# applied recursively by TextEncoder/MelDecoder/SimpleVocoder via
# ``self.apply(initialize_weights)``): xavier-uniform for Linear kernels,
# kaiming-normal for Conv1d kernels, zeros for biases, ones/zeros for
# LayerNorm (the flax default). Used as kernel_init defaults model-wide —
# including the duration predictor, which the reference leaves on torch
# defaults only because its classes never call initialize_weights.
# Embeddings keep torch nn.Embedding's N(0, 1) (the table doesn't touch
# them, and the ×√d input scale assumes unit-variance embeddings).
dense_init = nn.initializers.xavier_uniform()
# full (untruncated) normal: torch kaiming_normal_; jax he_normal truncates
conv_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
embed_init = nn.initializers.normal(1.0)


def sinusoidal_position_encoding(max_len: int, dim: int,
                                 dtype=jnp.float32) -> Array:
    """Standard transformer PE table [max_len, dim].

    pe[p, 2i] = sin(p / 10000^(2i/d)), pe[p, 2i+1] = cos(...), matching
    reference src/models/components.py:15-39.
    """
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                       * -(math.log(10000.0) / dim))
    angles = position * div_term[None, :]
    pe = jnp.zeros((max_len, dim), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles[:, : dim // 2]))
    return pe.astype(dtype)


def padding_mask(lengths: Array, max_length: int) -> Array:
    """lengths [B] → bool mask [B, max_length], True on valid positions."""
    return jnp.arange(max_length)[None, :] < lengths[:, None]


class MultiHeadSelfAttention(nn.Module):
    """Fused-QKV self-attention with additive -1e9 key masking.

    Matches reference src/models/components.py:42-90: single QKV projection
    (no bias), features laid out as (3, heads, head_dim); post-softmax
    dropout; output projection with bias.
    """

    hidden_dim: int
    num_heads: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        B, S, _ = x.shape
        nh = self.num_heads
        hd = self.hidden_dim // nh

        qkv = nn.Dense(3 * self.hidden_dim, use_bias=False,
                       kernel_init=dense_init, name="qkv")(x)
        qkv = qkv.reshape(B, S, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, S, nh, hd]

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        if mask is not None:
            # key padding mask [B, S] -> [B, 1, 1, S]
            scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)

        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, S, self.hidden_dim)
        return nn.Dense(self.hidden_dim, kernel_init=dense_init, name="out")(out)


class FeedForward(nn.Module):
    """2-layer ReLU MLP with interior dropout (reference components.py:93-103)."""

    hidden_dim: int
    ffn_dim: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        h = nn.Dense(self.ffn_dim, kernel_init=dense_init, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.hidden_dim, kernel_init=dense_init, name="fc2")(h)


class TransformerEncoderLayer(nn.Module):
    """Pre-norm block: x + drop(attn(ln(x))); x + drop(ffn(ln(x)))."""

    hidden_dim: int
    num_heads: int
    ffn_dim: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        attn_out = MultiHeadSelfAttention(
            self.hidden_dim, self.num_heads, self.dropout_rate, name="attn"
        )(nn.LayerNorm(name="norm1")(x), mask, deterministic)
        x = x + nn.Dropout(self.dropout_rate)(attn_out, deterministic=deterministic)

        ffn_out = FeedForward(
            self.hidden_dim, self.ffn_dim, self.dropout_rate, name="ffn"
        )(nn.LayerNorm(name="norm2")(x), deterministic)
        return x + nn.Dropout(self.dropout_rate)(ffn_out, deterministic=deterministic)


class Conv1d(nn.Module):
    """1D conv on [B, T, C] with PyTorch-style symmetric padding k//2.

    For odd kernels at stride 1 this equals SAME padding; kept explicit so
    converted reference weights reproduce outputs exactly.
    """

    features: int
    kernel_size: int = 3
    dilation: int = 1
    groups: int = 1
    stride: int = 1
    use_bias: bool = True
    spectral_norm: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.spectral_norm:
            # identical param paths ("conv/kernel", "conv/bias")
            return SNConv(self.features, self.kernel_size,
                          stride=self.stride, dilation=self.dilation,
                          groups=self.groups, use_bias=self.use_bias,
                          name="conv")(x)
        pad = (self.kernel_size - 1) * self.dilation // 2
        return nn.Conv(
            self.features, (self.kernel_size,), strides=(self.stride,),
            padding=((pad, pad),), kernel_dilation=(self.dilation,),
            feature_group_count=self.groups, use_bias=self.use_bias,
            kernel_init=conv_init, name="conv",
        )(x)


class ConvTranspose1d(nn.Module):
    """Transposed 1D conv matching torch ConvTranspose1d(k, s, p) semantics.

    Implemented as zero-insertion + conv with flipped kernel and padding
    (k-1-p) per side, i.e. the exact gradient-of-conv formulation. With the
    vocoder's (k=2r, s=r, p=r//2) this maps L frames to exactly L*r for
    EVEN r (odd r emits L*r+1; Vocoder rejects odd rates at construction).
    Kernel parameter layout is torch's (in, out, k) so reference weights
    copy over without reshaping (reference src/models/tts_model.py:255-263).
    """

    in_features: int
    out_features: int
    kernel_size: int
    stride: int
    padding: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.out_features, self.kernel_size),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,))
        pad = self.kernel_size - 1 - self.padding
        out = jax.lax.conv_transpose(
            x,
            kernel,
            strides=(self.stride,),
            padding=((pad, pad),),
            # transpose_kernel=True expects the kernel spec of the forward
            # conv being transposed; torch's (in, out, k) tconv layout is
            # that conv's (O, I, spatial) — hence "OIH".
            dimension_numbers=("NHC", "OIH", "NHC"),
            transpose_kernel=True,
        )
        return out + bias


class ConvBlock(nn.Module):
    """Conv1d + norm + ReLU + dropout (reference components.py:143-174).

    ``norm='layer'`` (default) is the TPU-native choice; ``norm='batch'``
    reproduces converted reference checkpoints by folding running stats
    into a per-channel affine (BatchNorm in eval mode).
    """

    features: int
    kernel_size: int = 3
    dropout_rate: float = 0.1
    norm: str = "layer"

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        h = Conv1d(self.features, self.kernel_size, name="conv1d")(x)
        if self.norm == "layer":
            h = nn.LayerNorm(name="norm")(h)
        elif self.norm == "batch":
            mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
            var = self.param("bn_var", nn.initializers.ones, (self.features,))
            scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
            bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        elif self.norm != "none":
            raise ValueError(f"Unknown norm {self.norm!r}")
        h = nn.relu(h)
        return nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)


class VariancePredictor(nn.Module):
    """2× ConvBlock + 1×1 projection → per-position scalar.

    Reference components.py:203-223; returns [B, T] (channel squeezed).
    """

    hidden_dim: int
    kernel_size: int = 3
    dropout_rate: float = 0.1
    norm: str = "layer"

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        h = ConvBlock(self.hidden_dim, self.kernel_size, self.dropout_rate,
                      self.norm, name="block1")(x, deterministic)
        h = ConvBlock(self.hidden_dim, self.kernel_size, self.dropout_rate,
                      self.norm, name="block2")(h, deterministic)
        out = Conv1d(1, kernel_size=1, name="proj")(h)
        return out[..., 0]


class LightweightResBlock(nn.Module):
    """conv(k, d) → leaky_relu(0.1) → conv(k, 1) + residual.

    Reference components.py:177-200 (note the reference applies leaky_relu
    to conv1's output, then conv2, then adds the residual with no final
    activation — kept exactly).
    """

    channels: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = Conv1d(self.channels, self.kernel_size, dilation=self.dilation,
                   name="conv1")(x)
        h = nn.leaky_relu(h, negative_slope=0.1)
        h = Conv1d(self.channels, self.kernel_size, name="conv2")(h)
        return x + h


# ---------------------------------------------------------------------------
# Spectral normalization + functional gradient clipping + weight init table
# (reference components.py:244-286; apply_spectral_norm and GradientClipping
# exist there but are never invoked — here they are actually usable)
# ---------------------------------------------------------------------------

def spectral_normalize(w: Array, n_iter: int = 3) -> Array:
    """Divide ``w`` by its largest singular value (treating all leading
    axes as the input dim), estimated by power iteration from a
    deterministic start — stateless, so it stays jit-pure inside a
    compiled train step (no mutable power-iteration buffers)."""
    mat = w.reshape(-1, w.shape[-1])
    v = jnp.full((mat.shape[1],), 1.0 / math.sqrt(mat.shape[1]), mat.dtype)
    for _ in range(n_iter):
        u = mat @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
        v = mat.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
    sigma = u @ (mat @ v)
    return w / (sigma + 1e-12)


class SNConv(nn.Module):
    """nn.Conv-compatible 1D conv whose kernel is spectrally normalized at
    every application. Param paths match nn.Conv ("kernel"/"bias") so the
    flag can be toggled without re-templating checkpoints."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    sn_iters: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k_shape = (self.kernel_size, x.shape[-1] // self.groups, self.features)
        kernel = self.param("kernel", conv_init, k_shape)
        kernel = spectral_normalize(kernel, self.sn_iters)
        pad = (self.kernel_size - 1) * self.dilation // 2
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(self.stride,),
            padding=[(pad, pad)], rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def clip_by_global_norm(grads, max_norm: float):
    """Functional global-norm gradient clipping → (clipped, global_norm).

    The trainers use the optax equivalent inside their optimizer chains;
    this standalone form serves custom loops (reference GradientClipping,
    components.py:251-259, which the reference trainers also bypassed).
    """
    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-12))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), gnorm
