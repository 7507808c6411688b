"""Convert reference PyTorch checkpoints into m2tts_tpu Flax params.

Enables (a) migrating trained reference checkpoints onto TPU, and (b) the
numerical-parity test suite (tests/test_parity.py) that asserts our jitted
forward pass reproduces the reference model's mel output on identical
inputs.

Key layout notes:
- torch Linear weight (out, in)        → flax Dense kernel (in, out)
- torch Conv1d weight (out, in/g, k)   → flax Conv kernel (k, in/g, out)
- torch ConvTranspose1d (in, out, k)   → our ConvTranspose1d kernel (in, out, k)
- torch BatchNorm1d running stats      → ConvBlock(norm='batch') affine fold

State-dict naming follows reference src/models/tts_model.py /
components.py; converted models must be built with
``duration_norm='batch'``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor → float32 numpy without importing torch at module load."""
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _dense(sd: Mapping, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _conv1d(sd: Mapping, prefix: str) -> Dict[str, Dict[str, np.ndarray]]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return {"conv": out}


def _conv_transpose1d(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _transformer_layer(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {
        "attn": {
            "qkv": _dense(sd, f"{prefix}.self_attn.qkv", bias=False),
            "out": _dense(sd, f"{prefix}.self_attn.out_proj"),
        },
        "ffn": {
            "fc1": _dense(sd, f"{prefix}.ffn.linear1"),
            "fc2": _dense(sd, f"{prefix}.ffn.linear2"),
        },
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
    }


def _conv_block_batchnorm(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """Reference ConvBlock (conv + BatchNorm1d) → ConvBlock(norm='batch')."""
    return {
        "conv1d": _conv1d(sd, f"{prefix}.conv"),
        "bn_scale": _np(sd[f"{prefix}.norm.weight"]),
        "bn_bias": _np(sd[f"{prefix}.norm.bias"]),
        "bn_mean": _np(sd[f"{prefix}.norm.running_mean"]),
        "bn_var": _np(sd[f"{prefix}.norm.running_var"]),
    }


def _resblock(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {"conv1": _conv1d(sd, f"{prefix}.conv1"),
            "conv2": _conv1d(sd, f"{prefix}.conv2")}


def convert_reference_state_dict(sd: Mapping, text_encoder_layers: int = 2,
                                 decoder_layers: int = 2,
                                 num_upsamples: int = 4) -> Dict[str, Any]:
    """Reference M2TTSModel state_dict → flax params (for M2TTS)."""
    text_encoder: Dict[str, Any] = {
        "embedding": {"embedding": _np(sd["text_encoder.embedding.weight"])},
        "norm": _layernorm(sd, "text_encoder.norm"),
    }
    for i in range(text_encoder_layers):
        text_encoder[f"layer{i}"] = _transformer_layer(sd, f"text_encoder.layers.{i}")

    duration_predictor = {
        "predictor": {
            "block1": _conv_block_batchnorm(sd, "duration_predictor.predictor.conv_layers.0"),
            "block2": _conv_block_batchnorm(sd, "duration_predictor.predictor.conv_layers.1"),
            "proj": _conv1d(sd, "duration_predictor.predictor.projection"),
        }
    }

    decoder: Dict[str, Any] = {
        "norm": _layernorm(sd, "decoder.norm"),
        "mel_proj": _dense(sd, "decoder.mel_projection"),
    }
    for i in range(decoder_layers):
        decoder[f"layer{i}"] = _transformer_layer(sd, f"decoder.layers.{i}")

    vocoder: Dict[str, Any] = {
        "input_conv": _conv1d(sd, "vocoder.input_conv"),
        "output_conv": _conv1d(sd, "vocoder.output_conv"),
    }
    for i in range(num_upsamples):
        vocoder[f"upsample{i}"] = _conv_transpose1d(sd, f"vocoder.upsamples.{i}")
        vocoder[f"resblock{i}"] = _resblock(sd, f"vocoder.resblocks.{i}")

    return {
        "text_encoder": text_encoder,
        "duration_predictor": duration_predictor,
        "decoder": decoder,
        "vocoder": vocoder,
    }


def convert_reference_checkpoint(path: str):
    """Load a reference torch checkpoint file → (flax params, config dict).

    The reference embeds its OmegaConf config in every checkpoint
    (reference training/train.py:240-250); we use it to size the layer
    loops and return it for model reconstruction.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt
    cfg = ckpt.get("config", {}) if isinstance(ckpt, dict) else {}

    def _cfg_get(path_: str, default):
        node = cfg
        for part in path_.split("."):
            try:
                node = node[part]
            except Exception:
                return default
        return node

    n_enc = int(_cfg_get("model.text_encoder.num_layers", 2))
    n_dec = int(_cfg_get("model.decoder.num_layers", 2))
    # size the vocoder loop from the embedded config too — a checkpoint
    # with e.g. 5 upsample stages would otherwise be silently converted
    # as 4 and fail (or mis-run) far from the real cause
    rates = _cfg_get("model.vocoder.upsample_rates", None)
    n_ups = len(rates) if rates is not None else 4
    params = convert_reference_state_dict(sd, n_enc, n_dec,
                                          num_upsamples=n_ups)
    return params, cfg
