"""M2TTS: FastSpeech-style non-autoregressive TTS model (Flax, TPU-first).

Architecture parity with the reference M2TTSModel (reference
src/models/tts_model.py:300-458): text encoder → duration predictor →
length regulator → mel decoder → HiFi-GAN-lite vocoder. TPU-native
redesigns:

- every stage is fixed-shape and jit-compilable end to end; the length
  regulator is the cumsum/gather op in m2tts_tpu/ops/length_regulator.py
  instead of a Python loop (reference tts_model.py:146-178),
- ``duration_scale`` is a traced scalar multiply before rounding, so one
  compiled graph serves all speeds (the reference re-runs the regulator
  and decoder in Python, tts_model.py:426-432),
- channel-last layouts; the vocoder consumes mels as [B, T, C] directly,
- the vocoder's upsample factor is configurable: the reference ships
  [4,4,2,2] = 64×, which mismatches its hop length of 256 (4× too short;
  reference tts_model.py:244 vs src/utils/audio.py:49). We keep 64× as
  the compat default and provide [8,8,2,2] = 256× ("fixed") configs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn
from jax import Array

from m2tts_tpu.models.components import (
    Conv1d,
    ConvTranspose1d,
    LightweightResBlock,
    TransformerEncoderLayer,
    VariancePredictor,
    dense_init,
    embed_init,
    padding_mask,
    sinusoidal_position_encoding,
)
from m2tts_tpu.ops.length_regulator import regulate_lengths


class TextEncoder(nn.Module):
    """Embedding (×√d) + sinusoidal PE + N pre-norm transformer layers + LN.

    Reference src/models/tts_model.py:19-89.
    """

    vocab_size: int = 256
    hidden_dim: int = 64
    num_layers: int = 2
    num_heads: int = 2
    dropout_rate: float = 0.1
    max_seq_len: int = 1000
    remat: bool = False

    @nn.compact
    def __call__(self, phoneme_ids: Array, lengths: Optional[Array] = None,
                 deterministic: bool = True) -> Tuple[Array, Optional[Array]]:
        B, S = phoneme_ids.shape
        mask = padding_mask(lengths, S) if lengths is not None else None

        x = nn.Embed(self.vocab_size, self.hidden_dim,
                     embedding_init=embed_init, name="embedding")(phoneme_ids)
        x = x * jnp.asarray(self.hidden_dim ** 0.5, x.dtype)
        pe = sinusoidal_position_encoding(self.max_seq_len, self.hidden_dim, x.dtype)
        x = x + pe[None, :S]
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)

        layer_cls = TransformerEncoderLayer
        if self.remat:
            layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(3,))
        for i in range(self.num_layers):
            x = layer_cls(self.hidden_dim, self.num_heads, self.hidden_dim * 2,
                          self.dropout_rate, name=f"layer{i}")(x, mask, deterministic)
        return nn.LayerNorm(name="norm")(x), mask


class DurationPredictor(nn.Module):
    """VariancePredictor + softplus → positive per-phoneme durations.

    Reference src/models/tts_model.py:92-117.
    """

    hidden_dim: int = 64
    kernel_size: int = 3
    dropout_rate: float = 0.1
    norm: str = "layer"

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        raw = VariancePredictor(self.hidden_dim, self.kernel_size,
                                self.dropout_rate, self.norm,
                                name="predictor")(x, deterministic)
        return nn.softplus(raw)


class MelDecoder(nn.Module):
    """N transformer layers + LN + linear projection to mel channels.

    Reference src/models/tts_model.py:181-228 (no VAE despite the README's
    naming — the reference has no latent sampling either).
    """

    hidden_dim: int = 64
    mel_channels: int = 64
    num_layers: int = 2
    num_heads: int = 2
    dropout_rate: float = 0.1
    remat: bool = False

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        layer_cls = TransformerEncoderLayer
        if self.remat:
            layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(3,))
        for i in range(self.num_layers):
            x = layer_cls(self.hidden_dim, self.num_heads, self.hidden_dim * 2,
                          self.dropout_rate, name=f"layer{i}")(x, mask, deterministic)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(self.mel_channels, kernel_init=dense_init,
                        name="mel_proj")(x)


class Vocoder(nn.Module):
    """HiFi-GAN-lite: conv-in → (tconv ↑r, ½ channels → resblock)× → tanh out.

    Reference SimpleVocoder (src/models/tts_model.py:231-297). Consumes
    [B, T, mel] channel-last; emits [B, T*prod(rates), 1].
    """

    mel_channels: int = 64
    hidden_channels: int = 128
    kernel_size: int = 3
    upsample_rates: Sequence[int] = (4, 4, 2, 2)

    @nn.compact
    def __call__(self, mel: Array) -> Array:
        for r in self.upsample_rates:
            if r % 2:
                # (k=2r, s=r, p=r//2) maps L frames to exactly L*r ONLY for
                # even r; an odd rate emits L*r+1 samples, silently
                # desyncing from total_upsample*T everywhere downstream
                # (serving trim boundaries, the mm/Pallas kernel packings).
                # Fail at construction instead.
                raise ValueError(
                    f"vocoder upsample_rates must be even, got {r} in "
                    f"{tuple(self.upsample_rates)}")
        x = Conv1d(self.hidden_channels, self.kernel_size, name="input_conv")(mel)
        ch = self.hidden_channels
        for i, rate in enumerate(self.upsample_rates):
            x = ConvTranspose1d(ch, ch // 2, kernel_size=rate * 2, stride=rate,
                                padding=rate // 2, name=f"upsample{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
            ch //= 2
            x = LightweightResBlock(ch, self.kernel_size, name=f"resblock{i}")(x)
        return jnp.tanh(Conv1d(1, self.kernel_size, name="output_conv")(x))

    @property
    def total_upsample(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


class M2TTS(nn.Module):
    """Full text→mel→waveform model.

    ``__call__`` runs the acoustic path (training skips the vocoder, as the
    reference does at tts_model.py:388); ``synthesize`` runs the full
    inference path including duration scaling in a single traced graph.
    """

    vocab_size: int = 256
    hidden_dim: int = 64
    mel_channels: int = 64
    text_encoder_layers: int = 2
    decoder_layers: int = 2
    num_heads: int = 2
    dropout_rate: float = 0.1
    vocoder_channels: int = 128
    upsample_rates: Sequence[int] = (4, 4, 2, 2)
    duration_norm: str = "layer"
    max_seq_len: int = 1000
    remat: bool = False
    # The reference decoder attends over padding frames unmasked (reference
    # tts_model.py:211-228 passes no mask); keep that default for parity and
    # let new configs opt into masked decoder attention.
    mask_decoder: bool = False

    def setup(self):
        self.text_encoder = TextEncoder(
            self.vocab_size, self.hidden_dim, self.text_encoder_layers,
            self.num_heads, self.dropout_rate, self.max_seq_len, self.remat)
        self.duration_predictor = DurationPredictor(
            self.hidden_dim, 3, self.dropout_rate, self.duration_norm)
        self.decoder = MelDecoder(
            self.hidden_dim, self.mel_channels, self.decoder_layers,
            self.num_heads, self.dropout_rate, self.remat)
        self.vocoder = Vocoder(self.mel_channels, self.vocoder_channels,
                               3, tuple(self.upsample_rates))

    def __call__(self, phoneme_ids: Array,
                 phoneme_lengths: Optional[Array] = None,
                 target_durations: Optional[Array] = None,
                 max_frames: int = 1000,
                 deterministic: bool = True,
                 run_vocoder: bool = False) -> Dict[str, Any]:
        enc, mask = self.text_encoder(phoneme_ids, phoneme_lengths, deterministic)
        duration_pred = self.duration_predictor(enc, deterministic)
        if target_durations is not None:
            # caller-provided targets pass through untouched (exact
            # training-path parity with the reference regulator)
            durations = target_durations
        elif mask is not None:
            # predicted durations: padded phonemes must contribute zero
            # frames, else the text bucket a request lands in changes its
            # output length (the reference's Python regulator loops
            # padding too, tts_model.py:146-178 — a bug our fixed-shape
            # buckets can't tolerate; documented in PARITY.md)
            durations = duration_pred * mask.astype(duration_pred.dtype)
        else:
            durations = duration_pred
        regulated, frame_mask, total_frames = regulate_lengths(enc, durations, max_frames)
        mel = self.decoder(regulated, frame_mask if self.mask_decoder else None,
                           deterministic)
        audio = self.vocoder(mel) if run_vocoder else None
        return {
            "encoder_output": enc,
            "duration_pred": duration_pred,
            "regulated_output": regulated,
            "mel_output": mel,
            "audio_output": audio,
            "padding_mask": mask,
            "frame_mask": frame_mask,
            "total_frames": total_frames,
        }

    def acoustic(self, phoneme_ids: Array,
                 phoneme_lengths: Optional[Array] = None,
                 duration_scale: Array = 1.0,
                 max_frames: int = 1000) -> Dict[str, Any]:
        """Inference acoustic path: text → masked mel (no vocoder).

        A single compiled graph regardless of duration_scale (the reference
        re-runs regulator+decoder in Python when scale != 1,
        tts_model.py:426-432; scaling before regulation is equivalent).
        """
        enc, mask = self.text_encoder(phoneme_ids, phoneme_lengths, True)
        duration_pred = self.duration_predictor(enc, True)
        scaled = duration_pred * jnp.asarray(duration_scale, duration_pred.dtype)
        if mask is not None:  # padded phonemes contribute zero frames
            scaled = scaled * mask.astype(scaled.dtype)
        regulated, frame_mask, total_frames = regulate_lengths(enc, scaled, max_frames)
        mel = self.decoder(regulated, frame_mask if self.mask_decoder else None, True)
        # zero mel beyond each utterance's total frames so bucket padding
        # cannot bleed through the vocoder's receptive field into the tail
        # of the real audio (serving trims audio to total_frames*upsample)
        mel = mel * frame_mask[..., None].astype(mel.dtype)
        return {
            "mel_output": mel,
            "duration_pred": duration_pred,
            "frame_mask": frame_mask,
            "total_frames": total_frames,
        }

    def synthesize(self, phoneme_ids: Array,
                   phoneme_lengths: Optional[Array] = None,
                   duration_scale: Array = 1.0,
                   max_frames: int = 1000) -> Dict[str, Any]:
        """Full inference: acoustic path + vocoder."""
        out = self.acoustic(phoneme_ids, phoneme_lengths, duration_scale,
                            max_frames)
        mel, total_frames = out["mel_output"], out["total_frames"]
        duration_pred, frame_mask = out["duration_pred"], out["frame_mask"]
        audio = self.vocoder(mel)
        up = 1
        for r in self.upsample_rates:
            up *= r
        return {
            "mel_output": mel,
            "audio_output": audio,
            "duration_pred": duration_pred,
            "frame_mask": frame_mask,
            "total_frames": total_frames,
            "audio_samples": total_frames * up,
        }


def build_model(model_cfg) -> M2TTS:
    """Construct M2TTS from the 5-group YAML schema's ``model`` section.

    Accepts both our configs and the reference's key layout (reference
    configs/stage1_poc.yaml: model.text_encoder.*, model.decoder.*,
    model.vocoder.*).
    """
    g = model_cfg.get if hasattr(model_cfg, "get") else model_cfg.__getitem__
    return M2TTS(
        vocab_size=g("text_encoder.vocab_size", 256),
        hidden_dim=g("text_encoder.hidden_dim", 64),
        text_encoder_layers=g("text_encoder.num_layers", 2),
        num_heads=g("text_encoder.num_heads", 2),
        dropout_rate=g("text_encoder.dropout", 0.1),
        mel_channels=g("decoder.mel_channels", 64),
        decoder_layers=g("decoder.num_layers", 2),
        vocoder_channels=g("vocoder.hidden_channels", 128),
        upsample_rates=tuple(g("vocoder.upsample_rates", (4, 4, 2, 2))),
        duration_norm=g("duration_predictor.norm", "layer"),
        max_seq_len=g("text_encoder.max_seq_len", 1000),
        remat=bool(g("remat", False)),
    )


def init_params(model: M2TTS, rng, *args, device=None, **kwargs):
    """Initialize model params on the host CPU, then place on ``device``.

    Flax init runs its many small op dispatches eagerly; over a tunneled
    TPU backend each dispatch pays a network round trip (measured: ~90 s
    for the flagship config vs <1 s on host). Initializing under the CPU
    backend and shipping the finished pytree in one transfer removes that
    startup cost entirely. ``device`` defaults to the process default
    (first TPU chip when present).
    """
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        # Host CPU backend unavailable (jax_platforms restricted to the
        # accelerator plugin): fall back to initializing on the default
        # device. Correct, but over a tunneled TPU this pays one network
        # round trip per init op (~90 s flagship) — keep cpu reachable.
        import logging

        logging.getLogger(__name__).warning(
            "host cpu backend unavailable; initializing params on %s "
            "(slow over a tunneled backend)", jax.devices()[0])
        return model.init(rng, *args, **kwargs)
    # operands must live on host too, else ops follow their placement
    rng, args = jax.device_put((rng, args), cpu)
    # CPU-side init compiles must not enter the persistent cache: CPU
    # AOT entries fail their own feature check on every load (see
    # utils/device.no_persistent_cache) — caching them is wasted disk
    # plus cpu_aot_loader error spam in every later process
    from m2tts_tpu.utils.device import no_persistent_cache

    with no_persistent_cache(), jax.default_device(cpu):
        params = model.init(rng, *args, **kwargs)
    if device is None:
        default = jax.devices()[0]
        if default.platform == "cpu":
            return params
        device = default
    return jax.device_put(params, device)


def count_parameters(params) -> int:
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def model_size_report(params) -> Dict[str, Any]:
    """Per-component parameter counts (reference tts_model.py:440-458)."""
    import jax

    top = params["params"] if "params" in params else params
    components = {}
    for name, sub in top.items():
        n = sum(x.size for x in jax.tree_util.tree_leaves(sub))
        components[name] = {"total": n, "size_mb": n * 4 / (1024 * 1024)}
    total = sum(c["total"] for c in components.values())
    return {
        "total_params": total,
        "total_size_mb": total * 4 / (1024 * 1024),
        "components": components,
    }
