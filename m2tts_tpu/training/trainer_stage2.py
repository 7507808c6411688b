"""Stage-2 GAN trainer: generator + multi-scale discriminator, one compiled
step per branch, real-waveform targets.

Rebuild of the reference M2TTSTrainerStage2 (reference
training/train_stage2.py:53-580) with three structural fixes:

1. **Real audio targets.** The reference reconstructs "target audio" every
   step with per-sample Griffin-Lim on the host CPU
   (train_stage2.py:261-267) — its dominant bottleneck — even though the
   dataset loaded the true waveform and threw it away. We train the
   vocoder on random fixed-length segments of the ground-truth waveform
   (HiFi-GAN practice), sliced on the host, with the matching mel-frame
   window sliced inside the compiled graph.
2. **Consistent rates.** The reference vocoder upsamples 64× while the mel
   hop is 256 (4× mismatch; SURVEY.md §2.1). When the compat 64× vocoder
   is configured, ground-truth segments are decimated host-side to the
   vocoder's effective rate so audio-domain losses compare like for like;
   with the fixed 256× vocoder no resampling happens.
3. **Both nets update every step** by default (one compiled D-step + one
   compiled G-step). ``training.alternate_gd: true`` restores the
   reference's every-other-step alternation (train_stage2.py:270).

Loss surface matches CombinedTTSLoss's generator mode and weights
(reference losses.py:208-343): mel 1.0, duration 0.1, spectral 1.0,
perceptual 0.5, adversarial 0.25, feature-matching 2.0; LSGAN for D.
"""

from __future__ import annotations

import functools
import logging
import math
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from m2tts_tpu.data.dataset import data_iterator, make_batches
from m2tts_tpu.models import build_model, init_params
from m2tts_tpu.models.discriminator import MultiScaleDiscriminator
from m2tts_tpu.parallel.mesh import batch_sharding, make_mesh
from m2tts_tpu.parallel.partition import shard_tree
from m2tts_tpu.training import losses as L
from m2tts_tpu.training.losses import EarlyStopping
from m2tts_tpu.training.trainer import (_read_best_score, _write_best_score,
                                        build_dataset, make_lr_schedule)
from m2tts_tpu.utils.checkpoint import CheckpointManager
from m2tts_tpu.utils.config import Config
from m2tts_tpu.utils.device import MemoryTracker, ThermalMonitor
from m2tts_tpu.utils.metrics_logger import MetricsLogger
from m2tts_tpu.utils.profiling import StepProfiler
from m2tts_tpu.utils.tree import cast_params_bf16, tree_finite

logger = logging.getLogger(__name__)


def _segment_audio(audio: np.ndarray, mel_lengths: np.ndarray,
                   seg_frames: int, hop: int, upsample: int,
                   rng: np.random.Generator
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: pick a random mel-frame window per sample and return the
    aligned ground-truth waveform at the vocoder's effective rate.

    Returns (offsets [B] int32, targets [B, seg_frames*upsample] float32).
    """
    B = audio.shape[0]
    offsets = np.zeros((B,), np.int32)
    targets = np.zeros((B, seg_frames * upsample), np.float32)
    need_resample = upsample != hop
    if need_resample:
        from scipy.signal import resample_poly
        from math import gcd

        g = gcd(upsample, hop)
        up, down = upsample // g, hop // g
    for i in range(B):
        max_off = max(int(mel_lengths[i]) - seg_frames, 0)
        off = int(rng.integers(0, max_off + 1))
        offsets[i] = off
        seg = audio[i, off * hop: (off + seg_frames) * hop]
        if len(seg) < seg_frames * hop:
            seg = np.pad(seg, (0, seg_frames * hop - len(seg)))
        if need_resample:
            seg = resample_poly(seg, up, down).astype(np.float32)
        targets[i, : len(seg)] = seg[: seg_frames * upsample]
    return offsets, targets


class Stage2Trainer:
    """GAN training over the full text→waveform stack."""

    def __init__(self, config: Config, dataset=None, mesh=None):
        self.config = config
        tcfg = config.get("training", Config())
        self.max_steps = int(tcfg.get("max_steps", 50000))
        self.batch_size = int(tcfg.get("batch_size", 32))
        self.bf16 = bool(tcfg.get("bf16", True))
        self.alternate_gd = bool(tcfg.get("alternate_gd", False))
        self.log_every = int(tcfg.get("log_every", 100))
        self.save_every = int(tcfg.get("save_every", 2000))
        self.validate_every = int(tcfg.get("validate_every", 1000))
        self.seed = int(tcfg.get("seed", 1234))
        td = tcfg.get("transfer_dtype", None)
        self.transfer_dtype = jnp.bfloat16 if td in ("bfloat16", "bf16") else (
            jnp.float16 if td in ("float16", "fp16") else None)
        self.hop = int(config.get("data.hop_length", 256))
        # Device-resident data cache (mirrors stage-1): the whole bucketed
        # dataset — including FULL waveforms at the vocoder's effective
        # rate — staged in HBM once; per-step segment offsets are drawn
        # and sliced INSIDE the compiled step, so steps pay zero H2D.
        self.device_data_cache = bool(tcfg.get("device_data_cache", False))
        self.device_cache_max_gb = float(
            tcfg.get("device_data_cache_max_gb", 4.0))
        self.weights = dict(
            mel_weight=float(tcfg.get("mel_loss_weight", 1.0)),
            duration_weight=float(tcfg.get("duration_loss_weight", 0.1)),
            adversarial_weight=float(tcfg.get("adversarial_loss_weight", 0.25)),
            feature_matching_weight=float(tcfg.get("feature_matching_weight", 2.0)),
            spectral_weight=float(tcfg.get("spectral_loss_weight", 1.0)),
            perceptual_weight=float(tcfg.get("perceptual_loss_weight", 0.5)),
            envelope_weight=float(tcfg.get("envelope_loss_weight", 0.0)),
        )
        # STFT phase-L1 weight inside the multi-resolution spectral loss.
        # 0.1 is reference parity (reference losses.py:13-56); the phase
        # angle of near-silent bins is noise, so this term injects
        # gradient noise in quiet regions — set 0 to drop it.
        self.stft_phase_weight = float(tcfg.get("stft_phase_weight", 0.1))
        # Adversarial warmup: stage-2 inherits an UNTRAINED vocoder from
        # stage-1 (stage-1's loss is mel+duration only), so for the first
        # few hundred steps the "fake" audio is noise and the adversarial/
        # feature-matching gradients push the vocoder toward whatever
        # fools an equally-raw discriminator instead of toward speech.
        # Ramp the adv+FM weights linearly 0→1 over this many steps so
        # the reconstruction losses (spectral/perceptual/mel) shape the
        # vocoder first — standard GAN-vocoder practice the reference
        # lacks (its stage 2 applies full adversarial weight from step 0,
        # reference training/train_stage2.py:248-270; both r03 drives
        # showed STOI degrading under that schedule, VERDICT r3 weak #1).
        self.adv_warmup = int(tcfg.get("adversarial_warmup_steps", 0))
        # d_loss level below which the adversarial weight scales down
        # proportionally (0 = off). See _g_step_fn's guard comment.
        self.adaptive_adv_floor = float(
            tcfg.get("adaptive_adv_dloss_floor", 0.0))
        # d_loss level below which the DISCRIMINATOR's own update slows
        # proportionally (0 = off). See _d_step_fn's guard comment.
        self.adaptive_d_lr_floor = float(
            tcfg.get("adaptive_d_lr_floor", 0.0))
        # Exponential moving average of the generator weights (standard
        # GAN-vocoder practice — HiFi-GAN/BigVGAN evaluate and ship the
        # EMA, not the raw adversarially-jittered weights; the reference
        # has no EMA). 0 = off. When on, validation/best-checkpoint/
        # early-stop all score the EMA params, and checkpoints carry
        # them under 'generator_ema'.
        self.ema_decay = float(tcfg.get("ema_decay", 0.0))

        self.mesh = mesh or make_mesh(
            int(config.get("system.mesh.data", -1)),
            model=int(config.get("system.mesh.model", 1)))
        self.model = build_model(config.get("model", Config()))
        self.discriminator = MultiScaleDiscriminator(
            spectral_norm=bool(tcfg.get("discriminator_spectral_norm", False)))
        # 'packed' re-lowers the strided grouped convs as phase-packed
        # stride-1 convs (models/discriminator.py) — numerically exact,
        # measured 1.26x on the gradient chains that dominate the GAN
        # step (scripts/bench_disc_packed.py: fwd+bwd 10.6 vs 13.4 ms,
        # fwd+xgrad 8.6 vs 9.7 at batch 32 x 8192 bf16 on v5e; it LOSES
        # pure forward 5.4 vs 4.2, but every disc apply in the fused
        # step sits inside a gradient). 'auto' = packed on TPU; spectral
        # norm keeps the native apply (its param tree is SN-wrapped).
        disc_lowering = str(tcfg.get("disc_lowering", "auto"))
        if disc_lowering not in ("auto", "native", "packed"):
            raise ValueError(f"Unknown disc_lowering {disc_lowering!r}")
        if disc_lowering == "auto":
            disc_lowering = ("packed" if jax.default_backend() == "tpu"
                             else "native")
        self.disc_lowering = ("native" if self.discriminator.spectral_norm
                              else disc_lowering)
        self.upsample = 1
        for r in self.model.upsample_rates:
            self.upsample *= r
        seg_samples = int(tcfg.get("audio_segment_len", 8192))
        self.seg_frames = max(seg_samples // self.upsample, 8)
        self.n_mels = int(config.get("data.n_mels",
                                     self.model.mel_channels))

        self.dataset = dataset if dataset is not None else build_dataset(
            config.get("data", Config()), keep_audio=True)
        self.buckets = [tuple(b) for b in config.get(
            "data.buckets", [[64, 256], [128, 512], [256, 1000]])]

        # init models
        rng = jax.random.PRNGKey(self.seed)
        g_vars = init_params(self.model, rng, jnp.zeros((1, 8), jnp.int32),
                             max_frames=16, run_vocoder=True)
        d_vars = init_params(self.discriminator, rng,
                             jnp.zeros((1, self.seg_frames * self.upsample, 1)))

        def tx(cfg):
            t = optax.chain(
                optax.clip_by_global_norm(float(cfg.get("gradient_clip_norm", 1.0))),
                optax.adamw(make_lr_schedule(cfg),
                            b1=float(cfg.get("adam_b1", 0.8)),
                            b2=float(cfg.get("adam_b2", 0.99)),
                            weight_decay=float(cfg.get("weight_decay", 1e-6))))
            accum = int(cfg.get("gradient_accumulation_steps", 1))
            if accum > 1:  # real accumulation, matching stage-1's optax.MultiSteps
                t = optax.MultiSteps(t, every_k_schedule=accum)
            return t

        # warm-start the generator from a stage-1 (or earlier stage-2)
        # checkpoint: the standard two-stage workflow. Beyond-reference:
        # the reference stage-2 can only resume its own checkpoints
        # (training/train_stage2.py:419-440), never start from stage-1.
        init_from = tcfg.get("init_generator_from")
        if init_from:
            from m2tts_tpu.utils.checkpoint import load_for_inference

            variables, _, from_step = load_for_inference(init_from)
            g_vars = {"params": variables["params"]}
            logger.info("Generator warm-started from %s (step %d)",
                        init_from, from_step)

        self.g_state = shard_tree(train_state.TrainState.create(
            apply_fn=self.model.apply, params=g_vars["params"], tx=tx(tcfg)),
            self.mesh)
        self.d_state = shard_tree(train_state.TrainState.create(
            apply_fn=self.discriminator.apply, params=d_vars["params"],
            tx=tx(tcfg)), self.mesh)
        # EMA shadow of the generator (seeded from the warm-started
        # params; tracked on device, updated by one tiny jitted map per
        # step — 1.4M-param tree, negligible next to the GAN step)
        self.ema_params = (shard_tree(jax.tree_util.tree_map(
            jnp.asarray, g_vars["params"]), self.mesh)
            if self.ema_decay > 0 else None)
        self._ema_update = jax.jit(
            lambda ema, p: jax.tree_util.tree_map(
                lambda e, q: e * self.ema_decay
                + q.astype(e.dtype) * (1.0 - self.ema_decay), ema, p),
            donate_argnums=(0,))

        out_dir = Path(config.get("paths.output_dir", "outputs/stage2"))
        self.ckpt = CheckpointManager(
            config.get("paths.checkpoint_dir", out_dir / "checkpoints"),
            max_to_keep=int(tcfg.get("max_checkpoints", 10)))
        self.metrics = MetricsLogger(
            config.get("paths.log_dir", out_dir / "logs"),
            backend=config.get("system.log_metrics", "csv"),
            wandb_project=config.get("system.wandb_project"),
            run_name=config.get("system.run_name"))
        self.memory = MemoryTracker()
        self.thermal = ThermalMonitor()
        self.profiler = StepProfiler.from_config(config)
        self.early_stopping = EarlyStopping(
            patience=int(tcfg.get("patience", 10000)),
            min_delta=float(tcfg.get("min_delta", 0.001)))
        # best-validation checkpoint, pinned under <ckpt_dir>/best
        # (reference best_model.pt, train_stage2.py:405-408)
        self.best_val_score = float("inf")
        self._best_ckpt: Optional[CheckpointManager] = None

        self._d_step = jax.jit(self._d_step_fn, donate_argnums=(1,))
        self._g_step = jax.jit(self._g_step_fn, donate_argnums=(0,))
        # device-cache variants: draw segment offsets + slice the cached
        # full waveform inside the graph (same offsets in D and G steps —
        # both fold the same step rng)
        self._d_step_cached = jax.jit(
            lambda g_params, d_state, batch, rng: self._d_step_fn(
                g_params, d_state, self._slice_batch(batch, rng), rng),
            donate_argnums=(1,))
        self._g_step_cached = jax.jit(
            lambda g_state, d_params, batch, rng: self._g_step_fn(
                g_state, d_params, self._slice_batch(batch, rng), rng),
            donate_argnums=(0,))
        # fused D+G step (the default-mode hot path): ONE dispatch and one
        # XLA graph per GAN step instead of three host dispatches (rng
        # fold + D + G). On a tunneled 1-CPU host each dispatch is serial
        # host work; fusing also drops the second _slice_batch/_upcast.
        # The rng folds from d_state.step INSIDE the graph (d_state
        # updates every fused step, so it equals the loop step — and warm
        # start/restore never desyncs it), reproducing the unfused stream.
        self._gd_step = jax.jit(
            functools.partial(self._gd_step_fn, cached=False),
            donate_argnums=(0, 1))
        self._gd_step_cached = jax.jit(
            functools.partial(self._gd_step_fn, cached=True),
            donate_argnums=(0, 1))
        # validation forward (no donation — g_state stays live); cached
        # per bucket shape by jit. Eager dispatch here would pay one
        # tunnel round trip PER OP of the acoustic+vocoder+STFT chain.
        self._val_fwd = jax.jit(self._val_fwd_fn)
        self._host_rng = np.random.default_rng(self.seed + 2)
        self.base_rng = jax.random.PRNGKey(self.seed + 3)
        self.step = 0
        # OOM-recovery snapshots: both compiled steps donate their state,
        # so a failed dispatch can leave g_state/d_state buffers deleted.
        # Refreshed at every checkpoint save and at restore; stored with
        # the loop step so recovery rewinds params and counter together
        # (mirrors stage-1).
        self._oom_snapshot = self._snapshot()
        # GAN blow-up guard: adversarial training can go non-finite in one
        # step with healthy losses right before (observed on TPU: finite at
        # step 2200, NaN at 2250). Detection piggybacks on the log-interval
        # host sync (zero extra round trips); recovery rewinds to the
        # OOM snapshot. Limit counted per run.
        self._blowups = 0
        self._blowup_limit = int(tcfg.get("max_loss_blowups", 3))
        # quality validation (evaluator sweep + eval-text MOS) and periodic
        # sample generation, both reference behaviors (train_stage2.py)
        self.validate_quality = bool(tcfg.get("validate_quality", True))
        # Audio-domain gate term (VERDICT r3 missing #1): weight on
        # (1 - full-utterance teacher-forced STOI) added to the mel
        # composite. Both r03 drives improved the mel gate while STOI
        # regressed — a gate with no audio term cannot see that. 0
        # restores the r03 mel-only composite. The STOI/LSD pass runs
        # over `training.quality_utterances` full utterances through
        # acoustic+vocoder (evaluation/metrics.benchmark_audio_quality).
        self.gate_stoi_weight = float(tcfg.get("gate_stoi_weight", 4.0))
        self.quality_utterances = int(tcfg.get("quality_utterances", 16))
        self.generate_samples_every = int(config.get(
            "system.generate_samples_every", 0))
        self._sample_validator = None
        self._bm_cache: Dict = {}

    def _host_states_copy(self):
        return jax.device_get((self.g_state, self.d_state))

    def _eval_params(self):
        """Params that validation / the gate / best-checkpoints score:
        the EMA shadow when enabled, else the live generator."""
        return (self.ema_params if self.ema_params is not None
                else self.g_state.params)

    def _snapshot(self):
        """Host copy of everything a rewind must restore (g/d states, EMA,
        loop step)."""
        g, d = self._host_states_copy()
        ema = (jax.device_get(self.ema_params)
               if self.ema_params is not None else None)
        return (g, d, ema, self.step)

    def _restore_snapshot(self, snap) -> None:
        g, d, ema, step = snap
        self.g_state = shard_tree(g, self.mesh)
        self.d_state = shard_tree(d, self.mesh)
        if ema is not None:
            self.ema_params = shard_tree(ema, self.mesh)
        self.step = step

    def _recover_after_oom(self) -> None:
        snap_step = self._oom_snapshot[-1]
        leaves = jax.tree_util.tree_leaves(
            (self.g_state, self.d_state,
             () if self.ema_params is None else self.ema_params))
        if any(getattr(x, "is_deleted", lambda: False)() for x in leaves):
            logger.warning("Donated state invalidated by the failed step — "
                           "restoring snapshot (step %d)", snap_step)
            self._restore_snapshot(self._oom_snapshot)

    def _recover_after_blowup(self) -> None:
        """Rewind to the last finite snapshot after non-finite losses.

        The host data stream is NOT rewound and ``base_rng`` is refolded
        per recovery, so the replayed window sees different batches AND
        different dropout/segment noise — a fresh trajectory out of the
        blow-up rather than a deterministic replay into it. Raises after
        ``training.max_loss_blowups`` recoveries: a model that keeps
        exploding needs a config change (lower lr / tighter clip), not
        silent infinite rewinds."""
        self._blowups += 1
        self.base_rng = jax.random.fold_in(self.base_rng,
                                           0xB10 + self._blowups)
        snap_step = self._oom_snapshot[-1]
        blown_step = self.step
        # restore BEFORE the limit check: when the raise fires, train()'s
        # finally-save must persist the last finite snapshot, not the
        # exploded params
        self._restore_snapshot(self._oom_snapshot)
        if self._blowups > self._blowup_limit:
            raise RuntimeError(
                f"non-finite losses at step {blown_step} — "
                f"{self._blowups - 1} rewinds already spent; lower the "
                "learning rate or raise training.max_loss_blowups")
        logger.error(
            "Non-finite losses at step %d — rewinding to snapshot step %d "
            "(blow-up %d/%d)", blown_step, snap_step, self._blowups,
            self._blowup_limit)

    # -- shared forward pieces -------------------------------------------------
    def _cast(self, params):
        return cast_params_bf16(params) if self.bf16 else params

    def _acoustic_and_segment(self, g_params, batch, rng, deterministic):
        """Run text→mel, slice the target window, vocode the segment."""
        out = self.model.apply(
            {"params": self._cast(g_params)}, batch["phoneme_ids"],
            batch["text_lengths"], batch["durations"],
            max_frames=batch["mel"].shape[1], deterministic=deterministic,
            rngs=None if deterministic else {"dropout": rng})
        mel_pred = out["mel_output"]
        C = mel_pred.shape[-1]

        def slice_one(mel, off):
            return jax.lax.dynamic_slice(mel, (off, 0), (self.seg_frames, C))

        mel_seg = jax.vmap(slice_one)(mel_pred, batch["frame_offsets"])
        audio_pred = self.model.apply(
            {"params": self._cast(g_params)}, mel_seg,
            method=lambda mdl, m: mdl.vocoder(m))[..., 0]  # [B, S*U]
        return out, mel_pred.astype(jnp.float32), audio_pred.astype(jnp.float32)

    # -- discriminator step ------------------------------------------------------

    @staticmethod
    def _upcast(batch):
        """bf16/f16 transfer arrays -> f32 on device before loss math
        (STFT/FFT and L1 reductions run in f32 regardless of transfer
        dtype)."""
        return {k: (v.astype(jnp.float32)
                    if v.dtype in (jnp.bfloat16, jnp.float16) else v)
                for k, v in batch.items()}

    def _disc_apply(self, d_params, audio):
        """Discriminator apply under the training compute-dtype policy:
        bf16 params+input on the MXU when ``training.bf16`` (the grouped
        convs are the dominant step cost), logits/features upcast to f32
        so the LSGAN/feature-matching reductions never accumulate in
        bf16. Gradients flow through the casts (f32 grads out)."""
        if self.bf16:
            audio = audio.astype(jnp.bfloat16)
        if self.disc_lowering == "packed":
            from m2tts_tpu.models.discriminator import \
                packed_multiscale_apply

            logits, feats = packed_multiscale_apply(
                self._cast(d_params), audio,
                scales=self.discriminator.scales)
        else:
            logits, feats = self.discriminator.apply(
                {"params": self._cast(d_params)}, audio)
        return ([l.astype(jnp.float32) for l in logits],
                [[f.astype(jnp.float32) for f in fs] for fs in feats])

    def _val_fwd_fn(self, g_params, batch):
        """Teacher-forced validation forward: mel/spectral losses + raw
        predictions, in one traced graph (jitted as ``self._val_fwd``)."""
        batch = self._upcast(batch)
        rng = jax.random.PRNGKey(0)
        _, mel_pred, audio_pred = self._acoustic_and_segment(
            g_params, batch, rng, True)
        mel_loss = L.masked_mel_l1(mel_pred, batch["mel"],
                                   batch["mel_lengths"])
        spec_loss = L.multi_resolution_stft_loss(audio_pred,
                                                 batch["audio_seg"])
        return mel_loss, spec_loss, mel_pred, audio_pred

    def _d_step_fn(self, g_params, d_state, batch, rng):
        batch = self._upcast(batch)
        # dropout-ACTIVE generator forward with the same rng the G step
        # uses: the reference computes fake once per iteration in train
        # mode and feeds it to both losses (reference
        # training/train_stage2.py:248-257). Making this forward the same
        # expression as the G step's also lets XLA CSE part of the two
        # acoustic+vocoder forwards inside the fused _gd_step graph
        # (measured 40.85 -> 40.38 ms at the (128,512)x32 bucket; the
        # value of the change is the reference-faithful semantics).
        _, _, audio_pred = self._acoustic_and_segment(g_params, batch, rng,
                                                      False)
        audio_pred = jax.lax.stop_gradient(audio_pred)

        B = audio_pred.shape[0]

        def d_loss_fn(d_params):
            # One batched apply over [real; fake] instead of two: the
            # discriminator is strictly per-sample (convs over time, no
            # cross-batch ops), so this is exact — and it halves the
            # grouped-conv gradient calls, the dominant cost of the step
            # (scripts/bench_gan_step.py: disc fwd+bwd 22.2 ms of the
            # 58.4 ms fused step).
            logits, _ = self._disc_apply(
                d_params,
                jnp.concatenate([batch["audio_seg"], audio_pred], axis=0))
            real_logits = [l[:B] for l in logits]
            fake_logits = [l[B:] for l in logits]
            return L.lsgan_discriminator_loss(real_logits, fake_logits)

        d_loss, grads = jax.value_and_grad(d_loss_fn)(d_state.params)
        if self.adaptive_d_lr_floor > 0:
            # Throttle the WINNING discriminator (r05): once d_loss sits
            # far below the floor the game is already lost for G this
            # round — further D sharpening only deepens logit saturation
            # (the measured blow-up regime, EVIDENCE.md §2). Scale D's
            # UPDATE by clip(d_loss/floor, 0, 1) — the update, not the
            # gradient: Adam normalizes gradient scale away, so a grad
            # multiplier would be a no-op on the step size. Near-frozen
            # while saturated, full-speed the moment G catches up.
            # In-graph, stop-gradded, zero host syncs.
            import optax

            guard = jnp.clip(jax.lax.stop_gradient(d_loss)
                             / self.adaptive_d_lr_floor, 0.0, 1.0)
            updates, new_opt = d_state.tx.update(grads, d_state.opt_state,
                                                 d_state.params)
            updates = jax.tree_util.tree_map(lambda u: u * guard, updates)
            new_d = d_state.replace(
                step=d_state.step + 1,
                params=optax.apply_updates(d_state.params, updates),
                opt_state=new_opt)
            return new_d, {"discriminator_loss": d_loss}
        return d_state.apply_gradients(grads=grads), {"discriminator_loss": d_loss}

    # -- generator step -----------------------------------------------------------
    def _g_step_fn(self, g_state, d_params, batch, rng, d_loss=None):
        batch = self._upcast(batch)
        def g_loss_fn(g_params):
            out, mel_pred, audio_pred = self._acoustic_and_segment(
                g_params, batch, rng, False)
            losses = {
                "mel_loss": L.masked_mel_l1(mel_pred, batch["mel"],
                                            batch["mel_lengths"]),
                "duration_loss": L.duration_mse(
                    out["duration_pred"].astype(jnp.float32),
                    batch["durations"]),
                "spectral_loss": L.multi_resolution_stft_loss(
                    audio_pred, batch["audio_seg"],
                    phase_weight=self.stft_phase_weight),
                "perceptual_loss": L.perceptual_loss(
                    audio_pred, batch["audio_seg"],
                    # the vocoder's effective output rate, not the 22050
                    # default: with data.sample_rate=16000 or the 64x
                    # compat vocoder the Slaney filterbank would otherwise
                    # extend past Nyquist (validate()'s STOI already uses
                    # the effective rate)
                    sample_rate=self._effective_sample_rate(),
                    n_mels=self.n_mels),
            }
            if self.weights["envelope_weight"] > 0:
                # STOI-aligned band-envelope correlation (losses.py
                # envelope_correlation_loss — the r04 fix for STOI
                # degrading under the envelope-blind reference losses)
                losses["envelope_loss"] = L.envelope_correlation_loss(
                    audio_pred, batch["audio_seg"],
                    sample_rate=self._effective_sample_rate())
            # Fake and real halves as SEPARATE applies (exact — the
            # discriminator is per-sample): only the fake half needs the
            # backward (adv + FM gradients flow into audio_pred), while
            # the real half is pure data → its features are constants wrt
            # g_params and need FORWARD only. The r03 [fake; real]
            # concat-batched apply paid the disc input-gradient chain
            # over 2B where B is dead — the concat makes the whole
            # activation g_params-dependent, so XLA cannot DCE the real
            # half out of the backward convs. Measured (v5e, (128,512)
            # ×32, scripts/bench_gan_step.py): fused step 40.3 → 37.7 ms,
            # g_step 27.9 → 21.9. (The D step KEEPS its [real; fake]
            # batched apply — there both halves need weight gradients, so
            # batching is a pure win; docs/DESIGN.md §2b.)
            fake_logits, fake_feats = self._disc_apply(d_params, audio_pred)
            _, real_feats = self._disc_apply(
                d_params, jax.lax.stop_gradient(batch["audio_seg"]))
            losses["generator_loss"] = L.lsgan_generator_loss(fake_logits)
            losses["feature_matching_loss"] = L.feature_matching_loss(
                real_feats, fake_feats)
            weights = self.weights
            if self.adv_warmup > 0:
                # linear 0→1 ramp on the adversarial + FM weights over the
                # first adv_warmup optimizer steps (traced from the train
                # state's own step counter, so resume/warm-start keep the
                # schedule consistent). Logged losses stay un-ramped; only
                # the total is scheduled.
                ramp = jnp.clip(
                    g_state.step.astype(jnp.float32) / self.adv_warmup,
                    0.0, 1.0)
                weights = dict(weights)
                weights["adversarial_weight"] = (
                    weights["adversarial_weight"] * ramp)
                weights["feature_matching_weight"] = (
                    weights["feature_matching_weight"] * ramp)
            if self.adaptive_adv_floor > 0 and d_loss is not None:
                # Adaptive adversarial weight (r05): a WON discriminator
                # (d_loss → 0) feeds saturated-logit gradients into G —
                # measured as the NaN blow-up mechanism that ended both
                # r05 XL drives (d_loss 0.007 at the failure cliff,
                # artifacts/evidence_r05/EVIDENCE.md §2). Scale the
                # adversarial pressure by how balanced the game is:
                # full weight at d_loss ≥ floor, proportionally less as
                # D saturates. In-graph from the CURRENT batch's d_loss
                # (stop-gradded; the fused step computes D first), so it
                # reacts within one step with zero host syncs. FM stays
                # unscaled — it is a feature-space reconstruction loss,
                # stabilizing rather than destabilizing.
                guard = jnp.clip(
                    jax.lax.stop_gradient(d_loss)
                    / self.adaptive_adv_floor, 0.0, 1.0)
                weights = dict(weights)
                weights["adversarial_weight"] = (
                    weights["adversarial_weight"] * guard)
                losses["adv_guard"] = guard
            total = L.combined_generator_loss(losses, **weights)
            losses["total_loss"] = total
            return total, losses

        (_, losses), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_state.params)
        return g_state.apply_gradients(grads=grads), losses

    # -- fused D+G step ---------------------------------------------------------
    def _gd_step_fn(self, g_state, d_state, batch, base_rng, cached=False):
        """One fused GAN step: fold rng, (slice the HBM-cached batch,)
        update D, then update G against the NEW discriminator — the same
        ordering and rng stream as the separate ``_d_step``/``_g_step``
        dispatches, in a single compiled graph. The segment window is
        sliced once and shared (the unfused path recomputes it in each of
        the two graphs)."""
        rng = jax.random.fold_in(base_rng, d_state.step)
        if cached:
            batch = self._slice_batch(batch, rng)
        new_d, d_metrics = self._d_step_fn(g_state.params, d_state, batch,
                                           rng)
        new_g, g_metrics = self._g_step_fn(
            g_state, new_d.params, batch, rng,
            d_loss=d_metrics["discriminator_loss"])
        return new_g, new_d, {**d_metrics, **g_metrics}

    # -- device-cached data path ----------------------------------------------
    def _slice_batch(self, batch: Dict[str, jnp.ndarray], rng):
        """Traced: random per-sample segment window from the HBM-resident
        full waveform (stored at the vocoder's effective rate: ``upsample``
        samples per mel frame). Mirrors the host `_segment_audio` contract
        — offsets in [0, mel_len - seg_frames], zero-padded region beyond
        the true waveform — but entirely on device."""
        off_rng = jax.random.fold_in(rng, 0x5E6)
        mel_len = batch["mel_lengths"]
        max_off = jnp.maximum(mel_len - self.seg_frames, 0)
        u = jax.random.uniform(off_rng, mel_len.shape)
        offsets = jnp.floor(u * (max_off + 1).astype(u.dtype)).astype(
            jnp.int32)
        audio = batch["audio"]
        if audio.dtype in (jnp.bfloat16, jnp.float16):
            audio = audio.astype(jnp.float32)
        U = self.upsample
        S = self.seg_frames * U

        def slice_one(a, off):
            return jax.lax.dynamic_slice(a, (off * U,), (S,))

        out = {k: v for k, v in batch.items() if k != "audio"}
        out["frame_offsets"] = offsets
        out["audio_seg"] = jax.vmap(slice_one)(audio, offsets)
        return out

    def _stage_audio(self, audio: np.ndarray, frames_bucket: int
                     ) -> np.ndarray:
        """Host, once per staging: full waveform -> the vocoder's effective
        rate, fixed length ``frames_bucket * upsample`` (the per-step
        resample the streaming path pays disappears)."""
        want = frames_bucket * self.upsample
        if self.upsample != self.hop:
            from math import gcd

            from scipy.signal import resample_poly

            g = gcd(self.upsample, self.hop)
            audio = np.stack([
                resample_poly(row, self.upsample // g, self.hop // g)
                .astype(np.float32) for row in audio])
        out = np.zeros((audio.shape[0], want), np.float32)
        n = min(want, audio.shape[1])
        out[:, :n] = audio[:, :n]
        return out

    def _device_cached_iterator(self):
        """Infinite iterator over HBM-resident batches (one H2D, ever), or
        None when the staged device bytes exceed the configured budget.
        Per-batch host prep (effective-rate resample, transfer-dtype cast)
        happens inside the staging put_fn, so peak host RAM stays at one
        batch regardless of corpus size."""
        from m2tts_tpu.data.dataset import make_batches
        from m2tts_tpu.data.device_cache import epoch_shuffled, stage_on_device

        sharding = batch_sharding(self.mesh)

        def put(b):
            b["audio"] = self._stage_audio(b["audio"], b["mel"].shape[1])
            if self.transfer_dtype is not None:
                for k in ("mel", "audio"):
                    if b[k].dtype == np.float32:
                        b[k] = b[k].astype(self.transfer_dtype)
            # 0-d entries (n_valid) can't shard over the batch axis and
            # must not enter compiled-step signatures
            return {k: jax.device_put(v, sharding) for k, v in b.items()
                    if getattr(v, "ndim", 0) > 0}

        staged = stage_on_device(
            make_batches(self.dataset, self.batch_size, self.buckets,
                         seed=self.seed, shuffle=True, drop_last=False,
                         audio_samples=self._max_audio_samples()),
            put, self.device_cache_max_gb * 1e9)
        return epoch_shuffled(staged, self.seed + 17) if staged else None

    # -- loop ----------------------------------------------------------------------
    def _prepare(self, batch: Dict[str, np.ndarray],
                 rng: Optional[np.random.Generator] = None,
                 return_targets: bool = False):
        # rng defaults to the training segment stream; validation passes
        # its own generator so validating never perturbs training data
        offsets, targets = _segment_audio(
            batch["audio"], batch["mel_lengths"], self.seg_frames, self.hop,
            self.upsample, rng if rng is not None else self._host_rng)
        device_batch = {k: v for k, v in batch.items()
                        if k != "audio" and getattr(v, "ndim", 0) > 0}
        device_batch["frame_offsets"] = offsets
        device_batch["audio_seg"] = targets
        sharding = batch_sharding(self.mesh)
        if self.transfer_dtype is not None:
            for k in ("mel", "audio_seg"):
                if k in device_batch and device_batch[k].dtype == np.float32:
                    device_batch[k] = device_batch[k].astype(self.transfer_dtype)
        prepared = {k: jax.device_put(v, sharding)
                    for k, v in device_batch.items()}
        if return_targets:
            # the HOST float32 segment targets (validation's quality
            # metrics need them without a device round trip or a bf16
            # transfer-dtype detour)
            return prepared, targets
        return prepared

    def train_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """One D+G step. Returns the loss dict as DEVICE scalars — calling
        float() on them blocks, and doing that every step would force a
        full sync between the D and G dispatches plus ~8 tunnel round
        trips per step (measured: it capped the GAN loop at ~3 steps/s).
        Callers convert with float() only when they actually log."""
        # HBM-cached batches carry the FULL device-resident waveform and
        # slice segments inside the graph; streaming batches are prepared
        # host-side (prefetcher already did it when audio_seg is present)
        cached = "audio" in batch and isinstance(batch["audio"], jax.Array)
        if not cached and "audio_seg" not in batch:
            batch = self._prepare(batch)
        if not self.alternate_gd:
            # hot path: ONE dispatch for the whole D+G pair (rng folds
            # in-graph from d_state.step, == self.step here)
            fn = self._gd_step_cached if cached else self._gd_step
            self.g_state, self.d_state, metrics = fn(
                self.g_state, self.d_state, batch, self.base_rng)
            if self.ema_params is not None:
                self.ema_params = self._ema_update(self.ema_params,
                                                   self.g_state.params)
            self.step += 1
            return metrics
        # alternating mode (reference compat): separate dispatches
        d_fn = self._d_step_cached if cached else self._d_step
        g_fn = self._g_step_cached if cached else self._g_step
        rng = jax.random.fold_in(self.base_rng, self.step)
        metrics: Dict[str, Any] = {}
        if self.step % 2 == 0:
            self.d_state, d_metrics = d_fn(
                self.g_state.params, self.d_state, batch, rng)
            metrics.update(d_metrics)
        else:
            self.g_state, g_metrics = g_fn(
                self.g_state, self.d_state.params, batch, rng)
            metrics.update(g_metrics)
            if self.ema_params is not None:
                self.ema_params = self._ema_update(self.ema_params,
                                                   self.g_state.params)
        self.step += 1
        return metrics

    def train(self, resume: bool = False) -> Dict[str, float]:
        if resume and self.ckpt.latest_step() is not None:
            self.restore()
        from m2tts_tpu.data.prefetch import DevicePrefetcher

        it = self._device_cached_iterator() if self.device_data_cache else None
        if it is None:
            source = data_iterator(self.dataset, self.batch_size,
                                   self.buckets, seed=self.seed,
                                   audio_samples=self._max_audio_samples())
            depth = int(self.config.get("data.prefetch", 2))
            it = (DevicePrefetcher(source, self._prepare, depth) if depth > 0
                  else source)
        last: Dict[str, float] = {}
        t_last = time.perf_counter()
        try:
            while self.step < self.max_steps:
                if not self.thermal.check():
                    self.thermal.wait_for_cooldown()
                try:
                    with self.profiler.step(self.step):
                        metrics = self.train_step(next(it))
                        if self.step % self.log_every == 0:
                            # device scalars -> floats only at log
                            # intervals. This is the step's sync point —
                            # an execution OOM surfaces HERE, so the
                            # conversion must stay inside the guard.
                            metrics = {k: float(v)
                                       for k, v in metrics.items()}
                except jax.errors.JaxRuntimeError as e:  # OOM guard
                    if "RESOURCE_EXHAUSTED" in str(e):
                        logger.error("OOM at step %d; clearing caches",
                                     self.step)
                        jax.clear_caches()
                        self._recover_after_oom()
                        continue
                    raise
                if self.step % self.log_every == 0:
                    if not all(math.isfinite(v) for v in metrics.values()):
                        self._recover_after_blowup()
                        t_last = time.perf_counter()
                        continue
                    now = time.perf_counter()
                    metrics["steps_per_sec"] = self.log_every / (now - t_last)
                    t_last = now
                    metrics.update(self.memory.update())
                    self.metrics.log(metrics, self.step)
                    logger.info("step %d: %s", self.step,
                                {k: round(v, 4) for k, v in metrics.items()})
                    last = metrics
                ran_quality_pass = False
                if self.step % self.validate_every == 0:
                    val = self.validate()
                    ran_quality_pass = self.validate_quality
                    self.metrics.log({f"val_{k}": v for k, v in val.items()},
                                     self.step)
                    # Early-stop / best-checkpoint gate: quality_score
                    # (teacher-forced MCD + spectral convergence) when the
                    # quality gate is on. The reference gates on
                    # -estimated_mos (train_stage2.py:480-485), but that
                    # heuristic is provably near-constant (VERDICT r2
                    # weak #3); MOS stays a logged-only metric here.
                    # validate() computes the composite in-line, so the
                    # gate can never be transiently absent (ADVICE r2
                    # medium: a failing MOS pass silently disabled early
                    # stopping for the rest of the run).
                    score = val.get(self._gate_metric_name())
                    if score is not None:
                        if score < self.best_val_score:
                            self.best_val_score = score
                            self.save_best_checkpoint(score)
                        if self.early_stopping(score):
                            logger.info("Early stopping at step %d",
                                        self.step)
                            break
                if (self.generate_samples_every
                        and self.step % self.generate_samples_every == 0
                        and not ran_quality_pass):
                    # the quality pass above already synthesized + dumped
                    # the eval texts for this step; don't do it twice
                    self.sample_validator.run(
                        {"params": self._eval_params()}, self.step)
                if self.step % self.save_every == 0:
                    self.save_checkpoint()
        except KeyboardInterrupt:
            logger.info("Interrupted at step %d — saving", self.step)
        finally:
            if hasattr(it, "close"):
                it.close()
            self.profiler.close()
            self.save_checkpoint()
            self.metrics.close()
        return last

    def _max_audio_samples(self) -> int:
        max_mel = max(m for _, m in self.buckets)
        return max_mel * self.hop

    def _effective_sample_rate(self) -> int:
        """Sample rate of the vocoder's output: data.sample_rate when the
        upsample factor matches the hop (rate-consistent configs), scaled
        by upsample/hop under the 64x compat vocoder."""
        sr = int(self.config.get("data.sample_rate", 22050))
        return int(sr * self.upsample / self.hop)

    def validate(self, n_batches: int = 2) -> Dict[str, float]:
        """Loss metrics + the reference-audio quality composite on
        held-out batches, plus (when enabled) the quality pass the
        reference runs every validation: evaluator metrics over val
        batches and per-eval-text synthesis with MOS scoring (reference
        train_stage2.py:342-382). Deterministic: a fresh validation RNG
        draws the audio segments, so repeated validation neither jitters
        the metric nor advances the training stream.

        ``quality_score`` = teacher-forced mel MCD + audio spectral
        convergence vs the ground-truth segment — the early-stop /
        best-checkpoint gate. The r2 gate (-estimated_mos) moved 1e-4
        over 300 steps while mel loss fell 6% (VERDICT r2 weak #3); this
        composite is computed from reference audio/mel, discriminates,
        and unlike the sample-synthesis MOS pass cannot transiently fail
        (ADVICE r2 medium: a failing MOS pass silently disabled early
        stopping)."""
        from m2tts_tpu.evaluation.metrics import (
            compute_mcd, compute_spectral_convergence)
        from m2tts_tpu.evaluation.stoi import compute_stoi

        # drop_last=False: a corpus smaller than one batch still
        # validates (padded batches; n_valid excludes the duplicates)
        it = make_batches(self.dataset, self.batch_size, self.buckets,
                          seed=0, shuffle=False, drop_last=False,
                          audio_samples=self._max_audio_samples())
        val_rng = np.random.default_rng(self.seed + 7777)
        totals: Dict[str, float] = {}
        mcds: list = []
        sconvs: list = []
        stois: list = []
        count = 0
        for batch in it:
            n_valid = int(batch.get("n_valid", batch["mel"].shape[0]))
            prepared, seg_targets = self._prepare(batch, rng=val_rng,
                                                  return_targets=True)
            # jitted forward (cached per bucket shape): the eager version
            # dispatched the whole acoustic+vocoder+STFT chain op-by-op —
            # ~30 ms per dispatch over the tunnel, turning every
            # validation into a multi-second stall (CLAUDE.md)
            mel_loss_dev, spec_loss_dev, mel_pred, audio_pred = \
                self._val_fwd(self._eval_params(), prepared)
            # ONE fetch for the whole validation step (scalars + arrays)
            mel_loss, spec_loss, mel_pred_h, audio_pred_h = jax.device_get(
                (mel_loss_dev, spec_loss_dev, mel_pred, audio_pred))
            totals["mel_loss"] = totals.get("mel_loss", 0.0) + float(mel_loss)
            totals["spectral_loss"] = totals.get(
                "spectral_loss", 0.0) + float(spec_loss)
            for i in range(n_valid):  # duplicates from padded batches excluded
                n = int(batch["mel_lengths"][i])
                if n > 0:
                    mcds.append(compute_mcd(mel_pred_h[i, :n].T,
                                            batch["mel"][i, :n].T))
                sconvs.append(compute_spectral_convergence(
                    audio_pred_h[i], seg_targets[i]))
                s = compute_stoi(seg_targets[i], audio_pred_h[i],
                                 self._effective_sample_rate())
                if np.isfinite(s):
                    stois.append(s)
            count += 1
            if count >= n_batches:
                break
        out = {k: v / max(count, 1) for k, v in totals.items()}
        if mcds:
            out["mcd"] = float(np.mean(mcds))
        if sconvs:
            out["spectral_convergence"] = float(np.mean(sconvs))
        if stois:
            # log-only intrusive intelligibility (segment-level; the full-
            # utterance version lives in scripts/evaluate.py --audio-metrics)
            out["stoi"] = float(np.mean(stois))
        if mcds or sconvs:
            out["quality_score"] = (out.get("mcd", 0.0)
                                    + out.get("spectral_convergence", 0.0))
        if self.validate_quality:
            out.update(self._quality_metrics(n_batches))
            # Audio-domain gate composite (VERDICT r3 missing #1): the
            # mel composite plus a full-utterance intelligibility term.
            # (1 - STOI) so lower is better, like the other gate terms.
            if (self.gate_stoi_weight > 0 and "utt_stoi" in out
                    and "quality_score" in out):
                out["quality_score_audio"] = (
                    out["quality_score"]
                    + self.gate_stoi_weight * (1.0 - out["utt_stoi"]))
        return out

    def _quality_metrics(self, n_batches: int) -> Dict[str, float]:
        """Evaluator sweep + eval-text MOS (the reference's
        benchmark_model_performance + estimate_mos_score validation),
        plus full-utterance teacher-forced audio metrics (STOI, LSD,
        spectral convergence) through the complete acoustic+vocoder
        stack — prefixed ``utt_`` to keep them distinct from the
        segment-level metrics validate() computes."""
        from m2tts_tpu.evaluation.metrics import (benchmark_audio_quality,
                                                  benchmark_model_performance)

        out: Dict[str, float] = {}
        sr = int(self.config.get("data.sample_rate", 22050))
        try:
            batches = make_batches(self.dataset, self.batch_size,
                                   self.buckets, seed=0, shuffle=False,
                                   drop_last=False)
            out.update(benchmark_model_performance(
                self.model, {"params": self._eval_params()}, batches,
                num_samples=self.batch_size * n_batches,
                sample_rate=sr, _fn_cache=self._bm_cache))
        except Exception as e:  # pragma: no cover - resilience path
            logger.warning("benchmark_model_performance failed: %s", e)
        try:
            batches = make_batches(self.dataset, self.batch_size,
                                   self.buckets, seed=0, shuffle=False,
                                   drop_last=False,
                                   audio_samples=self._max_audio_samples())
            aq = benchmark_audio_quality(
                self.model, {"params": self._eval_params()}, batches,
                num_samples=self.quality_utterances, sample_rate=sr,
                hop_length=self.hop, _fn_cache=self._bm_cache)
            out.update({
                "utt_stoi": aq.get("stoi"),
                "utt_lsd": aq.get("log_spectral_distance"),
                "utt_spectral_convergence": aq.get("spectral_convergence"),
            })
            out = {k: v for k, v in out.items() if v is not None}
        except Exception as e:  # pragma: no cover - resilience path
            logger.warning("benchmark_audio_quality failed: %s", e)
        out.update(self.sample_validator.run(
            {"params": self._eval_params()}, self.step))
        return out

    @property
    def sample_validator(self):
        if self._sample_validator is None:
            from m2tts_tpu.training.validation import validator_from_config

            self._sample_validator = validator_from_config(
                self.config, self.model, stage=2)
        return self._sample_validator

    def _gate_metric_name(self) -> str:
        """Which validate() key drives early stopping / best pinning.

        With the quality pass on and ``training.gate_stoi_weight`` > 0
        the gate is the audio composite (mel composite + weighted
        1-STOI); a validation whose audio pass failed simply skips the
        gate for that round (score None — validate()'s caller already
        handles absence) rather than silently comparing a different
        metric."""
        if not self.validate_quality:
            return "mel_loss"
        return ("quality_score_audio" if self.gate_stoi_weight > 0
                else "quality_score")

    def save_checkpoint(self) -> None:
        if self.step == 0:
            return
        g, d = self._host_states_copy()
        # a blow-up between log intervals must never poison the on-disk
        # latest checkpoint or the rewind snapshot (save_every and
        # log_every need not align, so detection can lag the save)
        if not tree_finite((g.params, d.params)):
            logger.error("Refusing to checkpoint non-finite params at step "
                         "%d (blow-up not yet detected)", self.step)
            return
        ema = (jax.device_get(self.ema_params)
               if self.ema_params is not None else None)
        self._oom_snapshot = (g, d, ema, self.step)
        payload = {
            "generator": g.params, "g_opt_state": g.opt_state,
            "discriminator": d.params, "d_opt_state": d.opt_state,
            "step": self.step,
        }
        if ema is not None:
            payload["generator_ema"] = ema
        self.ckpt.save(self.step, payload, config=self.config)

    def save_best_checkpoint(self, score: float) -> None:
        """Pin the current G/D states as the best-validation checkpoint
        (reference best_model.pt; loadable via
        load_for_inference(dir, step='best'))."""
        if self._best_ckpt is None:
            self._best_ckpt = CheckpointManager(
                self.ckpt.directory / "best", max_to_keep=1)
        g, d = self._host_states_copy()
        payload = {
            "generator": g.params, "g_opt_state": g.opt_state,
            "discriminator": d.params, "d_opt_state": d.opt_state,
            "step": self.step,
        }
        if self.ema_params is not None:
            # the gate SCORED the EMA weights, so the best checkpoint
            # serves them under 'generator_ema' (load_for_inference
            # prefers that key); 'generator'/'g_opt_state' stay the
            # MATCHED raw pair so resuming from <ckpt>/best never pairs
            # EMA weights with raw Adam moments (ADVICE r4)
            payload["generator_ema"] = jax.device_get(self.ema_params)
        self._best_ckpt.save(self.step, payload, config=self.config,
                             metrics={"val_score": float(score)})
        _write_best_score(self.ckpt.directory, self.step, score,
                          metric=self._gate_metric_name())
        logger.info("New best validation score %.6f at step %d", score,
                    self.step)

    def restore(self) -> None:
        # ONE device_get over both states — per-leaf np.asarray would pay
        # a blocking tunnel round trip per leaf of BOTH optimizers
        g, d = self._host_states_copy()
        template = {"generator": g.params, "g_opt_state": g.opt_state,
                    "discriminator": d.params, "d_opt_state": d.opt_state,
                    "step": 0}
        if self.ema_params is not None:
            template["generator_ema"] = jax.device_get(self.ema_params)
            # resuming a pre-EMA checkpoint with EMA newly enabled: the
            # stored tree has no 'generator_ema' — detect that from the
            # checkpoint METADATA (not by retrying on arbitrary restore
            # exceptions, which masked corrupt-checkpoint failures,
            # ADVICE r4) and seed the shadow from the restored generator
            stored = self.ckpt.state_keys()
            if stored is not None and "generator_ema" not in stored:
                template.pop("generator_ema")
        restored, _, step = self.ckpt.restore(state_template=template)
        if self.ema_params is not None:
            self.ema_params = shard_tree(
                restored.get("generator_ema", restored["generator"]),
                self.mesh)
        self.g_state = shard_tree(self.g_state.replace(
            params=restored["generator"], opt_state=restored["g_opt_state"],
            step=step), self.mesh)
        self.d_state = shard_tree(self.d_state.replace(
            params=restored["discriminator"], opt_state=restored["d_opt_state"],
            step=step), self.mesh)
        self.step = step
        # refresh the OOM snapshot so recovery rolls back to the resumed
        # params, not the __init__-time init
        self._oom_snapshot = self._snapshot()
        # restore the best-validation score so resume never rotates the
        # pinned best checkpoint away with a worse state; the stored
        # metric name guards against comparing across gate metrics when
        # validate_quality was toggled between runs
        self.best_val_score = _read_best_score(self.ckpt.directory,
                                               self.best_val_score,
                                               metric=self._gate_metric_name())
        logger.info("Resumed stage-2 from step %d", step)

    def close(self):
        self.ckpt.close()
        if self._best_ckpt is not None:
            self._best_ckpt.close()
        self.metrics.close()
