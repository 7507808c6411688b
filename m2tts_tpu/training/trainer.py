"""Stage-1 trainer: jit-compiled train step, optax, bucketed data, Orbax.

TPU-native rebuild of the reference M2TTSTrainer (reference
training/train.py:110-492). Structural differences by design:

- the whole forward+loss+grad+update step is ONE compiled XLA graph per
  length bucket; there are no per-step host syncs (the reference's
  LengthRegulator and loss loops force ``.item()`` syncs every step),
- gradient accumulation actually accumulates (optax.MultiSteps); the
  reference zeroes grads every step so its accumulation flag is a no-op
  (train.py:317-339, SURVEY.md §2.4 quirk a),
- warmup is implemented (linear→cosine); the reference declares
  ``warmup_steps`` but never reads it (quirk b),
- bf16 compute with fp32 params/optimizer via a cast at the loss boundary,
- data parallelism: batches sharded over the mesh 'data' axis, params
  replicated; XLA inserts the gradient all-reduce over ICI,
- failure handling kept: OOM catch-and-continue, thermal guard,
  KeyboardInterrupt → final checkpoint (reference train.py:382-427, :480).
"""

from __future__ import annotations

import logging
import math
import time
from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from m2tts_tpu.data.dataset import DummyDataset, TTSDataset, data_iterator, make_batches
from m2tts_tpu.frontend.audio import AudioProcessor
from m2tts_tpu.models import build_model, init_params
from m2tts_tpu.parallel.mesh import batch_sharding, make_mesh
from m2tts_tpu.parallel.partition import shard_tree
from m2tts_tpu.training.losses import stage1_losses
from m2tts_tpu.utils.checkpoint import CheckpointManager
from m2tts_tpu.utils.config import Config
from m2tts_tpu.utils.device import MemoryTracker, ThermalMonitor
from m2tts_tpu.utils.metrics_logger import MetricsLogger
from m2tts_tpu.utils.profiling import StepProfiler
from m2tts_tpu.utils.tree import cast_params_bf16, tree_finite

logger = logging.getLogger(__name__)


def _write_best_score(ckpt_dir, step: int, score: float,
                      metric: str = "") -> None:
    """Record the best-validation score (and WHICH metric produced it)
    beside the pinned checkpoint so a resumed run never overwrites the
    true best with a worse state."""
    import json

    path = Path(ckpt_dir) / "best" / "score.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps({"step": int(step), "score": float(score),
                                "metric": str(metric)}))


def _read_best_score(ckpt_dir, default: float, metric: str = "") -> float:
    """Stored best score, or ``default`` when none exists — or when the
    stored score was produced by a DIFFERENT metric (e.g. the run toggled
    validate_quality): comparing scores across metric scales would
    permanently block best-checkpoint saves (ADVICE r2)."""
    import json

    path = Path(ckpt_dir) / "best" / "score.json"
    if path.exists():
        try:
            data = json.loads(path.read_text())
            stored_metric = str(data.get("metric", ""))
            # a missing 'metric' field (legacy score.json) counts as a
            # mismatch too: a stored -MOS would otherwise permanently
            # outrank any positive-scale gate score
            if metric and stored_metric != metric:
                logger.warning(
                    "best/score.json was produced by metric %r but this "
                    "run gates on %r — resetting the best score",
                    stored_metric or "<unrecorded>", metric)
                return default
            return float(data["score"])
        except (ValueError, KeyError):
            pass
    return default


def make_lr_schedule(cfg) -> optax.Schedule:
    lr = float(cfg.get("learning_rate", 1e-4))
    warmup = int(cfg.get("warmup_steps", 0))
    max_steps = int(cfg.get("max_steps", 10000))
    kind = cfg.get("lr_scheduler", "cosine")
    if kind == "cosine":
        warmup = max(warmup, 1)
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup,
            decay_steps=max(max_steps, warmup + 1))
    if kind == "constant":
        if warmup:
            return optax.linear_schedule(0.0, lr, warmup)
        return optax.constant_schedule(lr)
    raise ValueError(f"Unknown lr_scheduler {kind!r}")


def make_optimizer(cfg) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(float(cfg.get("gradient_clip_norm", 5.0))),
        optax.adamw(make_lr_schedule(cfg),
                    b1=float(cfg.get("adam_b1", 0.9)),
                    b2=float(cfg.get("adam_b2", 0.999)),
                    weight_decay=float(cfg.get("weight_decay", 1e-6))),
    )
    accum = int(cfg.get("gradient_accumulation_steps", 1))
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def build_dataset(cfg, keep_audio: bool = False):
    """TTSDataset when the data dir has content, else DummyDataset — the
    reference's auto-fallback (train.py:201-217) kept so training runs
    data-free."""
    data_dir = Path(cfg.get("data_dir", "data/ljspeech"))
    n_mels = int(cfg.get("n_mels", 64))
    has_data = data_dir.exists() and (
        (data_dir / "metadata.csv").exists()
        or next(data_dir.glob("**/*.wav"), None) is not None)
    if has_data:
        ap = AudioProcessor.from_config(cfg)
        return TTSDataset(
            data_dir, audio_processor=ap,
            subset_size=cfg.get("subset_size"),
            max_text_length=int(cfg.get("max_text_length", 256)),
            max_mel_length=int(cfg.get("max_mel_length", 1000)),
            keep_audio=keep_audio)
    logger.warning("No data found in %s — using DummyDataset", data_dir)
    # honor the configured buckets so data-free training compiles and
    # exercises EVERY bucket graph, not just the smallest
    buckets = [tuple(b) for b in cfg.get("buckets", [[64, 256]])]
    max_text = min(int(cfg.get("max_text_length", 256)),
                   max(t for t, _ in buckets))
    max_mel = min(int(cfg.get("max_mel_length", 1000)),
                  max(m for _, m in buckets))
    return DummyDataset(size=256, mel_dim=n_mels,
                        max_text_length=max_text,
                        max_mel_length=max_mel,
                        keep_audio=keep_audio,
                        hop_length=int(cfg.get("hop_length", 256)))


class Stage1Trainer:
    """Acoustic-model training: masked mel L1 + duration MSE."""

    def __init__(self, config: Config, dataset=None, mesh=None):
        self.config = config
        tcfg = config.get("training", Config())
        self.max_steps = int(tcfg.get("max_steps", 10000))
        self.batch_size = int(tcfg.get("batch_size", 32))
        self.bf16 = bool(tcfg.get("bf16", True))
        self.mel_weight = float(tcfg.get("mel_loss_weight", 1.0))
        self.duration_weight = float(tcfg.get("duration_loss_weight", 0.1))
        self.log_every = int(tcfg.get("log_every", 50))
        self.save_every = int(tcfg.get("save_every", 1000))
        self.validate_every = int(tcfg.get("validate_every", 500))
        self.seed = int(tcfg.get("seed", 1234))
        # host->device transfer dtype for large float arrays (mel/audio
        # targets): bf16 halves H2D bytes — on PCIe/tunnel hosts the
        # train step is transfer-bound, not FLOP-bound. Loss math
        # upcasts to f32 on device.
        td = tcfg.get("transfer_dtype", None)
        self.transfer_dtype = jnp.bfloat16 if td in ("bfloat16", "bf16") else (
            jnp.float16 if td in ("float16", "fp16") else None)
        # Device-resident data cache: stage the whole (bucketed, collated)
        # dataset in HBM once and pay ZERO per-step H2D — the train step
        # is H2D-bound on tunneled/PCIe hosts (measured: 42 steps/s pure
        # dispatch vs 13 steps/s with per-step transfers at the (128,512)
        # bucket). Trade-off: batch composition is fixed across epochs
        # (only the batch ORDER reshuffles); falls back to streaming when
        # the dataset exceeds the HBM budget.
        self.device_data_cache = bool(tcfg.get("device_data_cache", False))
        self.device_cache_max_gb = float(
            tcfg.get("device_data_cache_max_gb", 4.0))

        self.mesh = mesh or make_mesh(
            int(config.get("system.mesh.data", -1)),
            model=int(config.get("system.mesh.model", 1)))
        self.n_data = self.mesh.shape["data"]

        self.model = build_model(config.get("model", Config()))
        self.dataset = dataset if dataset is not None else build_dataset(
            config.get("data", Config()))
        self.buckets = [tuple(b) for b in config.get(
            "data.buckets", [[64, 256], [128, 512], [256, 1000]])]

        # init params + optimizer
        rng = jax.random.PRNGKey(self.seed)
        dummy_ids = jnp.zeros((1, 8), jnp.int32)
        variables = init_params(self.model, rng, dummy_ids, max_frames=16,
                                 run_vocoder=True)
        self.tx = make_optimizer(tcfg)
        state = train_state.TrainState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=self.tx)
        # TP-aware placement: Megatron-style specs on the transformer
        # kernels over the 'model' axis (no-op at model=1)
        self.state = shard_tree(state, self.mesh)
        self.base_rng = jax.random.PRNGKey(self.seed + 1)

        out_dir = Path(config.get("paths.output_dir", "outputs/stage1"))
        self.ckpt = CheckpointManager(
            config.get("paths.checkpoint_dir", out_dir / "checkpoints"),
            max_to_keep=int(tcfg.get("max_checkpoints", 5)))
        self.metrics = MetricsLogger(
            config.get("paths.log_dir", out_dir / "logs"),
            backend=config.get("system.log_metrics", "csv"),
            wandb_project=config.get("system.wandb_project"),
            run_name=config.get("system.run_name"))
        self.memory = MemoryTracker()
        self.thermal = ThermalMonitor(
            threshold_c=float(config.get("system.thermal_threshold", 80.0)))
        self.profiler = StepProfiler.from_config(config)

        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self.step = 0
        # best-validation checkpoint, pinned against rotation under
        # <ckpt_dir>/best (reference best_model.pt, train.py:256-260)
        self.best_val_loss = float("inf")
        self._best_ckpt: CheckpointManager | None = None
        # in-training quality validation: sample WAV dump on every
        # validation (reference train.py:344-368); lazily built so
        # sample-free runs never pay the synthesis compile
        self.validate_samples = bool(tcfg.get("validate_samples", True))
        self._sample_validator = None
        # Host-side snapshot for OOM recovery: _train_step donates the
        # state (donate_argnums=(0,)), so a failed dispatch can leave
        # self.state's buffers deleted — the torch-style "just continue"
        # guard would then crash on 'Array has been deleted'. Refreshed
        # at every checkpoint save and at resume; stored with its step so
        # a restore also rewinds the loop counter (params and step must
        # never diverge in checkpoints/metrics).
        self._oom_snapshot = (self._host_state_copy(), 0)
        # Loss blow-up guard (shared design with stage-2): detect at the
        # log-interval host sync, rewind to the snapshot, bounded retries.
        self._blowups = 0
        self._blowup_limit = int(config.get("training.max_loss_blowups", 3))

    @property
    def sample_validator(self):
        if self._sample_validator is None:
            from m2tts_tpu.training.validation import validator_from_config

            self._sample_validator = validator_from_config(
                self.config, self.model, stage=1)
        return self._sample_validator

    def _host_state_copy(self):
        # one device_get for the whole tree: a single sync instead of a
        # ~30 ms tunnel round trip per leaf
        return jax.device_get(self.state)

    def _recover_after_oom(self) -> None:
        """Make self.state usable again after a failed (donating) dispatch.

        If the donated buffers survived, keep them (no progress lost);
        otherwise restore the last host snapshot AND rewind the loop step
        to it — continuing with the crashed step counter would mislabel
        every subsequent checkpoint/metric with progress the params never
        received."""
        leaves = jax.tree_util.tree_leaves(self.state)
        deleted = any(getattr(x, "is_deleted", lambda: False)()
                      for x in leaves)
        if deleted:
            snap_state, snap_step = self._oom_snapshot
            logger.warning("Donated state was invalidated by the failed "
                           "step — restoring last snapshot (step %d)",
                           snap_step)
            self.state = shard_tree(snap_state, self.mesh)
            self.step = snap_step

    def _recover_after_blowup(self) -> None:
        """Rewind to the last finite snapshot after non-finite losses.

        The host data stream is NOT rewound and ``base_rng`` is refolded
        per recovery, so the replayed window sees different batches AND
        different dropout noise — a fresh trajectory instead of a
        deterministic replay into the same blow-up. Raises after
        ``training.max_loss_blowups`` recoveries."""
        self._blowups += 1
        self.base_rng = jax.random.fold_in(self.base_rng,
                                           0xB10 + self._blowups)
        snap_state, snap_step = self._oom_snapshot
        blown_step = self.step
        # restore BEFORE the limit check: when the raise fires, train()'s
        # finally-save must persist the last finite snapshot, not the
        # exploded params
        self.state = shard_tree(snap_state, self.mesh)
        self.step = snap_step
        if self._blowups > self._blowup_limit:
            raise RuntimeError(
                f"non-finite losses at step {blown_step} — "
                f"{self._blowups - 1} rewinds already spent; lower the "
                "learning rate or raise training.max_loss_blowups")
        logger.error(
            "Non-finite losses at step %d — rewinding to snapshot step %d "
            "(blow-up %d/%d)", blown_step, snap_step, self._blowups,
            self._blowup_limit)

    # -- compiled steps ------------------------------------------------------
    def _loss_fn(self, params, batch, rng, deterministic):
        p = cast_params_bf16(params) if self.bf16 else params
        out = self.model.apply(
            {"params": p}, batch["phoneme_ids"], batch["text_lengths"],
            batch["durations"], max_frames=batch["mel"].shape[1],
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": rng})
        losses = stage1_losses(
            out["mel_output"].astype(jnp.float32), batch["mel"],
            out["duration_pred"].astype(jnp.float32), batch["durations"],
            batch["mel_lengths"], self.mel_weight, self.duration_weight)
        return losses["total_loss"], losses

    def _build_train_step(self):
        def step_fn(state, batch, base_rng):
            # dropout rng folds from state.step INSIDE the graph: the
            # whole train step is one host dispatch (the separate host
            # fold_in was a second dispatch per step — measurable on a
            # tunneled 1-CPU host). state.step tracks the loop step on
            # every path (init, resume, OOM/blow-up rewind), so the
            # stream is identical to a host-side fold.
            rng = jax.random.fold_in(base_rng, state.step)
            grad_fn = jax.value_and_grad(
                lambda p: self._loss_fn(p, batch, rng, False), has_aux=True)
            (_, losses), grads = grad_fn(state.params)
            new_state = state.apply_gradients(grads=grads)
            losses["grad_norm"] = optax.global_norm(grads)
            return new_state, losses

        return jax.jit(step_fn, donate_argnums=(0,))

    def _build_eval_step(self):
        def eval_fn(state, batch):
            _, losses = self._loss_fn(state.params, batch,
                                      jax.random.PRNGKey(0), True)
            return losses

        return jax.jit(eval_fn)

    # -- loop -----------------------------------------------------------------
    def _put(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        sharding = batch_sharding(self.mesh)
        out = {}
        for k, v in batch.items():
            if not (hasattr(v, "ndim") and v.ndim > 0):
                continue
            if (self.transfer_dtype is not None and k in ("mel", "audio")
                    and v.dtype == np.float32):
                v = v.astype(self.transfer_dtype)
            out[k] = jax.device_put(v, sharding)
        return out

    def _device_cached_iterator(self):
        """Infinite iterator over HBM-resident batches (one H2D, ever).

        Collates one full epoch (drop_last=False: every sample included)
        and stages each fixed-shape batch on the mesh incrementally, then
        yields them in a fresh shuffled ORDER each epoch. Returns None
        (streaming fallback) when the staged device bytes would exceed
        the configured HBM budget."""
        from m2tts_tpu.data.device_cache import epoch_shuffled, stage_on_device

        staged = stage_on_device(
            make_batches(self.dataset, self.batch_size, self.buckets,
                         seed=self.seed, shuffle=True, drop_last=False),
            self._put, self.device_cache_max_gb * 1e9)
        return epoch_shuffled(staged, self.seed + 17) if staged else None

    def train(self, resume: bool = False) -> Dict[str, float]:
        if resume and self.ckpt.latest_step() is not None:
            # ONE device_get for the whole template — per-leaf np.asarray
            # would pay a blocking tunnel round trip per parameter/opt leaf
            host_state = self._host_state_copy()
            template = {"params": host_state.params,
                        "opt_state": host_state.opt_state,
                        "step": 0}
            restored, _, step = self.ckpt.restore(state_template=template)
            self.state = shard_tree(
                self.state.replace(params=restored["params"],
                                   opt_state=restored["opt_state"],
                                   step=step), self.mesh)
            self.step = step
            # refresh the OOM snapshot: recovery must roll back to the
            # resumed params, not the __init__-time random init
            self._oom_snapshot = (self._host_state_copy(), step)
            # restore the best-validation score too: without it the first
            # post-resume validation would always "improve" on inf and
            # rotate away the genuine best checkpoint
            self.best_val_loss = _read_best_score(
                self.ckpt.directory, self.best_val_loss,
                metric="val_total_loss")
            logger.info("Resumed from step %d", step)

        from m2tts_tpu.data.prefetch import DevicePrefetcher

        it = self._device_cached_iterator() if self.device_data_cache else None
        if it is None:
            depth = int(self.config.get("data.prefetch", 2))
            source = data_iterator(self.dataset, self.batch_size,
                                   self.buckets, seed=self.seed)
            it = (DevicePrefetcher(source, self._put, depth) if depth > 0
                  else map(self._put, source))
        last: Dict[str, float] = {}
        t_last = time.perf_counter()
        try:
            while self.step < self.max_steps:
                if not self.thermal.check():
                    self.thermal.wait_for_cooldown()
                batch = next(it)
                try:
                    with self.profiler.step(self.step):
                        self.state, losses = self._train_step(self.state, batch,
                                                              self.base_rng)
                        if (self.step + 1) % self.log_every == 0:
                            # log-step sync: an execution OOM surfaces at
                            # this conversion, so it stays in the guard
                            losses = {k: float(v)
                                      for k, v in losses.items()}
                except jax.errors.JaxRuntimeError as e:  # OOM guard
                    if "RESOURCE_EXHAUSTED" in str(e):
                        logger.error("OOM at step %d; clearing caches", self.step)
                        jax.clear_caches()
                        self._recover_after_oom()
                        continue
                    raise
                self.step += 1

                if self.step % self.log_every == 0:
                    last = {k: float(v) for k, v in losses.items()}
                    if not all(math.isfinite(v) for v in last.values()):
                        self._recover_after_blowup()
                        t_last = time.perf_counter()
                        continue
                    now = time.perf_counter()
                    last["steps_per_sec"] = self.log_every / (now - t_last)
                    t_last = now
                    last.update(self.memory.update())
                    self.metrics.log(last, self.step)
                    logger.info("step %d: %s", self.step,
                                {k: round(v, 4) for k, v in last.items()})
                if self.step % self.validate_every == 0:
                    val = self.validate()
                    if self.validate_samples:
                        val.update(self.sample_validator.run(
                            {"params": self.state.params}, self.step))
                    self.metrics.log({f"val_{k}": v for k, v in val.items()},
                                     self.step)
                    score = val.get("total_loss")
                    if score is not None and score < self.best_val_loss:
                        self.best_val_loss = score
                        self.save_best_checkpoint(score)
                if self.step % self.save_every == 0:
                    self.save_checkpoint()
        except KeyboardInterrupt:  # graceful final checkpoint
            logger.info("Interrupted at step %d — saving checkpoint", self.step)
        finally:
            if hasattr(it, "close"):
                it.close()
            self.profiler.close()
            self.save_checkpoint()
            self.metrics.close()
        return last

    def validate(self, n_batches: int = 2) -> Dict[str, float]:
        # drop_last=False: a corpus smaller than one batch per bucket must
        # still validate — with the default drop_last every leftover group
        # is dropped, validate() returns {}, and the best checkpoint is
        # NEVER pinned (stage-2 fixed this; stage-1 had the same bug)
        it = make_batches(self.dataset, self.batch_size, self.buckets,
                          seed=0, shuffle=False, drop_last=False)
        totals: Dict[str, float] = {}
        count = 0
        for batch in it:
            losses = self._eval_step(self.state, self._put(batch))
            for k, v in losses.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            count += 1
            if count >= n_batches:
                break
        return {k: v / max(count, 1) for k, v in totals.items()}

    def save_checkpoint(self) -> None:
        if self.step == 0:
            return
        host_state = self._host_state_copy()
        # a blow-up between log intervals must never poison the on-disk
        # latest checkpoint or the rewind snapshot (save_every and
        # log_every need not align, so detection can lag the save)
        if not tree_finite(host_state.params):
            logger.error("Refusing to checkpoint non-finite params at step "
                         "%d (blow-up not yet detected)", self.step)
            return
        self._oom_snapshot = (host_state, self.step)
        self.ckpt.save(self.step,
                       {"params": host_state.params,
                        "opt_state": host_state.opt_state,
                        "step": self.step},
                       config=self.config)

    def save_best_checkpoint(self, score: float) -> None:
        """Pin the current state as the best-validation checkpoint
        (reference best_model.pt semantics: survives rotation,
        loadable via load_for_inference(dir, step='best'))."""
        if self._best_ckpt is None:
            self._best_ckpt = CheckpointManager(
                self.ckpt.directory / "best", max_to_keep=1)
        host_state = self._host_state_copy()
        self._best_ckpt.save(self.step,
                             {"params": host_state.params,
                              "opt_state": host_state.opt_state,
                              "step": self.step},
                             config=self.config,
                             metrics={"val_total_loss": float(score)})
        _write_best_score(self.ckpt.directory, self.step, score,
                          metric="val_total_loss")
        logger.info("New best validation loss %.6f at step %d", score,
                    self.step)

    def close(self):
        self.ckpt.close()
        if self._best_ckpt is not None:
            self._best_ckpt.close()
        self.metrics.close()
