"""Stage-2 GAN trainer: D/G steps update the right params, checkpoints load
for inference, alternation mode, segment alignment."""

import jax
import numpy as np
import pytest

from m2tts_tpu.data.dataset import DummyDataset
from m2tts_tpu.training.trainer_stage2 import Stage2Trainer, _segment_audio
from m2tts_tpu.utils.config import Config


def stage2_config(tmp_path, **training_overrides):
    training = {
        "batch_size": 8, "max_steps": 2, "learning_rate": 1e-4,
        "warmup_steps": 0, "lr_scheduler": "constant",
        "gradient_clip_norm": 1.0, "bf16": False,
        "audio_segment_len": 512, "log_every": 1, "save_every": 100,
        "validate_every": 100, "seed": 0,
    }
    training.update(training_overrides)
    return Config({
        "model": {
            "text_encoder": {"vocab_size": 64, "hidden_dim": 32,
                             "num_layers": 1, "num_heads": 2, "dropout": 0.1},
            "decoder": {"mel_channels": 8, "num_layers": 1},
            "vocoder": {"hidden_channels": 32},
        },
        "training": training,
        "data": {"buckets": [[48, 128]], "n_mels": 8, "hop_length": 256},
        "system": {"mesh": {"data": -1}, "log_metrics": "jsonl"},
        "paths": {"output_dir": str(tmp_path / "out"),
                  "checkpoint_dir": str(tmp_path / "out/ckpt"),
                  "log_dir": str(tmp_path / "out/logs")},
    })


@pytest.fixture(scope="module")
def dummy_ds():
    return DummyDataset(size=64, mel_dim=8, max_text_length=40,
                        max_mel_length=120, seed=0, keep_audio=True)


def test_segment_audio_alignment():
    rng = np.random.default_rng(0)
    hop, up, seg_frames = 256, 64, 4
    audio = np.arange(2 * 100 * hop, dtype=np.float32).reshape(2, -1)
    mel_lengths = np.asarray([100, 50])
    offsets, targets = _segment_audio(audio, mel_lengths, seg_frames, hop,
                                      up, rng)
    assert targets.shape == (2, seg_frames * up)
    assert (offsets <= mel_lengths - seg_frames).all()
    # no resampling case: up == hop
    offsets2, targets2 = _segment_audio(audio, mel_lengths, seg_frames, hop,
                                        hop, np.random.default_rng(1))
    i, o = 0, int(offsets2[0])
    np.testing.assert_allclose(targets2[i], audio[i, o * hop:(o + seg_frames) * hop])


def test_gan_training_updates_both_nets(tmp_path, dummy_ds):
    trainer = Stage2Trainer(stage2_config(tmp_path), dataset=dummy_ds)
    g0 = jax.tree_util.tree_map(np.asarray, trainer.g_state.params)
    d0 = jax.tree_util.tree_map(np.asarray, trainer.d_state.params)
    metrics = trainer.train()
    for key in ("total_loss", "mel_loss", "spectral_loss", "generator_loss",
                "feature_matching_loss", "discriminator_loss"):
        assert key in metrics and np.isfinite(metrics[key]), key
    g1 = jax.tree_util.tree_map(np.asarray, trainer.g_state.params)
    d1 = jax.tree_util.tree_map(np.asarray, trainer.d_state.params)
    assert any(not np.allclose(a, b) for a, b in
               zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)))
    assert any(not np.allclose(a, b) for a, b in
               zip(jax.tree_util.tree_leaves(d0), jax.tree_util.tree_leaves(d1)))
    trainer.close()


def test_stage2_oom_recovery(tmp_path, dummy_ds):
    """Stage-2 OOM guard: a failed (donating) G step that invalidates both
    states must not kill the run — training restores the snapshot and
    finishes."""
    cfg = stage2_config(tmp_path, max_steps=2)
    trainer = Stage2Trainer(cfg, dataset=dummy_ds)
    real_gd = trainer._gd_step
    calls = {"n": 0}

    def flaky_gd(g_state, d_state, batch, rng):
        calls["n"] += 1
        if calls["n"] == 1:
            for leaf in jax.tree_util.tree_leaves(
                    (trainer.g_state, trainer.d_state)):
                if hasattr(leaf, "delete"):
                    leaf.delete()
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: simulated OOM")
        return real_gd(g_state, d_state, batch, rng)

    trainer._gd_step = flaky_gd
    last = trainer.train()
    trainer.close()
    assert trainer.step == 2
    assert np.isfinite(last["total_loss"])


def test_fused_gd_step_matches_unfused(tmp_path, dummy_ds):
    """The fused single-dispatch GAN step (``_gd_step``) must reproduce the
    separate ``_d_step``/``_g_step`` dispatch sequence exactly: same rng
    fold (from d_state.step == loop step), D update first, G against the
    NEW discriminator."""
    from m2tts_tpu.data.dataset import data_iterator
    from m2tts_tpu.parallel.partition import shard_tree

    cfg = stage2_config(tmp_path, max_steps=1)
    tr = Stage2Trainer(cfg, dataset=dummy_ds)
    it = data_iterator(dummy_ds, 8, tr.buckets, seed=0,
                       audio_samples=tr._max_audio_samples())
    batch = tr._prepare(next(it))
    g0, d0 = tr._host_states_copy()  # every step path donates its inputs

    # unfused reference sequence: host-side rng fold, D then G
    rng = jax.random.fold_in(tr.base_rng, int(tr.d_state.step))
    d1, dm = tr._d_step(tr.g_state.params, tr.d_state, batch, rng)
    g1, gm = tr._g_step(tr.g_state, d1.params, batch, rng)
    g1p, d1p = jax.device_get((g1.params, d1.params))

    # rewind and run the fused step on identical states
    tr.g_state = shard_tree(g0, tr.mesh)
    tr.d_state = shard_tree(d0, tr.mesh)
    g2, d2, metrics = tr._gd_step(tr.g_state, tr.d_state, batch, tr.base_rng)
    g2p, d2p = jax.device_get((g2.params, d2.params))

    for a, b in zip(jax.tree_util.tree_leaves(g1p),
                    jax.tree_util.tree_leaves(g2p)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(d1p),
                    jax.tree_util.tree_leaves(d2p)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
    assert set(metrics) == set(dm) | set(gm)
    tr.close()


def test_stage2_gradient_accumulation(tmp_path, dummy_ds):
    """With gradient_accumulation_steps=2 the generator params change only
    every second micro-step (optax.MultiSteps in the stage-2 tx)."""
    from m2tts_tpu.data.dataset import data_iterator

    cfg = stage2_config(tmp_path, gradient_accumulation_steps=2, max_steps=1)
    trainer = Stage2Trainer(cfg, dataset=dummy_ds)
    it = data_iterator(dummy_ds, 8, trainer.buckets, seed=0,
                       audio_samples=trainer._max_audio_samples())
    g0 = jax.device_get(trainer.g_state.params)
    trainer.train_step(next(it))
    g1 = jax.device_get(trainer.g_state.params)
    assert all(np.allclose(a, b) for a, b in
               zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)))
    trainer.train_step(next(it))
    g2 = jax.device_get(trainer.g_state.params)
    assert any(not np.allclose(a, b) for a, b in
               zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g2)))
    trainer.close()


def test_stage2_checkpoint_loads_for_inference(tmp_path, dummy_ds):
    cfg = stage2_config(tmp_path, max_steps=1)
    trainer = Stage2Trainer(cfg, dataset=dummy_ds)
    trainer.train()
    trainer.close()

    from m2tts_tpu.serving.pipeline import from_checkpoint

    synth = from_checkpoint(cfg.get("paths.checkpoint_dir"))
    res = synth.synthesize("hello world")
    assert res["frames"] > 0
    assert np.isfinite(res["audio"]).all()


def test_alternating_mode(tmp_path, dummy_ds):
    """alternate_gd: D on even steps, G on odd (reference behavior)."""
    trainer = Stage2Trainer(stage2_config(tmp_path, alternate_gd=True,
                                          max_steps=2), dataset=dummy_ds)
    from m2tts_tpu.data.dataset import data_iterator

    it = data_iterator(dummy_ds, 8, trainer.buckets, seed=0,
                       audio_samples=trainer._max_audio_samples())
    m0 = trainer.train_step(next(it))  # step 0 -> D only
    assert "discriminator_loss" in m0 and "total_loss" not in m0
    m1 = trainer.train_step(next(it))  # step 1 -> G only
    assert "total_loss" in m1 and "discriminator_loss" not in m1
    trainer.close()


def test_resume_stage2(tmp_path, dummy_ds):
    cfg = stage2_config(tmp_path, max_steps=2, save_every=2)
    t1 = Stage2Trainer(cfg, dataset=dummy_ds)
    t1.train()
    t1.close()
    t2 = Stage2Trainer(stage2_config(tmp_path, max_steps=3, save_every=2),
                       dataset=dummy_ds)
    t2.train(resume=True)
    assert t2.step == 3
    t2.close()


def test_stage2_validate_quality_and_determinism(tmp_path, dummy_ds):
    """Stage-2 validation reports estimated MOS + evaluator metrics, dumps
    eval-text WAVs, and is deterministic: calling it twice returns the
    same numbers and does not advance the training segment RNG."""
    cfg = stage2_config(tmp_path, max_steps=1)
    cfg.set("system.eval_texts", ["Hello."])
    cfg.set("system.eval_text_bucket", 16)
    cfg.set("system.eval_frame_bucket", 64)
    trainer = Stage2Trainer(cfg, dataset=dummy_ds)
    rng_state_before = trainer._host_rng.bit_generator.state
    v1 = trainer.validate(n_batches=1)
    v2 = trainer.validate(n_batches=1)
    assert trainer._host_rng.bit_generator.state == rng_state_before
    assert "estimated_mos" in v1 and 1.0 <= v1["estimated_mos"] <= 5.0
    assert "mel_l1_distance" in v1  # evaluator sweep ran
    assert v1["mel_loss"] == pytest.approx(v2["mel_loss"])
    assert v1["estimated_mos"] == pytest.approx(v2["estimated_mos"])
    samples = list((tmp_path / "out" / "samples").glob("*.wav"))
    assert samples
    trainer.close()


def test_generator_warm_start_from_stage1(tmp_path, dummy_ds):
    """training.init_generator_from loads stage-1 params into the stage-2
    generator (beyond reference: its stage-2 can only resume itself)."""
    from m2tts_tpu.training.trainer import Stage1Trainer
    from m2tts_tpu.utils.config import Config

    s1_cfg = stage2_config(tmp_path / "s1", max_steps=2, save_every=2)
    t1 = Stage1Trainer(s1_cfg, dataset=dummy_ds)
    t1.train()
    trained = jax.device_get(t1.state.params)
    t1.close()

    cfg = stage2_config(tmp_path / "s2", max_steps=1)
    cfg.set("training.init_generator_from",
            s1_cfg.get("paths.checkpoint_dir"))
    t2 = Stage2Trainer(cfg, dataset=dummy_ds)
    warm = jax.device_get(t2.g_state.params)
    fresh = Stage2Trainer(stage2_config(tmp_path / "s3", max_steps=1),
                          dataset=dummy_ds)
    cold = jax.device_get(fresh.g_state.params)
    leaf = lambda p: p["text_encoder"]["embedding"]["embedding"]
    np.testing.assert_allclose(leaf(warm), leaf(trained))
    assert not np.allclose(leaf(warm), leaf(cold))
    t2.close()
    fresh.close()


def test_stage2_device_data_cache_trains(tmp_path, dummy_ds):
    """HBM-resident stage-2 data: full waveforms staged once, segment
    offsets drawn and sliced inside the compiled step."""
    cfg = stage2_config(tmp_path, max_steps=3, device_data_cache=True)
    tr = Stage2Trainer(cfg, dataset=dummy_ds)
    last = tr.train()
    tr.close()
    assert tr.step == 3
    assert np.isfinite(last["total_loss"])
    assert np.isfinite(last["discriminator_loss"])


def test_stage2_slice_batch_matches_manual(tmp_path, dummy_ds):
    cfg = stage2_config(tmp_path, max_steps=1, device_data_cache=True)
    tr = Stage2Trainer(cfg, dataset=dummy_ds)
    it = tr._device_cached_iterator()
    assert it is not None
    b = next(it)
    out = tr._slice_batch(b, jax.random.PRNGKey(7))
    off = np.asarray(out["frame_offsets"])
    seg = np.asarray(out["audio_seg"])
    audio = np.asarray(b["audio"], np.float32)
    U, S = tr.upsample, tr.seg_frames
    mel_len = np.asarray(b["mel_lengths"])
    assert (off >= 0).all()
    assert (off <= np.maximum(mel_len - S, 0)).all()
    for i in range(min(4, seg.shape[0])):
        np.testing.assert_allclose(
            seg[i], audio[i, off[i] * U: off[i] * U + S * U], rtol=1e-6)
    assert "audio" not in out and "audio_seg" in out
    tr.close()


def test_quality_gate_score_present_and_discriminates(tmp_path, dummy_ds):
    """The early-stop/best-ckpt gate (quality_score = teacher-forced MCD +
    spectral convergence, VERDICT r2 task 5) must (a) always be present in
    validate() output even with the sample-synthesis quality pass
    disabled, and (b) improve over a short training run — unlike the r2
    -MOS gate, which was provably near-constant."""
    cfg = stage2_config(tmp_path, max_steps=40, learning_rate=2e-3,
                        validate_every=10**9, save_every=10**9)
    cfg.set("training.validate_quality", False)
    trainer = Stage2Trainer(cfg, dataset=dummy_ds)
    before = trainer.validate(n_batches=2)
    assert "quality_score" in before and np.isfinite(before["quality_score"])
    assert "mcd" in before and "spectral_convergence" in before
    assert trainer._gate_metric_name() == "mel_loss"  # quality pass off
    trainer.train()
    after = trainer.validate(n_batches=2)
    assert after["quality_score"] < before["quality_score"], (
        before["quality_score"], after["quality_score"])
    trainer.close()


def test_best_score_metric_mismatch_resets(tmp_path):
    """best/score.json stores the gate metric name; a resumed run gating
    on a different metric must reset to +inf rather than compare
    incompatible scales (ADVICE r2)."""
    from m2tts_tpu.training.trainer import _read_best_score, _write_best_score

    ckpt_dir = tmp_path / "ckpt"
    _write_best_score(ckpt_dir, 100, -3.5, metric="neg_mos")
    # same metric: the stored score is returned
    assert _read_best_score(ckpt_dir, float("inf"),
                            metric="neg_mos") == -3.5
    # different metric: reset to the default
    assert _read_best_score(ckpt_dir, float("inf"),
                            metric="quality_score") == float("inf")
    # legacy file without a metric field counts as a mismatch too: a
    # stored -MOS would otherwise permanently outrank any positive-scale
    # gate score (exactly the bug the metric tag was added to fix)
    import json
    (ckpt_dir / "best" / "score.json").write_text(
        json.dumps({"step": 1, "score": -3.5}))
    assert _read_best_score(ckpt_dir, float("inf"),
                            metric="quality_score") == float("inf")


def test_stage2_blowup_recovery_bounded(tmp_path, dummy_ds):
    """_recover_after_blowup rewinds g/d states + step to the snapshot and
    raises once training.max_loss_blowups is exhausted."""
    import pytest

    cfg = stage2_config(tmp_path, max_steps=1, max_loss_blowups=1)
    from m2tts_tpu.training.trainer_stage2 import Stage2Trainer

    trainer = Stage2Trainer(cfg, dataset=dummy_ds)
    snap_g, snap_d = trainer._host_states_copy()
    trainer._oom_snapshot = (snap_g, snap_d, None, 0)
    trainer.step = 7
    trainer._recover_after_blowup()
    assert trainer.step == 0 and trainer._blowups == 1
    with pytest.raises(RuntimeError, match="non-finite"):
        trainer._recover_after_blowup()
    trainer.close()


def test_disc_lowering_packed_equals_native(tmp_path, dummy_ds):
    """The phase-packed discriminator lowering must be a drop-in for the
    native apply inside the trainer: same logits/features on the same
    params (the step-level exactness then follows from the gradient
    equivalence asserted in test_disc_packed.py)."""
    import jax.numpy as jnp

    cfg = stage2_config(tmp_path, disc_lowering="packed")
    tr = Stage2Trainer(cfg, dataset=dummy_ds)
    assert tr.disc_lowering == "packed"  # explicit config wins off-TPU
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 512, 1)), jnp.float32)
    lp, fp = tr._disc_apply(tr.d_state.params, audio)
    tr.disc_lowering = "native"
    ln, fn = tr._disc_apply(tr.d_state.params, audio)
    for a, b in zip(ln, lp):
        np.testing.assert_allclose(a, b, atol=1e-4)
    for fa, fb in zip(fn, fp):
        for a, b in zip(fa, fb):
            np.testing.assert_allclose(a, b, atol=1e-4)


def test_disc_lowering_bad_value_rejected(tmp_path, dummy_ds):
    with pytest.raises(ValueError, match="disc_lowering"):
        Stage2Trainer(stage2_config(tmp_path, disc_lowering="magic"),
                      dataset=dummy_ds)


def test_disc_lowering_spectral_norm_forces_native(tmp_path, dummy_ds):
    cfg = stage2_config(tmp_path, disc_lowering="packed",
                        discriminator_spectral_norm=True)
    tr = Stage2Trainer(cfg, dataset=dummy_ds)
    assert tr.disc_lowering == "native"


def test_adversarial_warmup_ramp(tmp_path, dummy_ds):
    """With training.adversarial_warmup_steps set, the generator total at
    step 0 carries ZERO adversarial/FM weight (ramp = step/warmup = 0):
    total == mel + 0.1*dur + spectral + 0.5*perceptual exactly, while the
    adv/FM component losses are still logged un-ramped."""
    cfg = stage2_config(tmp_path, adversarial_warmup_steps=100)
    tr = Stage2Trainer(cfg, dataset=dummy_ds)
    assert tr.adv_warmup == 100
    from m2tts_tpu.data.dataset import data_iterator

    it = data_iterator(dummy_ds, 8, tr.buckets, seed=0,
                       audio_samples=tr._max_audio_samples())
    m = {k: float(v) for k, v in tr.train_step(next(it)).items()}
    expect = (m["mel_loss"] + 0.1 * m["duration_loss"]
              + m["spectral_loss"] + 0.5 * m["perceptual_loss"])
    assert m["total_loss"] == pytest.approx(expect, rel=1e-5)
    assert m["generator_loss"] > 0 and m["feature_matching_loss"] > 0
    # a no-warmup trainer on the same data must include the adv terms
    tr2 = Stage2Trainer(stage2_config(tmp_path / "nw"), dataset=dummy_ds)
    it2 = data_iterator(dummy_ds, 8, tr2.buckets, seed=0,
                        audio_samples=tr2._max_audio_samples())
    m2 = {k: float(v) for k, v in tr2.train_step(next(it2)).items()}
    expect2 = (m2["mel_loss"] + 0.1 * m2["duration_loss"]
               + m2["spectral_loss"] + 0.5 * m2["perceptual_loss"]
               + 0.25 * m2["generator_loss"]
               + 2.0 * m2["feature_matching_loss"])
    assert m2["total_loss"] == pytest.approx(expect2, rel=1e-5)
    tr.close()
    tr2.close()


def test_audio_domain_gate(tmp_path, dummy_ds):
    """validate() with the quality pass on reports full-utterance STOI/LSD
    (utt_*) and gates on quality_score_audio = quality_score +
    gate_stoi_weight * (1 - utt_stoi); weight 0 restores the mel-only
    gate (VERDICT r3 missing #1)."""
    cfg = stage2_config(tmp_path, max_steps=1, gate_stoi_weight=4.0,
                        quality_utterances=4)
    cfg.set("system.eval_texts", ["Hello."])
    cfg.set("system.eval_text_bucket", 16)
    cfg.set("system.eval_frame_bucket", 64)
    tr = Stage2Trainer(cfg, dataset=dummy_ds)
    assert tr._gate_metric_name() == "quality_score_audio"
    v = tr.validate(n_batches=1)
    assert "utt_stoi" in v and 0.0 <= v["utt_stoi"] <= 1.0
    assert "utt_lsd" in v and np.isfinite(v["utt_lsd"])
    assert v["quality_score_audio"] == pytest.approx(
        v["quality_score"] + 4.0 * (1.0 - v["utt_stoi"]), rel=1e-6)
    tr.close()

    cfg0 = stage2_config(tmp_path / "w0", max_steps=1, gate_stoi_weight=0)
    tr0 = Stage2Trainer(cfg0, dataset=dummy_ds)
    assert tr0._gate_metric_name() == "quality_score"
    tr0.close()


def test_generator_ema(tmp_path, dummy_ds):
    """training.ema_decay: the EMA shadow tracks the generator (between
    init and the live weights), the best checkpoint serves the EMA under
    'generator' (what the gate scored), and resume restores the shadow."""
    cfg = stage2_config(tmp_path, max_steps=2, save_every=2, ema_decay=0.5)
    tr = Stage2Trainer(cfg, dataset=dummy_ds)
    leaf = lambda p: np.asarray(
        jax.tree_util.tree_leaves(p)[0], np.float32)
    init_leaf = leaf(tr.ema_params).copy()
    tr.train()
    ema_leaf, live_leaf = leaf(tr.ema_params), leaf(tr.g_state.params)
    assert not np.allclose(ema_leaf, init_leaf)   # it moved
    assert not np.allclose(ema_leaf, live_leaf)   # but lags the live net
    # best checkpoint: 'generator' must be the EMA (the scored weights)
    tr.save_best_checkpoint(1.0)
    from m2tts_tpu.utils.checkpoint import load_for_inference

    variables, _, _ = load_for_inference(
        cfg.get("paths.checkpoint_dir"), step="best")
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(variables["params"])[0],
                   np.float32), ema_leaf)
    tr.close()
    # resume: the shadow round-trips through the latest checkpoint
    tr2 = Stage2Trainer(stage2_config(tmp_path, max_steps=3, save_every=2,
                                      ema_decay=0.5), dataset=dummy_ds)
    tr2.restore()
    np.testing.assert_allclose(leaf(tr2.ema_params), ema_leaf)
    tr2.close()


def test_adaptive_adv_guard(tmp_path, dummy_ds):
    """training.adaptive_adv_dloss_floor: the fused step scales the
    adversarial weight by clip(d_loss/floor, 0, 1) computed in-graph
    from the current batch's discriminator loss (the r05 blow-up
    mechanism was a saturated D at d_loss 0.007). With a huge floor the
    guard must engage (< 1) and be logged; with the default 0 it must
    be absent entirely."""
    from m2tts_tpu.data.dataset import data_iterator

    cfg = stage2_config(tmp_path / "on", max_steps=1,
                        adaptive_adv_dloss_floor=1e6,
                        adaptive_d_lr_floor=1e6)
    tr = Stage2Trainer(cfg, dataset=dummy_ds)
    it = data_iterator(dummy_ds, 8, tr.buckets, seed=0,
                       audio_samples=tr._max_audio_samples())
    d0 = jax.device_get(tr.d_state.params)
    m = tr.train_step(next(it))
    assert "adv_guard" in m
    g = float(m["adv_guard"])
    assert 0.0 <= g < 1.0
    assert np.isfinite(float(m["total_loss"]))
    # D-throttle: with a huge floor the guard ~ d_loss/1e6 ≈ 0, so the
    # discriminator's update must be ~frozen (grads scaled to nothing)
    d1 = jax.device_get(tr.d_state.params)
    l0 = jax.tree_util.tree_leaves(d0)
    l1 = jax.tree_util.tree_leaves(d1)
    max_delta = max(float(np.max(np.abs(a - b))) for a, b in zip(l0, l1))
    assert max_delta < 1e-5, max_delta
    tr.close()

    cfg0 = stage2_config(tmp_path / "off", max_steps=1)
    tr0 = Stage2Trainer(cfg0, dataset=dummy_ds)
    it0 = data_iterator(dummy_ds, 8, tr0.buckets, seed=0,
                        audio_samples=tr0._max_audio_samples())
    m0 = tr0.train_step(next(it0))
    assert "adv_guard" not in m0
    tr0.close()
