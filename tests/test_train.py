"""Stage-1 trainer: loss decreases, checkpoint/resume, accumulation, DP mesh."""

import jax
import numpy as np
import pytest

from m2tts_tpu.data.dataset import DummyDataset
from m2tts_tpu.training.trainer import Stage1Trainer, make_lr_schedule
from m2tts_tpu.utils.config import Config


def tiny_config(tmp_path, **training_overrides):
    training = {
        "batch_size": 8, "max_steps": 6, "learning_rate": 1e-3,
        "warmup_steps": 2, "gradient_clip_norm": 1.0, "bf16": False,
        "log_every": 2, "save_every": 100, "validate_every": 100,
        "max_checkpoints": 2, "seed": 0,
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
        "data": {"buckets": [[48, 128]], "n_mels": 8},
        "system": {"mesh": {"data": -1}, "log_metrics": "jsonl"},
        "paths": {"output_dir": str(tmp_path / "out"),
                  "checkpoint_dir": str(tmp_path / "out/ckpt"),
                  "log_dir": str(tmp_path / "out/logs")},
    })


@pytest.fixture()
def dummy_ds():
    return DummyDataset(size=64, mel_dim=8, max_text_length=40,
                        max_mel_length=120, seed=0)


def test_lr_schedule_warmup():
    cfg = Config({"learning_rate": 1e-3, "warmup_steps": 10,
                  "max_steps": 100, "lr_scheduler": "cosine"})
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) < 1e-4
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-5)
    assert float(sched(100)) < 1e-4


def test_training_reduces_loss(tmp_path, dummy_ds):
    cfg = tiny_config(tmp_path, max_steps=30, log_every=1)
    trainer = Stage1Trainer(cfg, dataset=dummy_ds)
    first_val = trainer.validate()["total_loss"]
    last = trainer.train()
    final_val = trainer.validate()["total_loss"]
    trainer.close()
    assert np.isfinite(last["total_loss"])
    assert final_val < first_val  # random-data memorization still reduces loss


def test_checkpoint_and_resume(tmp_path, dummy_ds):
    cfg = tiny_config(tmp_path, max_steps=4, save_every=2)
    t1 = Stage1Trainer(cfg, dataset=dummy_ds)
    t1.train()
    assert t1.ckpt.latest_step() == 4
    t1.close()

    cfg2 = tiny_config(tmp_path, max_steps=6, save_every=2)
    t2 = Stage1Trainer(cfg2, dataset=dummy_ds)
    t2.train(resume=True)
    assert t2.step == 6
    t2.close()


def test_gradient_accumulation_actually_accumulates(tmp_path, dummy_ds):
    """Params must change only every k micro-steps (the reference's
    accumulation never accumulated; ours must)."""
    # constant lr: with warmup the first applied update would be lr=0
    cfg = tiny_config(tmp_path, gradient_accumulation_steps=2, max_steps=1,
                      lr_scheduler="constant", warmup_steps=0)
    trainer = Stage1Trainer(cfg, dataset=dummy_ds)
    from m2tts_tpu.data.dataset import data_iterator

    it = data_iterator(dummy_ds, 8, trainer.buckets, seed=0)
    p0 = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    batch = trainer._put(next(it))
    trainer.state, _ = trainer._train_step(trainer.state, batch,
                                           jax.random.PRNGKey(0))
    p1 = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    # after the first micro-step nothing is applied yet
    flat0 = jax.tree_util.tree_leaves(p0)
    flat1 = jax.tree_util.tree_leaves(p1)
    assert all(np.allclose(a, b) for a, b in zip(flat0, flat1))

    batch = trainer._put(next(it))
    trainer.state, _ = trainer._train_step(trainer.state, batch,
                                           jax.random.PRNGKey(1))
    p2 = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    flat2 = jax.tree_util.tree_leaves(p2)
    assert not all(np.allclose(a, b) for a, b in zip(flat0, flat2))
    trainer.close()


def test_oom_recovery_survives_donated_state(tmp_path, dummy_ds):
    """The OOM guard must survive the donating dispatch invalidating
    self.state: simulate a failed step that deletes every state buffer
    (what donation does on the device) and check training continues from
    the snapshot."""
    cfg = tiny_config(tmp_path, max_steps=3, log_every=1)
    trainer = Stage1Trainer(cfg, dataset=dummy_ds)
    real_step = trainer._train_step
    calls = {"n": 0}

    def flaky_step(state, batch, rng):
        calls["n"] += 1
        if calls["n"] == 2:  # second dispatch OOMs after donation
            for leaf in jax.tree_util.tree_leaves(state):
                if hasattr(leaf, "delete"):
                    leaf.delete()
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: simulated OOM")
        return real_step(state, batch, rng)

    trainer._train_step = flaky_step
    last = trainer.train()
    trainer.close()
    assert trainer.step == 3
    assert np.isfinite(last["total_loss"])


def test_data_parallel_mesh_used(tmp_path, dummy_ds):
    trainer = Stage1Trainer(tiny_config(tmp_path, max_steps=2), dataset=dummy_ds)
    assert trainer.mesh.shape["data"] == 8  # virtual CPU mesh from conftest
    trainer.train()
    trainer.close()


def test_dp_grads_match_single_device(tmp_path, dummy_ds):
    """8-way data parallel step == single-device step on the same batch."""
    from m2tts_tpu.parallel.mesh import make_mesh

    cfg = tiny_config(tmp_path, max_steps=1)
    t_dp = Stage1Trainer(cfg, dataset=dummy_ds)
    t_sd = Stage1Trainer(tiny_config(tmp_path / "sd", max_steps=1),
                         dataset=dummy_ds,
                         mesh=make_mesh(1, devices=jax.devices()[:1]))
    from m2tts_tpu.data.dataset import make_batches

    batch = next(make_batches(dummy_ds, 8, t_dp.buckets, seed=5))
    rng = jax.random.PRNGKey(0)
    # disable dropout for determinism across shardings
    t_dp.model, t_sd.model  # same architecture, same init seed
    s_dp, l_dp = t_dp._train_step(t_dp.state, t_dp._put(batch), rng)
    s_sd, l_sd = t_sd._train_step(t_sd.state, t_sd._put(batch), rng)
    np.testing.assert_allclose(float(l_dp["total_loss"]),
                               float(l_sd["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_dp.params),
                    jax.tree_util.tree_leaves(s_sd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    t_dp.close()
    t_sd.close()


def test_validation_dumps_sample_wavs(tmp_path, dummy_ds):
    """Stage-1 validation synthesizes the configured eval texts and dumps
    WAVs (reference train.py:344-368)."""
    cfg = tiny_config(tmp_path, max_steps=2, validate_every=2)
    cfg.set("system.eval_texts", ["Hello."])
    cfg.set("system.eval_text_bucket", 16)
    cfg.set("system.eval_frame_bucket", 64)
    trainer = Stage1Trainer(cfg, dataset=dummy_ds)
    trainer.train()
    trainer.close()
    samples = list((tmp_path / "out" / "samples").glob("sample_step_*_text_0.wav"))
    assert samples, "no sample WAVs dumped at validation"
    logs = (tmp_path / "out" / "logs" / "metrics.jsonl").read_text()
    assert "val_estimated_mos" in logs


def test_build_dataset_datafree_covers_all_buckets(tmp_path):
    """The data-free fallback must span the configured buckets so every
    bucket graph compiles in CI, not just the smallest."""
    from m2tts_tpu.data.dataset import data_iterator
    from m2tts_tpu.training.trainer import build_dataset

    cfg = Config({"data_dir": str(tmp_path / "nodata"), "n_mels": 8,
                  "buckets": [[64, 256], [128, 512], [256, 1000]]})
    ds = build_dataset(cfg)
    buckets = [(64, 256), (128, 512), (256, 1000)]
    seen = set()
    it = data_iterator(ds, 4, buckets, seed=0)
    for _ in range(64):
        b = next(it)
        seen.add((b["phoneme_ids"].shape[1], b["mel"].shape[1]))
        if len(seen) == len(buckets):
            break
    assert seen == set(buckets)


def test_oom_snapshot_refreshed_on_resume_and_rewinds_step(tmp_path, dummy_ds):
    """Resume must refresh the OOM snapshot (not keep random-init params),
    and a rollback must rewind the loop step with the params."""
    cfg = tiny_config(tmp_path, max_steps=4, save_every=2)
    t1 = Stage1Trainer(cfg, dataset=dummy_ds)
    t1.train()
    t1.close()

    t2 = Stage1Trainer(tiny_config(tmp_path, max_steps=4, save_every=100),
                       dataset=dummy_ds)
    t2.train(resume=True)  # max_steps already reached: resume + exit
    snap_state, snap_step = t2._oom_snapshot
    assert snap_step == 4
    # the snapshot holds the RESUMED params, not the __init__ random init
    resumed = jax.device_get(t2.state.params)
    a = snap_state.params["text_encoder"]["embedding"]["embedding"]
    b = resumed["text_encoder"]["embedding"]["embedding"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # simulate a donating dispatch that invalidated the state mid-run
    for leaf in jax.tree_util.tree_leaves(t2.state):
        if hasattr(leaf, "delete"):
            leaf.delete()
    t2.step = 99
    t2._recover_after_oom()
    assert t2.step == 4  # params and counter rewind together
    t2.close()


def test_device_data_cache_trains_and_reduces_loss(tmp_path, dummy_ds):
    """training.device_data_cache: HBM-resident batches, zero per-step
    H2D; training behaves like the streaming path (loss decreases)."""
    cfg = tiny_config(tmp_path, max_steps=20, log_every=5)
    cfg.set("training.device_data_cache", True)
    trainer = Stage1Trainer(cfg, dataset=dummy_ds)
    first = trainer.validate()["total_loss"]
    last = trainer.train()
    final = trainer.validate()["total_loss"]
    trainer.close()
    assert np.isfinite(last["total_loss"])
    assert final < first


def test_device_data_cache_budget_falls_back_to_streaming(tmp_path, dummy_ds):
    cfg = tiny_config(tmp_path, max_steps=1)
    cfg.set("training.device_data_cache", True)
    cfg.set("training.device_data_cache_max_gb", 1e-9)  # force fallback
    trainer = Stage1Trainer(cfg, dataset=dummy_ds)
    assert trainer._device_cached_iterator() is None
    trainer.train()  # streaming fallback still trains
    trainer.close()


def test_best_checkpoint_pinned_and_loadable(tmp_path, dummy_ds):
    """Validation improvement pins a best checkpoint under <ckpt>/best
    (reference best_model.pt), loadable via step='best'."""
    from pathlib import Path

    from m2tts_tpu.utils.checkpoint import load_for_inference

    cfg = tiny_config(tmp_path, max_steps=4, validate_every=2,
                      save_every=100, validate_samples=False)
    trainer = Stage1Trainer(cfg, dataset=dummy_ds)
    trainer.train()
    trainer.close()
    ckpt_dir = cfg.get("paths.checkpoint_dir")
    assert (Path(ckpt_dir) / "best").exists()
    variables, config, step = load_for_inference(ckpt_dir, step="best")
    assert "params" in variables and step in (2, 4)
    assert config is not None


def test_blowup_guard_rewinds_to_snapshot(tmp_path, dummy_ds):
    """Non-finite losses trigger a rewind to the last finite snapshot and
    training continues on a fresh trajectory (observed GAN failure mode:
    finite losses one log interval, NaN the next)."""
    cfg = tiny_config(tmp_path, max_steps=4, log_every=1, save_every=100)
    trainer = Stage1Trainer(cfg, dataset=dummy_ds)
    trainer.max_steps = 2
    trainer.train()
    assert trainer.step == 2
    # poison the live params: every loss from here is NaN until the guard
    # rewinds to the (finite) snapshot taken at init
    trainer.state = trainer.state.replace(params=jax.tree_util.tree_map(
        lambda x: x * np.nan, trainer.state.params))
    trainer.max_steps = 4
    last = trainer.train()
    trainer.close()
    assert trainer._blowups == 1
    assert trainer.step == 4
    assert np.isfinite(last["total_loss"])


def test_blowup_guard_bounded_retries(tmp_path, dummy_ds):
    """After training.max_loss_blowups rewinds the guard raises instead of
    looping forever (the snapshot itself could be the problem)."""
    cfg = tiny_config(tmp_path, max_steps=2, log_every=1, save_every=100,
                      max_loss_blowups=0)
    trainer = Stage1Trainer(cfg, dataset=dummy_ds)
    nan_params = jax.tree_util.tree_map(lambda x: x * np.nan,
                                        trainer.state.params)
    trainer.state = trainer.state.replace(params=nan_params)
    # poison the snapshot too: any rewind would re-enter the blow-up
    trainer._oom_snapshot = (jax.device_get(trainer.state), 0)
    with pytest.raises(RuntimeError, match="non-finite"):
        trainer.train()
    trainer.close()


def test_blowup_overlimit_restores_snapshot_before_raise(tmp_path, dummy_ds):
    """When the rewind budget is exhausted, the guard restores the last
    FINITE snapshot before raising, so the finally-save in train()
    persists recoverable params instead of the exploded state."""
    cfg = tiny_config(tmp_path, max_steps=2, log_every=1, save_every=100,
                      max_loss_blowups=0)
    trainer = Stage1Trainer(cfg, dataset=dummy_ds)
    finite_snap = jax.device_get(trainer.state)
    trainer._oom_snapshot = (finite_snap, 5)
    trainer.state = trainer.state.replace(params=jax.tree_util.tree_map(
        lambda x: x * np.nan, trainer.state.params))
    trainer.step = 9
    with pytest.raises(RuntimeError, match="non-finite"):
        trainer._recover_after_blowup()
    assert trainer.step == 5
    leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    trainer.close()


def test_save_checkpoint_refuses_nonfinite_params(tmp_path, dummy_ds):
    """An undetected blow-up between log intervals must not poison the
    on-disk latest checkpoint or the rewind snapshot."""
    cfg = tiny_config(tmp_path, max_steps=2, log_every=1, save_every=100)
    trainer = Stage1Trainer(cfg, dataset=dummy_ds)
    trainer.max_steps = 2
    trainer.train()  # one good checkpoint at step 2 via the finally-save
    good_snapshot_step = trainer._oom_snapshot[1]
    trainer.state = trainer.state.replace(params=jax.tree_util.tree_map(
        lambda x: x * np.nan, trainer.state.params))
    trainer.step = 3
    trainer.save_checkpoint()  # must refuse
    assert trainer._oom_snapshot[1] == good_snapshot_step
    assert trainer.ckpt.latest_step() != 3
    trainer.close()
