"""Checkpoint save/restore/rotate/resume + self-describing reload."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models import build_model
from m2tts_tpu.utils.checkpoint import CheckpointManager, load_for_inference
from m2tts_tpu.utils.config import Config, load_config


@pytest.fixture(scope="module")
def small_cfg():
    return Config({
        "model": {
            "text_encoder": {"vocab_size": 64, "hidden_dim": 32,
                             "num_layers": 1, "num_heads": 2, "dropout": 0.0},
            "decoder": {"mel_channels": 16, "num_layers": 1},
            "vocoder": {"hidden_channels": 32},
        },
        "data": {"sample_rate": 22050, "hop_length": 256},
    })


def _init_params(cfg):
    model = build_model(cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)
    return model, params


def test_save_restore_roundtrip(tmp_path, small_cfg):
    model, params = _init_params(small_cfg)
    mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=3)
    state = {"generator": params["params"], "step": 7}
    mgr.save(7, state, config=small_cfg)

    restored, cfg2, step = mgr.restore()
    assert step == 7
    assert cfg2 == small_cfg
    orig = jax.tree_util.tree_leaves(state["generator"])
    back = jax.tree_util.tree_leaves(restored["generator"])
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_rotation_keeps_newest(tmp_path, small_cfg):
    _, params = _init_params(small_cfg)
    mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
    for step in (1, 2, 3):
        mgr.save(step, {"generator": params["params"], "step": step},
                 config=small_cfg)
    assert mgr.all_steps() == [2, 3]
    assert mgr.latest_step() == 3
    mgr.close()


def test_load_for_inference_rebuilds_model(tmp_path, small_cfg):
    model, params = _init_params(small_cfg)
    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(1, {"generator": params["params"], "step": 1}, config=small_cfg)
    mgr.close()

    loaded_params, cfg, step = load_for_inference(tmp_path / "ckpt")
    model2 = build_model(cfg.model)
    out = model2.apply(loaded_params, jnp.ones((1, 8), jnp.int32),
                       jnp.asarray([8]), max_frames=16)
    assert out["mel_output"].shape == (1, 16, 16)


def test_yaml_configs_load():
    for name in ("configs/stage1_poc.yaml", "configs/stage2_quality.yaml"):
        cfg = load_config(name)
        assert {"model", "training", "data", "system", "paths"} <= set(cfg.keys())
        model = build_model(cfg.model)
        assert model.mel_channels in (64, 80)


def test_config_overrides():
    cfg = load_config("configs/stage1_poc.yaml",
                      overrides=["training.batch_size=8",
                                 "model.text_encoder.hidden_dim=32"])
    assert cfg.training.batch_size == 8
    assert cfg.model.text_encoder.hidden_dim == 32
