"""Tensor-parallel partitioning: specs, placement, and a TP train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from m2tts_tpu.parallel.mesh import make_mesh
from m2tts_tpu.parallel.partition import partition_specs, shard_tree


def _tiny_cfg(batch, mesh_axes):
    from m2tts_tpu.utils.config import Config

    return Config({
        "model": {
            "text_encoder": {"vocab_size": 64, "hidden_dim": 32,
                             "num_layers": 1, "num_heads": 2, "dropout": 0.0},
            "decoder": {"mel_channels": 8, "num_layers": 1},
            "vocoder": {"hidden_channels": 16, "upsample_rates": [4, 4, 2, 2]},
        },
        "training": {"batch_size": batch, "max_steps": 1, "bf16": False,
                     "learning_rate": 1e-4, "warmup_steps": 0,
                     "lr_scheduler": "constant", "log_every": 1,
                     "save_every": 10**9, "validate_every": 10**9, "seed": 0},
        "data": {"buckets": [[32, 64]], "n_mels": 8},
        "system": {"mesh": mesh_axes, "log_metrics": "jsonl"},
        "paths": {"output_dir": "outputs/tp_test",
                  "checkpoint_dir": "outputs/tp_test/ckpt",
                  "log_dir": "outputs/tp_test/logs"},
    })


def test_partition_specs_rules():
    from m2tts_tpu.models import M2TTS

    model = M2TTS(hidden_dim=32, mel_channels=8, vocoder_channels=16,
                  text_encoder_layers=1, decoder_layers=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        max_frames=16, run_vocoder=True)["params"]
    specs = partition_specs(params)
    enc = specs["text_encoder"]["layer0"]
    assert enc["attn"]["qkv"]["kernel"] == P(None, "model")
    assert enc["attn"]["out"]["kernel"] == P("model", None)
    assert enc["ffn"]["fc1"]["kernel"] == P(None, "model")
    assert enc["ffn"]["fc2"]["kernel"] == P("model", None)
    # convs and norms stay replicated
    assert specs["vocoder"]["input_conv"]["conv"]["kernel"] == P()
    assert enc["norm1"]["scale"] == P()


def test_shard_tree_places_on_model_axis():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    tree = {"attn": {"qkv": {"kernel": jnp.zeros((8, 24))}},
            "other": jnp.zeros((5,))}
    placed = shard_tree(tree, mesh)
    qkv_spec = placed["attn"]["qkv"]["kernel"].sharding.spec
    assert qkv_spec == P(None, "model")
    assert placed["other"].sharding.spec == P()


def _run_one_step(mesh_axes, devices):
    from m2tts_tpu.data.dataset import DummyDataset, data_iterator
    from m2tts_tpu.training.trainer import Stage1Trainer

    batch = 4
    mesh = make_mesh(data=mesh_axes["data"], model=mesh_axes.get("model", 1),
                     devices=devices)
    cfg = _tiny_cfg(batch, mesh_axes)
    ds = DummyDataset(size=4 * batch, mel_dim=8, max_text_length=24,
                      max_mel_length=56, seed=0)
    tr = Stage1Trainer(cfg, dataset=ds, mesh=mesh)
    it = data_iterator(ds, batch, tr.buckets, seed=0)
    b = tr._put(next(it))
    rng = jax.random.PRNGKey(7)
    state, losses = tr._train_step(tr.state, b, rng)
    return {k: float(v) for k, v in losses.items()}


def test_tp_step_matches_dp_step():
    """A (2 data x 2 model) step must equal a (4 data x 1) step — TP is a
    layout choice, not a numerics choice."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    devices = jax.devices()[:4]
    dp = _run_one_step({"data": 4, "model": 1}, devices)
    tp = _run_one_step({"data": 2, "model": 2}, devices)
    assert set(dp) == set(tp)
    for k in dp:
        np.testing.assert_allclose(dp[k], tp[k], rtol=2e-4, atol=2e-5,
                                   err_msg=k)
