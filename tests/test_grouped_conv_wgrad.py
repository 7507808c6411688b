"""Exactness of the custom-VJP weight-gradient lowerings
(ops/grouped_conv.py): every variant must produce the same outputs AND
the same parameter/input gradients as XLA's native conv, through the
phase-packed discriminator apply (models/discriminator.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2tts_tpu.models.discriminator import (MultiScaleDiscriminator,
                                            packed_multiscale_apply)


@pytest.fixture(scope="module")
def disc_and_batch():
    disc = MultiScaleDiscriminator()
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 1024))
    params = disc.init(rng, audio)["params"]
    return disc, params, audio


def _loss(params, audio, wgrad):
    logits, feats = packed_multiscale_apply(params, audio, wgrad=wgrad)
    return (sum(jnp.sum(l ** 2) for l in logits)
            + sum(jnp.sum(jnp.abs(f)) for fs in feats for f in fs))


@pytest.mark.parametrize("variant", ["pergroup", "dense"])
def test_wgrad_variant_matches_native(disc_and_batch, variant):
    disc, params, audio = disc_and_batch
    base_val, base_grads = jax.value_and_grad(_loss)(params, audio, "xla")
    val, grads = jax.value_and_grad(_loss)(params, audio, variant)
    np.testing.assert_allclose(val, base_val, rtol=1e-6)
    flat_b = jax.tree_util.tree_leaves_with_path(base_grads)
    flat_v = jax.tree_util.tree_leaves(grads)
    for (path, gb), gv in zip(flat_b, flat_v):
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(gb), rtol=5e-4, atol=5e-4,  # fp reassociation: K=B·T sums
            err_msg=f"{variant} grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("variant", ["pergroup", "dense"])
def test_wgrad_input_gradient_matches(disc_and_batch, variant):
    disc, params, audio = disc_and_batch
    gb = jax.grad(lambda a: _loss(params, a, "xla"))(audio)
    gv = jax.grad(lambda a: _loss(params, a, variant))(audio)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gb),
                               rtol=5e-4, atol=5e-4)
