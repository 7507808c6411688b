"""Numerical parity vs the PyTorch reference model.

Builds the reference M2TTSModel (imported from /root/reference, torch CPU),
converts its weights with m2tts_tpu.utils.torch_compat, and asserts our
jitted forward pass reproduces the reference outputs on identical inputs —
the mel-space parity the rebuild is judged on. The reference itself ships
no such test.
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_model():
    import torch

    sys.path.insert(0, str(REFERENCE_ROOT / "src"))
    try:
        from models.tts_model import M2TTSModel  # type: ignore
    finally:
        sys.path.pop(0)
    torch.manual_seed(1234)
    model = M2TTSModel()  # stage-1 defaults: 64d, 2+2 layers, 128ch vocoder
    model.eval()
    return model


@pytest.fixture(scope="module")
def our_model_and_params(ref_model):
    import jax

    from m2tts_tpu.models import M2TTS
    from m2tts_tpu.utils.torch_compat import convert_reference_state_dict

    model = M2TTS(duration_norm="batch")
    params = {"params": convert_reference_state_dict(ref_model.state_dict())}
    # sanity: converted tree has the exact structure init would produce
    import jax.numpy as jnp

    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                      max_frames=16, run_vocoder=True)
    init_shapes = jax.tree_util.tree_map(lambda x: x.shape, init)
    conv_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert init_shapes == conv_shapes
    return model, params


def _inputs(rng, B=2, S=24):
    ids = rng.integers(0, 42, size=(B, S)).astype(np.int32)
    lengths = np.asarray([S, S - 7], dtype=np.int32)
    durations = rng.integers(1, 5, size=(B, S)).astype(np.float32)
    return ids, lengths, durations


def test_forward_parity(ref_model, our_model_and_params, rng):
    import torch
    import jax.numpy as jnp

    model, params = our_model_and_params
    ids, lengths, durations = _inputs(rng)
    T = int(durations.sum(axis=1).max())

    with torch.no_grad():
        ref = ref_model(
            torch.from_numpy(ids).long(), torch.from_numpy(lengths).long(),
            torch.from_numpy(durations), max_target_length=T)

    ours = model.apply(params, jnp.asarray(ids), jnp.asarray(lengths),
                       jnp.asarray(durations), max_frames=T, run_vocoder=True)

    np.testing.assert_allclose(
        np.asarray(ours["encoder_output"]), ref["encoder_output"].numpy(),
        atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours["duration_pred"]), ref["duration_pred"].numpy(),
        atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours["regulated_output"]), ref["regulated_output"].numpy(),
        atol=2e-5, rtol=1e-4)

    mel_ref = ref["mel_output"].numpy()
    mel_ours = np.asarray(ours["mel_output"])
    mel_mae = np.abs(mel_ours - mel_ref).mean()
    # f32 reassociation floor; host-dependent (torch SIMD dispatch and
    # XLA:CPU codegen both change with the CPU's feature set — measured
    # 0.9e-5 and 1.07e-5 on two different VMs for identical code), so the
    # bound matches the 2e-5 tolerance class of the asserts above.
    assert mel_mae < 2e-5, f"mel MAE vs reference: {mel_mae}"

    # reference eval-mode forward also runs the vocoder (audio tolerance is
    # looser than mel: fp reassociation through the 64x tconv stack)
    audio_ref = ref["audio_output"].numpy()  # [B, 1, samples]
    audio_ours = np.asarray(ours["audio_output"])[..., 0]  # [B, samples]
    np.testing.assert_allclose(audio_ours, audio_ref[:, 0], atol=2e-4)


def test_inference_parity_with_duration_scale(ref_model, our_model_and_params, rng):
    """Full inference() path incl. the duration_scale re-regulation."""
    import torch
    import jax
    import jax.numpy as jnp

    model, params = our_model_and_params
    ids = rng.integers(0, 42, size=(1, 16)).astype(np.int32)
    lengths = np.asarray([16], dtype=np.int32)
    scale = 1.5

    with torch.no_grad():
        mel_ref, audio_ref = ref_model.inference(
            torch.from_numpy(ids).long(), torch.from_numpy(lengths).long(),
            duration_scale=scale)
    T = mel_ref.shape[1]

    fn = jax.jit(lambda p, i, l: model.apply(
        p, i, l, duration_scale=scale, max_frames=T, method=model.synthesize))
    ours = fn(params, jnp.asarray(ids), jnp.asarray(lengths))

    mel_mae = np.abs(np.asarray(ours["mel_output"]) - mel_ref.numpy()).mean()
    assert mel_mae < 1e-5, f"inference mel MAE: {mel_mae}"
    np.testing.assert_allclose(
        np.asarray(ours["audio_output"])[..., 0], audio_ref.numpy()[:, 0],
        atol=5e-5)


def test_stage2_config_parity(rng):
    """Parity holds for the larger stage-2 architecture too."""
    import torch
    import jax.numpy as jnp

    sys.path.insert(0, str(REFERENCE_ROOT / "src"))
    try:
        from models.tts_model import M2TTSModel  # type: ignore
    finally:
        sys.path.pop(0)

    from m2tts_tpu.models import M2TTS
    from m2tts_tpu.utils.torch_compat import convert_reference_state_dict

    torch.manual_seed(7)
    ref = M2TTSModel(hidden_dim=96, mel_channels=80, text_encoder_layers=3,
                     decoder_layers=3, vocoder_channels=256)
    ref.eval()
    model = M2TTS(hidden_dim=96, mel_channels=80, text_encoder_layers=3,
                  decoder_layers=3, vocoder_channels=256,
                  duration_norm="batch")
    params = {"params": convert_reference_state_dict(
        ref.state_dict(), text_encoder_layers=3, decoder_layers=3)}

    ids, lengths, durations = _inputs(rng, B=2, S=12)
    T = int(durations.sum(axis=1).max())
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(ids).long(),
                      torch.from_numpy(lengths).long(),
                      torch.from_numpy(durations), max_target_length=T)
    ours = model.apply(params, jnp.asarray(ids), jnp.asarray(lengths),
                       jnp.asarray(durations), max_frames=T)
    mel_mae = np.abs(np.asarray(ours["mel_output"])
                     - out_ref["mel_output"].numpy()).mean()
    assert mel_mae < 1e-5, f"stage2 mel MAE: {mel_mae}"
