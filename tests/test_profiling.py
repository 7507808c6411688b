"""Profiler subsystem: trace capture around training steps."""

import glob

import jax
import jax.numpy as jnp

from m2tts_tpu.utils.profiling import StepProfiler, annotate_step


def test_disabled_profiler_is_noop():
    prof = StepProfiler(start_step=0)
    for s in range(3):
        with prof.step(s):
            pass
    prof.close()  # must not raise


def test_profiler_captures_trace(tmp_path):
    prof = StepProfiler(start_step=2, num_steps=2, log_dir=str(tmp_path))
    f = jax.jit(lambda x: x * 2 + 1)
    for s in range(6):
        with prof.step(s):
            jax.block_until_ready(f(jnp.ones((8, 8))))
    prof.close()
    traces = glob.glob(str(tmp_path / "**" / "*.xplane.pb"), recursive=True)
    assert traces, "no xplane trace written"


def test_profiler_closes_inflight_trace(tmp_path):
    prof = StepProfiler(start_step=1, num_steps=100, log_dir=str(tmp_path))
    with prof.step(1):
        pass
    prof.close()  # loop ended early while tracing
    traces = glob.glob(str(tmp_path / "**" / "*.xplane.pb"), recursive=True)
    assert traces


def test_from_config_defaults():
    from m2tts_tpu.utils.config import Config

    prof = StepProfiler.from_config(Config({}))
    assert prof._done  # disabled by default


def test_annotate_step_contexts():
    with annotate_step("region"):
        pass
    with annotate_step("region", step=3):
        pass
