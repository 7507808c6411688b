"""Training/runtime tracing: jax.profiler device traces + step annotation.

The reference has no profiling subsystem (SURVEY.md §5: closest are tqdm
postfix losses and psutil memory gauges, reference training/train.py:374-395,
src/utils/device.py:152-177). The TPU-native replacement captures real
device traces viewable in TensorBoard / Perfetto (xplane format):

    system:
      profile:
        start_step: 10      # first step to trace (0 = disabled)
        num_steps: 5        # how many steps to capture
        log_dir: outputs/profile

Each traced step is wrapped in a ``StepTraceAnnotation`` so the trace
viewer groups ops per training step. ``annotate_step`` can also be used
standalone around any region.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import jax

logger = logging.getLogger(__name__)


class StepProfiler:
    """Captures a jax.profiler trace for steps [start_step, start_step+n).

    Usage in a training loop::

        prof = StepProfiler.from_config(config)
        for step in ...:
            with prof.step(step):
                state, losses = train_step(...)
        prof.close()

    All methods are no-ops when disabled (start_step == 0), so the hot
    loop pays one integer compare per step.
    """

    def __init__(self, start_step: int = 0, num_steps: int = 5,
                 log_dir: str = "outputs/profile"):
        self.start_step = int(start_step)
        self.num_steps = int(num_steps)
        self.log_dir = str(log_dir)
        self._active = False
        self._done = self.start_step <= 0  # disabled

    @classmethod
    def from_config(cls, config) -> "StepProfiler":
        get = config.get if hasattr(config, "get") else lambda k, d=None: d
        return cls(
            start_step=int(get("system.profile.start_step", 0) or 0),
            num_steps=int(get("system.profile.num_steps", 5) or 5),
            log_dir=str(get("system.profile.log_dir", "outputs/profile")),
        )

    def step(self, step: int):
        """Context manager for one training step."""
        self._maybe_start(step)
        self._maybe_stop(step)
        if self._active:
            return jax.profiler.StepTraceAnnotation("train_step", step_num=step)
        return _NULL_CTX

    def _maybe_start(self, step: int) -> None:
        if self._done or self._active or step < self.start_step:
            return
        Path(self.log_dir).mkdir(parents=True, exist_ok=True)
        jax.profiler.start_trace(self.log_dir)
        self._active = True
        logger.info("profiler: tracing steps %d..%d -> %s", step,
                    step + self.num_steps - 1, self.log_dir)

    def _maybe_stop(self, step: int) -> None:
        if self._active and step >= self.start_step + self.num_steps:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            logger.info("profiler: trace written to %s", self.log_dir)

    def close(self) -> None:
        """Stop an in-flight trace (loop ended early)."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True


class _NullCtx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


_NULL_CTX = _NullCtx()


def annotate_step(name: str, step: Optional[int] = None):
    """Standalone trace annotation for ad-hoc regions."""
    if step is None:
        return jax.profiler.TraceAnnotation(name)
    return jax.profiler.StepTraceAnnotation(name, step_num=step)
