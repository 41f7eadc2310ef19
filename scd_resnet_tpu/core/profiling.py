"""Profiling hooks — first-class runtime observability.

The reference has no profiler at all (SURVEY.md §5: runtime observability
was a tqdm bar). Here the training loop can capture device traces with
``jax.profiler`` for any step window, controlled by env vars so no code
change is needed:

  SCD_PROFILE_DIR=/tmp/trace SCD_PROFILE_START=100 SCD_PROFILE_STEPS=5 \
      python train.py exp.json

The resulting trace opens in TensorBoard / Perfetto.
"""

from __future__ import annotations

import os
from typing import Optional


class StepProfiler:
    """Starts/stops a jax.profiler trace around a configured step window."""

    def __init__(self, trace_dir: Optional[str] = None,
                 start_step: Optional[int] = None, num_steps: int = 5):
        self.trace_dir = trace_dir or os.environ.get("SCD_PROFILE_DIR")
        env_start = os.environ.get("SCD_PROFILE_START")
        self.start_step = (
            start_step if start_step is not None
            else int(env_start) if env_start else None
        )
        self.num_steps = int(os.environ.get("SCD_PROFILE_STEPS", num_steps))
        self._active = False

    @property
    def enabled(self) -> bool:
        return bool(self.trace_dir) and self.start_step is not None

    def step(self, it: int) -> None:
        """Call once per training iteration."""
        if not self.enabled:
            return
        import jax

        if not self._active and it == self.start_step:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif self._active and it >= self.start_step + self.num_steps:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
