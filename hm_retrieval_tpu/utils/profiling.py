"""Profiler trace window over a step range.

TPU-native analog of the reference's Keras TensorBoard
``profile_batch="20,40"`` hook (ref: pkg/modelling/runner.py:63-67):
captures a jax.profiler trace between two global steps, viewable in
TensorBoard/XProf.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax

logger = logging.getLogger(__name__)


class StepProfiler:
    def __init__(
        self,
        logdir: str,
        window: Optional[Tuple[int, int]],
    ):
        self.logdir = logdir
        self.window = window
        self._active = False

    def on_step(self, step: int) -> None:
        if self.window is None:
            return
        start, stop = self.window
        # >= not ==: callers may observe steps at a stride (chunked
        # dispatch advances global_step by steps_per_dispatch), so an
        # equality test could skip straight past the window start
        if start <= step < stop and not self._active:
            logger.info(
                "Starting profiler trace (steps %d..%d) -> %s",
                start,
                stop,
                self.logdir,
            )
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif step >= stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("Stopped profiler trace at step %d", step)

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
