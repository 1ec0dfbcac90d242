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
        self._done = False

    def on_step(self, step: int) -> None:
        if self.window is None:
            return
        start, stop = self.window
        # Threshold tests, not equality: callers may observe steps at a
        # stride (chunked dispatch advances global_step by
        # steps_per_dispatch), so the counter can jump past `start` —
        # or past the ENTIRE window. The trace starts at the first
        # observed step >= start and stops at the NEXT observed step
        # >= stop, so a stride wider than the window still captures one
        # dispatch's worth of trace instead of none.
        if not self._active and not self._done and step >= start:
            logger.info(
                "Starting profiler trace (steps %d..%d) -> %s",
                start,
                stop,
                self.logdir,
            )
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif self._active and step >= stop:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            logger.info("Stopped profiler trace at step %d", step)

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
        self._done = True  # a stray on_step can't reopen a trace
