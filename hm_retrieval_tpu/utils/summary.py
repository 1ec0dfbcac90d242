"""Host-side metric writing: TensorBoard scalars + structured logging.

Analog of the reference's tf.summary default writer + Keras TensorBoard
callback (ref: pkg/modelling/runner.py:60-69, metrics/index_recall.py:75-84).
Backed by tensorboardX when available; degrades to logging-only so the
framework has no hard TF dependency.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

logger = logging.getLogger(__name__)

try:
    from tensorboardX import SummaryWriter as _TBWriter

    _HAVE_TB = True
except Exception:  # pragma: no cover
    _HAVE_TB = False


class MetricWriter:
    """add_scalar/flush/close facade over tensorboardX."""

    def __init__(self, logdir: Optional[str], run_name: Optional[str] = None):
        self._writer = None
        if logdir is not None and _HAVE_TB:
            run = run_name or time.strftime("%Y%m%d-%H%M%S")
            path = os.path.join(logdir, run)
            os.makedirs(path, exist_ok=True)
            self._writer = _TBWriter(logdir=path)
            logger.info("TensorBoard metrics -> %s", path)

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    def add_histogram(self, tag: str, values, step: int) -> None:
        """Weight histograms (the reference's Keras TensorBoard
        ``histogram_freq=1``, ref: pkg/modelling/runner.py:63-67)."""
        if self._writer is not None:
            import numpy as np

            self._writer.add_histogram(
                tag, np.asarray(values).ravel(), step
            )

    def add_params_histograms(self, params, step: int) -> None:
        if self._writer is None:
            return
        import jax

        for path, leaf in jax.tree_util.tree_flatten_with_path(
            params
        )[0]:
            tag = "params/" + "/".join(
                str(getattr(p, "key", getattr(p, "idx", "?")))
                for p in path
            )
            self.add_histogram(tag, leaf, step)

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
            self._writer = None
