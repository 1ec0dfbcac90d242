"""Streaming Recall@K evaluation.

Re-design of ref: pkg/modelling/metrics/index_recall.py:10-85. Per batch the
index returns (B, max_k) retrieved ids; the metric compares against the
(B,) true candidate ids with the same broadcast-equal trick
(ref: index_recall.py:52-58), accumulating hits/seen per K on device and
transferring one scalar per batch. Each test row is one (query,
true-candidate) event, so this is per-transaction hit rate (SURVEY C19
note).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@partial(jax.jit, static_argnames=("ks",))
def _batch_hits(
    retrieved: jax.Array,  # (B, max_k) int ids
    true_ids: jax.Array,   # (B,) int ids
    num_valid: jax.Array,  # scalar: rows beyond this are padding
    ks: tuple,
) -> jax.Array:
    """(len(ks),) hit counts: row i hits at K if true_ids[i] appears in
    retrieved[i, :K] (ref: index_recall.py:52-58). Rows >= num_valid are
    ignored (padded eval tails keep batch shapes static on TPU)."""
    eq = retrieved == true_ids[:, None]  # (B, max_k)
    row_valid = (
        jnp.arange(retrieved.shape[0]) < num_valid
    )  # (B,)
    # cumulative any over the k axis: hit within first K columns
    cum = (jnp.cumsum(eq, axis=1) > 0) & row_valid[:, None]
    return jnp.stack([cum[:, k - 1].sum() for k in ks])


class IndexRecall:
    """Streaming accumulator over evaluation batches
    (ref: IndexRecall, index_recall.py:10-49)."""

    def __init__(self, ks: List[int]):
        if not ks:
            raise ValueError("ks must be non-empty")
        self.ks = tuple(sorted(int(k) for k in ks))
        self.max_k = self.ks[-1]
        self.hits = np.zeros(len(self.ks), np.int64)
        self.seen = 0

    def update(self, retrieved_ids, true_ids, num_valid=None) -> None:
        """``num_valid``: count only the first N rows (padded tail
        batches); defaults to the full batch."""
        retrieved_ids = jnp.asarray(retrieved_ids)
        true_ids = jnp.asarray(true_ids)
        if retrieved_ids.shape[1] < self.max_k:
            raise ValueError(
                f"retrieved width {retrieved_ids.shape[1]} < max k "
                f"{self.max_k}"
            )
        n = (
            retrieved_ids.shape[0] if num_valid is None else int(num_valid)
        )
        self.hits += np.asarray(
            _batch_hits(
                retrieved_ids,
                true_ids,
                jnp.asarray(n, jnp.int32),
                self.ks,
            )
        )
        self.seen += n

    def results(self) -> Dict[int, float]:
        if self.seen == 0:
            return {k: 0.0 for k in self.ks}
        return {
            k: float(h) / self.seen
            for k, h in zip(self.ks, self.hits)
        }

    def reset(self) -> None:
        self.hits[:] = 0
        self.seen = 0

    def log_metric(
        self, epoch: Optional[int], writer=None
    ) -> Dict[int, float]:
        """Log to logger + optional TensorBoard writer
        (ref: index_recall.py:61-85)."""
        res = self.results()
        for k, v in res.items():
            logger.info(
                "Epoch %s | Recall@%d = %.4f", epoch, k, v
            )
            if writer is not None and epoch is not None:
                writer.add_scalar(f"recall_at_{k}", v, epoch)
        return res
