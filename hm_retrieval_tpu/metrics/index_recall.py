"""Streaming Recall@K evaluation.

Re-design of ref: pkg/modelling/metrics/index_recall.py:10-85. Per batch the
index returns (B, max_k) retrieved ids; the metric compares against the
(B,) true candidate ids with the same broadcast-equal trick
(ref: index_recall.py:52-58), accumulating hits/seen per K on device and
transferring one scalar per batch. Each test row is one (query,
true-candidate) event, so this is per-transaction hit rate (SURVEY C19
note).

Multi-host (no reference analog — SURVEY §2.9/§5.8): two composable
mechanisms:

- ``valid_mask``: per-row validity instead of a leading-rows count, for
  lockstep global-batch eval where each host pads its own tail of the
  assembled batch (padding is then interleaved, not trailing);
- ``cross_process=True``: hosts that evaluated disjoint local shards sum
  their {hits, seen} once at ``results()`` via a process allgather.
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
    retrieved: jax.Array,   # (B, max_k) int ids
    true_ids: jax.Array,    # (B,) int ids
    row_valid: jax.Array,   # (B,) bool: padded rows excluded
    ks: tuple,
) -> jax.Array:
    """(len(ks) + 1,) [hit counts per K..., valid rows]: row i hits at K
    if true_ids[i] appears in retrieved[i, :K]
    (ref: index_recall.py:52-58)."""
    eq = retrieved == true_ids[:, None]  # (B, max_k)
    # cumulative any over the k axis: hit within first K columns
    cum = (jnp.cumsum(eq, axis=1) > 0) & row_valid[:, None]
    counts = jnp.stack([cum[:, k - 1].sum() for k in ks])
    return jnp.concatenate(
        [counts, row_valid.sum()[None].astype(counts.dtype)]
    )


class IndexRecall:
    """Streaming accumulator over evaluation batches
    (ref: IndexRecall, index_recall.py:10-49).

    ``cross_process``: sum {hits, seen} over every JAX process at
    ``results()`` — for multi-host runs where each host streamed only
    its own test shards. (Lockstep global-batch eval does NOT want
    this: there every host already computes the global totals.)
    """

    def __init__(self, ks: List[int], cross_process: bool = False):
        if not ks:
            raise ValueError("ks must be non-empty")
        self.ks = tuple(sorted(int(k) for k in ks))
        self.max_k = self.ks[-1]
        self.hits = np.zeros(len(self.ks), np.int64)
        self.seen = 0
        self.cross_process = bool(cross_process)

    def update(
        self,
        retrieved_ids,
        true_ids,
        num_valid=None,
        valid_mask=None,
    ) -> None:
        """``num_valid``: count only the first N rows (padded tail
        batches); ``valid_mask``: per-row (B,) bool validity (global-
        batch eval, where each host's padding is interleaved). At most
        one of the two; defaults to the full batch."""
        if num_valid is not None and valid_mask is not None:
            raise ValueError(
                "pass num_valid or valid_mask, not both"
            )
        retrieved_ids = jnp.asarray(retrieved_ids)
        true_ids = jnp.asarray(true_ids)
        if retrieved_ids.shape[1] < self.max_k:
            raise ValueError(
                f"retrieved width {retrieved_ids.shape[1]} < max k "
                f"{self.max_k}"
            )
        if valid_mask is None:
            n = (
                retrieved_ids.shape[0]
                if num_valid is None
                else int(num_valid)
            )
            valid_mask = (
                jnp.arange(retrieved_ids.shape[0]) < n
            )
        else:
            valid_mask = jnp.asarray(valid_mask, bool)
        out = np.asarray(
            _batch_hits(
                retrieved_ids,
                true_ids,
                valid_mask,
                self.ks,
            )
        )
        self.hits += out[:-1]
        self.seen += int(out[-1])

    def _totals(self):
        hits, seen = self.hits, self.seen
        if self.cross_process and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            local = np.concatenate(
                [hits, [seen]]
            ).astype(np.int64)
            gathered = np.asarray(
                multihost_utils.process_allgather(local)
            )  # (P, len(ks)+1)
            tot = gathered.sum(axis=0)
            hits, seen = tot[:-1], int(tot[-1])
        return hits, seen

    def results(self) -> Dict[int, float]:
        hits, seen = self._totals()
        if seen == 0:
            return {k: 0.0 for k in self.ks}
        return {
            k: float(h) / seen for k, h in zip(self.ks, hits)
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
