"""Shared catalog-collection loop for index builders.

All index families build the same way (ref: pkg/modelling/runner.py:88-93
embeds the catalog in batches, brute_force.py:31-52 materializes it):
embed every candidate batch with the candidate tower at a FIXED padded
batch size (so the tower compiles exactly once), trim each tail back to
its true row count, and concatenate ids + embeddings on the host.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Tuple

import jax
import numpy as np

Batch = Dict[str, jax.Array]


def collect_catalog(
    candidate_id_col: str,
    embed_fn: Callable[[Batch], jax.Array],
    batches: Iterable[Batch],
    batch_size: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns host ``(identifiers (N,), embeddings (N, E))``."""
    ids_parts, emb_parts = [], []
    for batch in batches:
        n = len(batch[candidate_id_col])
        if n < batch_size:  # pad the tail batch (axis 0), trim after

            def _pad(v):
                v = np.asarray(v)
                widths = [(0, batch_size - n)] + [(0, 0)] * (
                    v.ndim - 1
                )
                return np.pad(v, widths)

            batch = {key: _pad(v) for key, v in batch.items()}
        emb = np.asarray(embed_fn(batch))[:n]
        ids_parts.append(np.asarray(batch[candidate_id_col])[:n])
        emb_parts.append(emb)
    return np.concatenate(ids_parts), np.concatenate(emb_parts)
