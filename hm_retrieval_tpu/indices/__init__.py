"""Retrieval indices.

- BruteForceIndex: exact top-k (ref: pkg/modelling/indices/brute_force.py)
- QuantizedIndex: int8 scan + fp32 rescore ANN (beyond parity)
- StaticIndex: popularity baseline (ref: pkg/modelling/indices/static_index.py)
- DistributedBruteForceIndex / DistributedQuantizedIndex: the same two
  families with the catalog row-sharded over a device mesh
  (indices/distributed.py)
"""

import json
import os

from hm_retrieval_tpu.indices.brute_force import BruteForceIndex
from hm_retrieval_tpu.indices.distributed import (
    DISTRIBUTED_INDEX_TYPES,
    DistributedBruteForceIndex,
    DistributedQuantizedIndex,
    load_distributed_index,
)
from hm_retrieval_tpu.indices.quantized import QuantizedIndex
from hm_retrieval_tpu.indices.static_index import StaticIndex

INDEX_TYPES = {
    "brute_force": BruteForceIndex,
    "quantized": QuantizedIndex,
    # the popularity baseline artifact loads through the same
    # dispatcher (ref: pkg/modelling/indices/static_index.py)
    "static": StaticIndex,
}


def load_index(dirpath: str):
    """Load whichever index type was saved at ``dirpath`` (dispatches on
    meta.json's "type"; pre-dispatch artifacts default to brute_force)."""
    with open(os.path.join(dirpath, "meta.json")) as f:
        meta = json.load(f)
    kind = meta.get("type", "brute_force")
    if kind not in INDEX_TYPES:
        raise ValueError(
            f"unknown index type {kind!r} at {dirpath} "
            f"(expected one of {sorted(INDEX_TYPES)})"
        )
    return INDEX_TYPES[kind].load(dirpath)


__all__ = [
    "BruteForceIndex",
    "QuantizedIndex",
    "StaticIndex",
    "DistributedBruteForceIndex",
    "DistributedQuantizedIndex",
    "INDEX_TYPES",
    "DISTRIBUTED_INDEX_TYPES",
    "load_index",
    "load_distributed_index",
]
