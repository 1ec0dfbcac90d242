"""Mesh-sharded retrieval indices: the distributed product surface.

The reference serves retrieval from ONE device: the whole (N, E) catalog
is materialized as a single Keras weight and scored with one ``top_k``
(ref: pkg/modelling/indices/brute_force.py:31-83). At production scale the
catalog outgrows a chip's HBM, so the TPU-native answer (SURVEY §2.9
"distributed top-k retrieval") row-shards the catalog over the mesh's
model axis and merges per-shard leaderboards with one small all-gather —
communication O(S * B * k), never O(B * N).

These classes wrap parallel/distributed_topk.py behind the SAME duck-typed
API as the single-device pair (``k`` / ``num_candidates`` /
``topk_from_embeddings`` / ``query`` / ``save`` / ``load`` /
``build_from_batches``), so ``IndexRecall``, the runners, and
``RetrievalService`` can use either interchangeably — this is what turns
the distributed layer from a library into a product feature:

- ``DistributedBruteForceIndex``: exact; per-shard scoring via XLA
  (dot + lax.top_k) or the streaming Pallas bin-max kernel.
- ``DistributedQuantizedIndex``: int8 shards (1/4 HBM traffic), per-shard
  oversampled survivor selection, optional exact fp32 rescore BEFORE the
  merge so the merged ordering is exact over the surviving rows.

Queries are sharded ``P("data")`` (DP over query rows x MP over catalog
rows); batches whose row count doesn't divide the data axis are padded
here and sliced after. ``save`` writes the single-device artifact format
(``type: brute_force`` / ``type: quantized`` + a ``distributed`` marker),
so an index built on a pod can be loaded by ``load_index`` on one chip
and vice versa.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Callable, Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from hm_retrieval_tpu.parallel.distributed_topk import (
    make_distributed_quantized_topk,
    make_distributed_topk,
    shard_candidates,
    shard_candidates_quantized,
)
from hm_retrieval_tpu.parallel.mesh import DATA_AXIS

logger = logging.getLogger(__name__)

Batch = Dict[str, jax.Array]


from hm_retrieval_tpu.indices.builder import (  # noqa: E402
    collect_catalog as _collect_batches,
)


def _validate(k: int, identifiers: np.ndarray, embeddings: np.ndarray):
    if k <= 0:
        raise ValueError("k must be positive")
    if identifiers.ndim != 1 or embeddings.ndim != 2:
        raise ValueError("identifiers must be (N,), embeddings (N, E)")
    if len(identifiers) != len(embeddings):
        raise ValueError("identifiers and embeddings length mismatch")
    if len(identifiers) < k:
        raise ValueError(
            f"k={k} exceeds number of candidates {len(identifiers)}"
        )


class _DistributedIndexBase:
    """Shared query-padding + persistence plumbing."""

    mesh = None
    k = 0
    num_candidates = 0

    def _pad_queries(self, q):
        """Pad the query batch to a multiple of the data-axis size (the
        shard_map splits rows P("data")); returns (padded, real_B)."""
        d = self.mesh.shape[DATA_AXIS]
        b = q.shape[0]
        rem = b % d
        if rem == 0:
            return q, b
        q = jnp.concatenate(
            [q, jnp.zeros((d - rem, q.shape[1]), q.dtype)], axis=0
        )
        return q, b

    def query(
        self,
        query_fn: Callable[[Batch], jax.Array],
        batch: Batch,
    ) -> jax.Array:
        """Embed queries, score over the sharded catalog, select:
        (B, k) int ids (ref: brute_force.py:108-114 at sharded scale)."""
        _, ids = self.topk_from_embeddings(query_fn(batch))
        return ids

    def topk_from_embeddings(self, query_embeddings):  # pragma: no cover
        raise NotImplementedError


class DistributedBruteForceIndex(_DistributedIndexBase):
    """Exact top-k over a catalog row-sharded across the mesh's model
    axis (the sharded-scale analog of
    ref: pkg/modelling/indices/brute_force.py:54-83).

    Parameters
    ----------
    k / identifiers / embeddings:
        Same contract as BruteForceIndex: (N,) int ids, (N, E) fp32.
    mesh:
        jax.sharding.Mesh with ("data", "model") axes (parallel.make_mesh).
        The catalog is sharded over "model"; queries over "data".
    method:
        "xla" (per-shard dot + lax.top_k), "pallas" (streaming bin-max
        kernel per shard; TPU, or ``interpret=True`` for tests), or
        "auto" (pallas on TPU when a feasible bin layout exists).
    """

    def __init__(
        self,
        k: int,
        identifiers: np.ndarray,
        embeddings,
        *,
        mesh,
        method: str = "auto",
        compute_dtype=None,
        interpret: bool = False,
    ):
        if mesh is None:
            raise ValueError("DistributedBruteForceIndex needs a mesh")
        identifiers = np.asarray(identifiers)
        embeddings = np.asarray(embeddings, np.float32)
        _validate(k, identifiers, embeddings)
        if method not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown method {method!r}")
        if method == "auto":
            if jax.default_backend() == "tpu":
                from hm_retrieval_tpu.ops.pallas_retrieval import (
                    DEFAULT_Q_BLOCK,
                    pick_bins,
                )

                # +1: the kernel folds the pad-row bias in as an extra
                # feature column (see make_distributed_topk)
                feasible = pick_bins(
                    DEFAULT_Q_BLOCK, embeddings.shape[1] + 1, k, 2
                )
                method = "pallas" if feasible is not None else "xla"
            else:
                method = "xla"
        self.k = int(k)
        self.num_candidates = len(identifiers)
        self.mesh = mesh
        self.method = method
        self._host_identifiers = identifiers.astype(np.int32)
        self._host_embeddings = embeddings
        self._emb, self._ids, self._bias = shard_candidates(
            embeddings, self._host_identifiers, mesh
        )
        self._fn = jax.jit(
            make_distributed_topk(
                mesh,
                self.k,
                method=method,
                interpret=interpret,
                compute_dtype=compute_dtype,
                data_sharded_queries=True,
            )
        )
        logger.info(
            "Distributed brute-force index: %d candidates over mesh %s "
            "(method=%s)",
            self.num_candidates,
            dict(mesh.shape),
            method,
        )

    @classmethod
    def build_from_batches(
        cls,
        k: int,
        candidate_id_col: str,
        embed_fn: Callable[[Batch], jax.Array],
        batches: Iterable[Batch],
        batch_size: int,
        **kwargs,
    ) -> "DistributedBruteForceIndex":
        ids, emb = _collect_batches(
            candidate_id_col, embed_fn, batches, batch_size
        )
        return cls(k, ids, emb, **kwargs)

    def topk_from_embeddings(self, query_embeddings: jax.Array):
        """(B, E) query embeddings -> ((B, k) scores, (B, k) int ids)."""
        q, b = self._pad_queries(query_embeddings)
        scores, ids = self._fn(q, self._emb, self._ids, self._bias)
        return scores[:b], ids[:b]

    def to_local(self, method: str = "auto"):
        """Single-device BruteForceIndex over the same catalog (for
        export paths that need the replicated layout)."""
        from hm_retrieval_tpu.indices.brute_force import BruteForceIndex

        return BruteForceIndex(
            self.k,
            self._host_identifiers,
            self._host_embeddings,
            method=method,
        )

    def save(self, dirpath: str) -> None:
        """Single-device-compatible artifact (loadable by ``load_index``
        anywhere) + a ``distributed`` marker."""
        os.makedirs(dirpath, exist_ok=True)
        np.savez(
            os.path.join(dirpath, "index.npz"),
            identifiers=self._host_identifiers,
            embeddings=self._host_embeddings,
        )
        with open(os.path.join(dirpath, "meta.json"), "w") as f:
            json.dump(
                {
                    "k": self.k,
                    "type": "brute_force",
                    "method": "auto",
                    "recall_target": 0.95,
                    "distributed": True,
                    "distributed_method": self.method,
                },
                f,
            )
        logger.info(
            "Saved distributed brute-force index to %s", dirpath
        )

    @classmethod
    def load(
        cls, dirpath: str, *, mesh, **kwargs
    ) -> "DistributedBruteForceIndex":
        with open(os.path.join(dirpath, "meta.json")) as f:
            meta = json.load(f)
        with np.load(os.path.join(dirpath, "index.npz")) as z:
            return cls(
                meta["k"],
                z["identifiers"],
                z["embeddings"],
                mesh=mesh,
                method=kwargs.pop(
                    "method", meta.get("distributed_method", "auto")
                ),
                **kwargs,
            )


class DistributedQuantizedIndex(_DistributedIndexBase):
    """Int8 quantized scan over a row-sharded catalog (the distributed
    form of indices/quantized.py). Each shard selects ``oversample * k``
    survivors from its int8 rows, exactly rescored against its fp32 rows
    (when ``rescore``), then one all-gather merges the per-shard
    leaderboards.

    ``rescore=False`` drops the fp32 shards entirely — each device holds
    1/4 of fp32 bytes / S rows, the layout that fits a catalog 4x too big
    for the slice.
    """

    def __init__(
        self,
        k: int,
        identifiers: np.ndarray,
        embeddings,
        *,
        mesh,
        oversample: int = 4,
        rescore: bool = True,
        recall_target: float = 0.95,
        method: str = "auto",
        pallas_rounds: int = 1,
        pallas_fold: int = None,
        interpret: bool = False,
    ):
        if mesh is None:
            raise ValueError("DistributedQuantizedIndex needs a mesh")
        if oversample < 1:
            raise ValueError("oversample must be >= 1")
        if not 0.0 < recall_target <= 1.0:
            raise ValueError("recall_target must be in (0, 1]")
        if method not in ("auto", "scan", "pallas"):
            raise ValueError(f"unknown method {method!r}")
        identifiers = np.asarray(identifiers)
        embeddings = np.asarray(embeddings, np.float32)
        _validate(k, identifiers, embeddings)
        if method == "auto":
            method = (
                "pallas" if jax.default_backend() == "tpu" else "scan"
            )
        self.k = int(k)
        self.num_candidates = len(identifiers)
        self.mesh = mesh
        self.method = method
        self.oversample = int(oversample)
        self.rescore = bool(rescore)
        self.recall_target = float(recall_target)
        self.pallas_rounds = int(pallas_rounds)
        self.pallas_fold = (
            None if pallas_fold is None else int(pallas_fold)
        )
        self._host_identifiers = identifiers.astype(np.int32)
        self._host_embeddings = embeddings
        self._placed = shard_candidates_quantized(
            embeddings, self._host_identifiers, mesh, keep_fp32=rescore
        )
        self._fn = jax.jit(
            make_distributed_quantized_topk(
                mesh,
                self.k,
                oversample=oversample,
                recall_target=recall_target,
                method=method,
                interpret=interpret,
                pallas_rounds=pallas_rounds,
                pallas_fold=pallas_fold,
                data_sharded_queries=True,
            )
        )
        logger.info(
            "Distributed quantized index: %d candidates over mesh %s "
            "(method=%s, rescore=%s)",
            self.num_candidates,
            dict(mesh.shape),
            method,
            rescore,
        )

    @classmethod
    def build_from_batches(
        cls,
        k: int,
        candidate_id_col: str,
        embed_fn: Callable[[Batch], jax.Array],
        batches: Iterable[Batch],
        batch_size: int,
        **kwargs,
    ) -> "DistributedQuantizedIndex":
        ids, emb = _collect_batches(
            candidate_id_col, embed_fn, batches, batch_size
        )
        return cls(k, ids, emb, **kwargs)

    def topk_from_embeddings(self, query_embeddings: jax.Array):
        """(B, E) query embeddings -> ((B, k) scores, (B, k) int ids)."""
        q, b = self._pad_queries(query_embeddings)
        scores, ids = self._fn(q, *self._placed)
        return scores[:b], ids[:b]

    def to_local(self, **kwargs):
        """Single-device QuantizedIndex over the same catalog."""
        from hm_retrieval_tpu.indices.quantized import QuantizedIndex

        kwargs.setdefault("oversample", self.oversample)
        kwargs.setdefault("rescore", self.rescore)
        kwargs.setdefault("recall_target", self.recall_target)
        return QuantizedIndex(
            self.k,
            self._host_identifiers,
            self._host_embeddings,
            **kwargs,
        )

    def save(self, dirpath: str) -> None:
        """QuantizedIndex-compatible artifact + ``distributed`` marker.
        With ``rescore=False`` the fp32 table is NOT stored; load
        reconstructs embeddings as codes*scales (requantization of which
        reproduces the codes exactly)."""
        from hm_retrieval_tpu.indices.quantized import quantize_rows

        os.makedirs(dirpath, exist_ok=True)
        codes, scales = quantize_rows(self._host_embeddings)
        arrays = {
            "identifiers": self._host_identifiers,
            "codes": codes,
            "scales": scales,
        }
        if self.rescore:
            arrays["embeddings"] = self._host_embeddings
        np.savez(os.path.join(dirpath, "index.npz"), **arrays)
        with open(os.path.join(dirpath, "meta.json"), "w") as f:
            json.dump(
                {
                    "k": self.k,
                    "type": "quantized",
                    "oversample": self.oversample,
                    "rescore": self.rescore,
                    "chunk": 65536,
                    "recall_target": self.recall_target,
                    "method": "auto",
                    "pallas_rounds": self.pallas_rounds,
                    "pallas_fold": self.pallas_fold,
                    "distributed": True,
                    "distributed_method": self.method,
                },
                f,
            )
        logger.info("Saved distributed quantized index to %s", dirpath)

    @classmethod
    def load(
        cls, dirpath: str, *, mesh, **kwargs
    ) -> "DistributedQuantizedIndex":
        with open(os.path.join(dirpath, "meta.json")) as f:
            meta = json.load(f)
        with np.load(os.path.join(dirpath, "index.npz")) as z:
            if "embeddings" in z:
                emb = z["embeddings"]
            else:
                # rescore=False artifact: the int8 codes ARE the
                # catalog; dequantize (requantization is lossless here)
                emb = z["codes"].astype(np.float32) * z["scales"][
                    :, None
                ]
            kwargs.setdefault("oversample", meta.get("oversample", 4))
            kwargs.setdefault(
                "rescore", meta.get("rescore", True) and "embeddings" in z
            )
            kwargs.setdefault(
                "recall_target", meta.get("recall_target", 0.95)
            )
            kwargs.setdefault(
                "pallas_rounds", meta.get("pallas_rounds", 1)
            )
            kwargs.setdefault(
                "pallas_fold", meta.get("pallas_fold")
            )
            kwargs.setdefault(
                "method", meta.get("distributed_method", "auto")
            )
            return cls(
                meta["k"], z["identifiers"], emb, mesh=mesh, **kwargs
            )


DISTRIBUTED_INDEX_TYPES = {
    "brute_force": DistributedBruteForceIndex,
    "quantized": DistributedQuantizedIndex,
}


def load_distributed_index(dirpath: str, mesh, **kwargs):
    """Load whichever index type was saved at ``dirpath`` and place it
    sharded over ``mesh`` (the distributed counterpart of
    ``indices.load_index``; artifacts are interchangeable)."""
    with open(os.path.join(dirpath, "meta.json")) as f:
        meta = json.load(f)
    kind = meta.get("type", "brute_force")
    if kind not in DISTRIBUTED_INDEX_TYPES:
        raise ValueError(
            f"unknown index type {kind!r} at {dirpath} "
            f"(expected one of {sorted(DISTRIBUTED_INDEX_TYPES)})"
        )
    return DISTRIBUTED_INDEX_TYPES[kind].load(
        dirpath, mesh=mesh, **kwargs
    )


__all__ = [
    "DistributedBruteForceIndex",
    "DistributedQuantizedIndex",
    "DISTRIBUTED_INDEX_TYPES",
    "load_distributed_index",
]
