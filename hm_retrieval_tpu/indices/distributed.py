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
from hm_retrieval_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

logger = logging.getLogger(__name__)

Batch = Dict[str, jax.Array]


from hm_retrieval_tpu.indices.artifact import (  # noqa: E402
    INDEX_FILE,
    clear_stale,
    iter_shard_arrays,
    shard_file,
    shard_paths,
)
from hm_retrieval_tpu.indices.builder import (  # noqa: E402
    collect_catalog_sharded,
)


def _shard_arrays_to_blocks(dirpath: str):
    """Sharded-artifact files as ``(ids, embed_thunk)`` row blocks for
    ``place_catalog_rows``. Only the identifiers are read eagerly; the
    embedding decode (npz decompress + int8 dequantization when the
    artifact has no fp32 copy — requantization reproduces the codes
    exactly) happens inside the thunk, so a multi-host load skips both
    IO and dequantization for blocks its process does not own — the
    same owned-shard laziness as the build path."""
    for path in shard_paths(dirpath):
        with np.load(path) as z:
            ids = z["identifiers"]

        def thunk(p=path):
            with np.load(p) as z:
                if "embeddings" in z.files:
                    return z["embeddings"]
                return z["codes"].astype(np.float32) * z["scales"][
                    :, None
                ]

        yield ids, thunk


def _pull_model_shards(arr, per: int, wanted):
    """Host copies of the model shards in ``wanted`` from a
    P(model, ...)-sharded global array (first addressable data-axis
    replica of each). One shard resident at a time on the caller side —
    never the full array."""
    out = {}
    for sh in arr.addressable_shards:
        idx = sh.index[0] if isinstance(sh.index, tuple) else sh.index
        s = (idx.start or 0) // per
        if s in wanted and s not in out:
            out[s] = np.asarray(sh.data)
    return out


def _gathered_shard(arr, s: int, per: int, mesh, shape, dtype):
    """Host copy of model shard ``s`` of a P(model, ...)-sharded global
    array on EVERY process. Single-process: a plain device->host pull.
    Multi-process: collective — the owning process pulls the shard and
    peers receive it via ``broadcast_one_to_all`` (one shard in flight
    at a time, ONE (N*E/S) copy on the wire — an allgather would move
    and hold P buffers, P-1 of them zeros, per shard).
    ALL processes must call this with the same arguments."""
    pi = jax.process_index()
    owner = mesh.devices[0, s].process_index
    local = None
    if owner == pi:
        local = _pull_model_shards(arr, per, {s})[s]
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    buf = (
        local
        if local is not None
        else np.zeros(shape, dtype)
    )
    return np.asarray(
        multihost_utils.broadcast_one_to_all(
            buf, is_source=(owner == pi)
        )
    )


def _write_sharded_artifact(
    dirpath: str,
    mesh,
    num_candidates: int,
    arrays: Dict[str, jax.Array],  # save-key -> P(model,...) global
    meta: dict,
) -> None:
    """Per-model-shard npz files, one shard resident on the host at a
    time. Multi-host collective: each process writes exactly the shards
    whose data-axis-0 replica it owns (disjoint writers, no races); the
    coordinator writes meta.json. Concatenating the shard files yields
    the single-file artifact's arrays exactly (indices/artifact.py)."""
    os.makedirs(dirpath, exist_ok=True)
    total = next(iter(arrays.values())).shape[0]
    S = mesh.shape[MODEL_AXIS]
    per = total // S
    pi = jax.process_index()
    if pi == 0:
        # a previous save may have left a single-file artifact or MORE
        # shard files than this mesh writes; either would be read back
        # alongside/instead of the new shards
        clear_stale(dirpath, keep_shards=S)
    writers = [
        s
        for s in range(S)
        if mesh.devices[0, s].process_index == pi
    ]
    for s in writers:
        lo = s * per
        fill = max(0, min(per, num_candidates - lo))
        np.savez(
            shard_file(dirpath, s),
            **{
                key: _pull_model_shards(a, per, {s})[s][:fill]
                for key, a in arrays.items()
            },
        )
    if jax.process_count() > 1:
        # meta.json is the load trigger: a reader that keys on it must
        # never observe it before every peer's shard file is complete,
        # so barrier all writers before the coordinator publishes
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(
            "sharded_index_artifact_write"
        )
    if pi == 0:
        dim = next(
            int(a.shape[1]) for a in arrays.values() if a.ndim == 2
        )
        meta = dict(
            meta,
            sharded_artifact=True,
            num_shards=S,
            num_candidates=int(num_candidates),
            dim=dim,
        )
        with open(os.path.join(dirpath, "meta.json"), "w") as f:
            json.dump(meta, f)


def _is_sharded_artifact(dirpath: str, meta: dict) -> bool:
    if meta.get("sharded_artifact"):
        return True
    return not os.path.exists(
        os.path.join(dirpath, INDEX_FILE)
    ) and bool(shard_paths(dirpath))


def _load_sharded_placed(
    dirpath: str, meta: dict, mesh, quantize: bool, keep_fp32: bool
):
    """Stream a sharded artifact's files straight back into mesh
    placement (O(N/S) host peak, mirror of the streaming build). The
    on-disk shard count is independent of the current mesh's model-axis
    size."""
    from hm_retrieval_tpu.indices.builder import place_catalog_rows

    n = meta.get("num_candidates")
    if n is None:
        n = sum(
            len(a["identifiers"]) for a in iter_shard_arrays(dirpath)
        )
    dim = meta.get("dim")
    if dim is None:
        # legacy artifact without the dim key: probe the first shard
        # (costs one redundant shard read)
        first = next(iter_shard_arrays(dirpath))
        dim = (
            first["embeddings"]
            if "embeddings" in first
            else first["codes"]
        ).shape[1]
    return (
        *place_catalog_rows(
            _shard_arrays_to_blocks(dirpath),
            n,
            dim,
            mesh,
            quantize=quantize,
            keep_fp32=keep_fp32,
        ),
        n,
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

    collective_save = False  # sharded-built indices save collectively

    def _configure(
        self,
        k: int,
        num_candidates: int,
        dim: int,
        mesh,
        method: str,
        compute_dtype,
        interpret: bool,
    ):
        if mesh is None:
            raise ValueError("DistributedBruteForceIndex needs a mesh")
        if method not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown method {method!r}")
        if k <= 0:
            raise ValueError("k must be positive")
        if num_candidates < k:
            raise ValueError(
                f"k={k} exceeds number of candidates {num_candidates}"
            )
        if method == "auto":
            if jax.default_backend() == "tpu":
                from hm_retrieval_tpu.ops.pallas_retrieval import (
                    DEFAULT_Q_BLOCK,
                    pick_bins,
                )

                # +1: the kernel folds the pad-row bias in as an extra
                # feature column (see make_distributed_topk)
                feasible = pick_bins(
                    DEFAULT_Q_BLOCK, dim + 1, k, 2
                )
                method = "pallas" if feasible is not None else "xla"
            else:
                method = "xla"
        self.k = int(k)
        self.num_candidates = int(num_candidates)
        self.mesh = mesh
        self.method = method
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
        identifiers = np.asarray(identifiers)
        embeddings = np.asarray(embeddings, np.float32)
        _validate(k, identifiers, embeddings)
        self._configure(
            k,
            len(identifiers),
            embeddings.shape[1],
            mesh,
            method,
            compute_dtype,
            interpret,
        )
        self._host_identifiers = identifiers.astype(np.int32)
        self._host_embeddings = embeddings
        self._emb, self._ids, self._bias = shard_candidates(
            embeddings, self._host_identifiers, mesh
        )

    @classmethod
    def _from_placed(
        cls,
        k: int,
        num_candidates: int,
        ids_host: np.ndarray,  # (total,) padded
        placed: Dict[str, jax.Array],
        *,
        mesh,
        method: str = "auto",
        compute_dtype=None,
        interpret: bool = False,
    ) -> "DistributedBruteForceIndex":
        self = cls.__new__(cls)
        self._configure(
            k,
            num_candidates,
            placed["emb"].shape[1],
            mesh,
            method,
            compute_dtype,
            interpret,
        )
        self._host_identifiers = np.asarray(
            ids_host[:num_candidates], np.int32
        )
        self._host_embeddings = None  # streamed build: no host catalog
        self.collective_save = True
        self._emb = placed["emb"]
        self._ids = placed["ids"]
        self._bias = placed["bias"]
        return self

    @classmethod
    def build_from_batches(
        cls,
        k: int,
        candidate_id_col: str,
        embed_fn: Callable[[Batch], jax.Array],
        batches: Iterable[Batch],
        batch_size: int,
        *,
        mesh,
        num_candidates: int = None,
        dim: int = None,
        build_stats: dict = None,
        **kwargs,
    ) -> "DistributedBruteForceIndex":
        """Streaming sharded build: rows go batch -> shard buffer ->
        device shard, peak host memory O(N*E/S) and each process embeds
        only blocks overlapping its own shards (indices/builder.py,
        the sharded analog of ref: brute_force.py:31-52). Pass
        ``num_candidates`` (e.g. the dataset manifest's row count) to
        stream without materializing the feature batches first."""
        ids_host, placed, n = collect_catalog_sharded(
            candidate_id_col,
            embed_fn,
            batches,
            batch_size,
            mesh,
            num_candidates=num_candidates,
            dim=dim,
            quantize=False,
            stats=build_stats,
        )
        return cls._from_placed(
            k, n, ids_host, placed, mesh=mesh, **kwargs
        )

    def topk_from_embeddings(self, query_embeddings: jax.Array):
        """(B, E) query embeddings -> ((B, k) scores, (B, k) int ids)."""
        q, b = self._pad_queries(query_embeddings)
        scores, ids = self._fn(q, self._emb, self._ids, self._bias)
        return scores[:b], ids[:b]

    def _host_catalog(self) -> np.ndarray:
        """Full fp32 catalog on the host (assembled shard-by-shard for
        streamed builds — O(N*E) host memory is inherent to producing a
        replicated local copy). Multi-process: collective — every
        process must call this together (each shard is pulled by its
        owner and exchanged via ``process_allgather``)."""
        if self._host_embeddings is not None:
            return self._host_embeddings
        total = self._emb.shape[0]
        S = self.mesh.shape[MODEL_AXIS]
        per = total // S
        E = self._emb.shape[1]
        return np.concatenate(
            [
                _gathered_shard(
                    self._emb, s, per, self.mesh, (per, E), np.float32
                )
                for s in range(S)
            ]
        )[: self.num_candidates]

    def to_local(self, method: str = "auto"):
        """Single-device BruteForceIndex over the same catalog (for
        export paths that need the replicated layout). Multi-process:
        collective — call on every process (see ``_host_catalog``)."""
        from hm_retrieval_tpu.indices.brute_force import BruteForceIndex

        return BruteForceIndex(
            self.k,
            self._host_identifiers,
            self._host_catalog(),
            method=method,
        )

    def save(self, dirpath: str) -> None:
        """Artifact loadable by ``load_index`` anywhere + a
        ``distributed`` marker. Host-built indices write the single-file
        layout; streamed sharded builds write per-shard files (each
        process its own shards — call on EVERY process)."""
        meta = {
            "k": self.k,
            "type": "brute_force",
            "method": "auto",
            "recall_target": 0.95,
            "distributed": True,
            "distributed_method": self.method,
        }
        if self._host_embeddings is None:
            _write_sharded_artifact(
                dirpath,
                self.mesh,
                self.num_candidates,
                {"identifiers": self._ids, "embeddings": self._emb},
                meta,
            )
            logger.info(
                "Saved distributed brute-force index (sharded) to %s",
                dirpath,
            )
            return
        os.makedirs(dirpath, exist_ok=True)
        clear_stale(dirpath)  # drop any stale shard files
        np.savez(
            os.path.join(dirpath, "index.npz"),
            identifiers=self._host_identifiers,
            embeddings=self._host_embeddings,
        )
        with open(os.path.join(dirpath, "meta.json"), "w") as f:
            json.dump(meta, f)
        logger.info(
            "Saved distributed brute-force index to %s", dirpath
        )

    @classmethod
    def load(
        cls, dirpath: str, *, mesh, **kwargs
    ) -> "DistributedBruteForceIndex":
        with open(os.path.join(dirpath, "meta.json")) as f:
            meta = json.load(f)
        method = kwargs.pop(
            "method", meta.get("distributed_method", "auto")
        )
        if _is_sharded_artifact(dirpath, meta):
            ids_host, placed, n = _load_sharded_placed(
                dirpath, meta, mesh, quantize=False, keep_fp32=True
            )
            return cls._from_placed(
                meta["k"],
                n,
                ids_host,
                placed,
                mesh=mesh,
                method=method,
                **kwargs,
            )
        with np.load(os.path.join(dirpath, "index.npz")) as z:
            return cls(
                meta["k"],
                z["identifiers"],
                z["embeddings"],
                mesh=mesh,
                method=method,
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

    collective_save = False  # sharded-built indices save collectively

    def _configure(
        self,
        k: int,
        num_candidates: int,
        mesh,
        oversample: int,
        rescore: bool,
        recall_target: float,
        method: str,
        pallas_rounds: int,
        pallas_fold,
        interpret: bool,
    ):
        if mesh is None:
            raise ValueError("DistributedQuantizedIndex needs a mesh")
        if oversample < 1:
            raise ValueError("oversample must be >= 1")
        if not 0.0 < recall_target <= 1.0:
            raise ValueError("recall_target must be in (0, 1]")
        if method not in ("auto", "scan", "pallas"):
            raise ValueError(f"unknown method {method!r}")
        if k <= 0:
            raise ValueError("k must be positive")
        if num_candidates < k:
            raise ValueError(
                f"k={k} exceeds number of candidates {num_candidates}"
            )
        if method == "auto":
            method = (
                "pallas" if jax.default_backend() == "tpu" else "scan"
            )
        self.k = int(k)
        self.num_candidates = int(num_candidates)
        self.mesh = mesh
        self.method = method
        self.oversample = int(oversample)
        self.rescore = bool(rescore)
        self.recall_target = float(recall_target)
        self.pallas_rounds = int(pallas_rounds)
        self.pallas_fold = (
            None if pallas_fold is None else int(pallas_fold)
        )
        self._fn = jax.jit(
            make_distributed_quantized_topk(
                mesh,
                self.k,
                oversample=self.oversample,
                recall_target=self.recall_target,
                method=method,
                interpret=interpret,
                pallas_rounds=self.pallas_rounds,
                pallas_fold=self.pallas_fold,
                data_sharded_queries=True,
            )
        )
        logger.info(
            "Distributed quantized index: %d candidates over mesh %s "
            "(method=%s, rescore=%s)",
            self.num_candidates,
            dict(mesh.shape),
            method,
            self.rescore,
        )

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
        identifiers = np.asarray(identifiers)
        embeddings = np.asarray(embeddings, np.float32)
        _validate(k, identifiers, embeddings)
        self._configure(
            k,
            len(identifiers),
            mesh,
            oversample,
            rescore,
            recall_target,
            method,
            pallas_rounds,
            pallas_fold,
            interpret,
        )
        self._host_identifiers = identifiers.astype(np.int32)
        self._host_embeddings = embeddings
        self._placed = shard_candidates_quantized(
            embeddings,
            self._host_identifiers,
            mesh,
            keep_fp32=self.rescore,
        )

    @classmethod
    def _from_placed(
        cls,
        k: int,
        num_candidates: int,
        ids_host: np.ndarray,  # (total,) padded
        placed: Dict[str, jax.Array],
        *,
        mesh,
        oversample: int = 4,
        rescore: bool = True,
        recall_target: float = 0.95,
        method: str = "auto",
        pallas_rounds: int = 1,
        pallas_fold: int = None,
        interpret: bool = False,
    ) -> "DistributedQuantizedIndex":
        self = cls.__new__(cls)
        self._configure(
            k,
            num_candidates,
            mesh,
            oversample,
            rescore,
            recall_target,
            method,
            pallas_rounds,
            pallas_fold,
            interpret,
        )
        self._host_identifiers = np.asarray(
            ids_host[:num_candidates], np.int32
        )
        self._host_embeddings = None  # streamed build: no host catalog
        self.collective_save = True
        self._placed = (
            placed["codes"],
            placed["scales"],
            placed.get("emb"),
            placed["ids"],
            placed["bias"],
        )
        return self

    @classmethod
    def build_from_batches(
        cls,
        k: int,
        candidate_id_col: str,
        embed_fn: Callable[[Batch], jax.Array],
        batches: Iterable[Batch],
        batch_size: int,
        *,
        mesh,
        num_candidates: int = None,
        dim: int = None,
        build_stats: dict = None,
        **kwargs,
    ) -> "DistributedQuantizedIndex":
        """Streaming sharded build (indices/builder.py): rows go
        batch -> shard buffer -> int8 codes (+ fp32 only when
        ``rescore``) -> device shard; peak host memory O(N*E/S) and
        each process embeds only blocks overlapping its own shards.
        With ``rescore=False`` no fp32 copy of the catalog ever exists
        anywhere — the layout that serves catalogs 4x too big for the
        slice now also BUILDS within it. Pass ``num_candidates`` (the
        dataset manifest's row count) to stream without materializing
        the feature batches first."""
        ids_host, placed, n = collect_catalog_sharded(
            candidate_id_col,
            embed_fn,
            batches,
            batch_size,
            mesh,
            num_candidates=num_candidates,
            dim=dim,
            quantize=True,
            keep_fp32=kwargs.get("rescore", True),
            stats=build_stats,
        )
        return cls._from_placed(
            k, n, ids_host, placed, mesh=mesh, **kwargs
        )

    def topk_from_embeddings(self, query_embeddings: jax.Array):
        """(B, E) query embeddings -> ((B, k) scores, (B, k) int ids)."""
        q, b = self._pad_queries(query_embeddings)
        scores, ids = self._fn(q, *self._placed)
        return scores[:b], ids[:b]

    def _host_catalog(self) -> np.ndarray:
        """Full fp32 catalog on the host (assembled shard-by-shard for
        streamed builds; dequantized from the int8 shards when no fp32
        copy exists). Multi-process: collective — every process must
        call this together (each shard is pulled by its owner and
        exchanged via ``process_allgather``)."""
        if self._host_embeddings is not None:
            return self._host_embeddings
        codes, scales, emb, _, _ = self._placed
        total = codes.shape[0]
        S = self.mesh.shape[MODEL_AXIS]
        per = total // S
        E = codes.shape[1]
        parts = []
        for s in range(S):
            if emb is not None:
                parts.append(
                    _gathered_shard(
                        emb, s, per, self.mesh, (per, E), np.float32
                    )
                )
            else:
                c = _gathered_shard(
                    codes, s, per, self.mesh, (per, E), codes.dtype
                )
                sc = _gathered_shard(
                    scales, s, per, self.mesh, (per,), np.float32
                )
                parts.append(c.astype(np.float32) * sc[:, None])
        return np.concatenate(parts)[: self.num_candidates]

    def to_local(self, **kwargs):
        """Single-device QuantizedIndex over the same catalog.
        Multi-process: collective — call on every process (see
        ``_host_catalog``)."""
        from hm_retrieval_tpu.indices.quantized import QuantizedIndex

        kwargs.setdefault("oversample", self.oversample)
        kwargs.setdefault("rescore", self.rescore)
        kwargs.setdefault("recall_target", self.recall_target)
        return QuantizedIndex(
            self.k,
            self._host_identifiers,
            self._host_catalog(),
            **kwargs,
        )

    def _meta(self) -> dict:
        return {
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
        }

    def save(self, dirpath: str) -> None:
        """QuantizedIndex-compatible artifact + ``distributed`` marker.
        With ``rescore=False`` the fp32 table is NOT stored; load
        reconstructs embeddings as codes*scales (requantization of which
        reproduces the codes exactly). Host-built indices write the
        single-file layout; streamed sharded builds write per-shard
        files (each process its own shards — call on EVERY process)."""
        if self._host_embeddings is None:
            codes, scales, emb, ids, _ = self._placed
            arrays = {
                "identifiers": ids,
                "codes": codes,
                "scales": scales,
            }
            if emb is not None:
                arrays["embeddings"] = emb
            _write_sharded_artifact(
                dirpath,
                self.mesh,
                self.num_candidates,
                arrays,
                self._meta(),
            )
            logger.info(
                "Saved distributed quantized index (sharded) to %s",
                dirpath,
            )
            return
        from hm_retrieval_tpu.indices.quantized import quantize_rows

        os.makedirs(dirpath, exist_ok=True)
        clear_stale(dirpath)  # drop any stale shard files
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
            json.dump(self._meta(), f)
        logger.info("Saved distributed quantized index to %s", dirpath)

    @classmethod
    def load(
        cls, dirpath: str, *, mesh, **kwargs
    ) -> "DistributedQuantizedIndex":
        with open(os.path.join(dirpath, "meta.json")) as f:
            meta = json.load(f)
        if _is_sharded_artifact(dirpath, meta):
            kwargs.setdefault("oversample", meta.get("oversample", 4))
            kwargs.setdefault("rescore", meta.get("rescore", True))
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
            ids_host, placed, n = _load_sharded_placed(
                dirpath,
                meta,
                mesh,
                quantize=True,
                keep_fp32=kwargs["rescore"],
            )
            return cls._from_placed(
                meta["k"], n, ids_host, placed, mesh=mesh, **kwargs
            )
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
