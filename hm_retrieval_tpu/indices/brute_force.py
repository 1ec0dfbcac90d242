"""Exact brute-force retrieval index.

Re-design of ref: pkg/modelling/indices/brute_force.py. The reference wraps
a Keras model around an eagerly-materialized candidate matrix and string-id
gather (ref: brute_force.py:31-83); here the index is **data + a kernel**
(SURVEY §7): an int32 id vector + an (N, E) embedding matrix, scored by an
exact fused dot+top-k op. Identifiers are ints; the id->string mapping lives
host-side in the schema vocab (decode at the serving edge).

The candidate matrix is padded to a multiple of the scoring chunk so the
streaming kernel sees static aligned shapes; pad rows use -inf-equivalent
scores via a validity mask baked into a score bias.
"""

from __future__ import annotations

import json
import logging
import os
from functools import partial
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hm_retrieval_tpu.ops.topk import topk_dot

logger = logging.getLogger(__name__)

Batch = Dict[str, jax.Array]


@partial(jax.jit, static_argnums=(1,))
def _pad_device(emb, n_pad):
    """Device-side catalog padding: zero pad rows, -inf score bias for
    the padded tail (matches the host build exactly)."""
    n = emb.shape[0]
    pad = n_pad - n
    bias = jnp.concatenate(
        [
            jnp.zeros((n,), jnp.float32),
            jnp.full((pad,), -jnp.inf, jnp.float32),
        ]
    )
    return jnp.pad(emb, ((0, pad), (0, 0))), bias


def _pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class BruteForceIndex:
    """Exact top-k retrieval over the full candidate catalog
    (ref: BruteForceIndex, brute_force.py:6-115).

    Parameters
    ----------
    k:
        Number of neighbours returned (ref takes max(ks),
        pkg/modelling/runner.py:95-99).
    identifiers:
        (N,) int32 candidate ids, aligned with ``embeddings`` rows.
    embeddings:
        (N, E) float32 candidate embeddings.
    """

    # build_from_batches(device=True) keeps the catalog on
    # device end to end (runners/modelling.py::build_index)
    supports_device_build = True
    PAD_MULTIPLE = 1024

    def __init__(
        self,
        k: int,
        identifiers: np.ndarray,
        embeddings,
        method: str = "auto",
        recall_target: float = 0.95,
    ):
        """``method``:
        - "full": one lax.top_k over (B, N)
        - "partial_reduce": iterative exact PartialReduce refinement
          (ops/exact_topk.py)
        - "pallas": streaming bin-max kernel (ops/pallas_retrieval.py,
          fastest exact path on TPU; TPU-only)
        - "approx": hardware PartialReduce via lax.approx_max_k —
          APPROXIMATE (the only non-exact method; per-row expected
          recall >= ``recall_target``), ~5x faster than exact scoring
          (BASELINE.md); a beyond-parity ANN knob, the reference is
          exact-only (ref: brute_force.py:81)
        - "auto": pallas on TPU / partial_reduce elsewhere for catalogs
          over 16k rows, full otherwise."""
        if method not in (
            "auto", "full", "partial_reduce", "pallas", "approx"
        ):
            raise ValueError(f"unknown method {method!r}")
        if not 0.0 < recall_target <= 1.0:
            raise ValueError("recall_target must be in (0, 1]")
        self.recall_target = float(recall_target)
        # device-resident construction (see QuantizedIndex): a
        # jax.Array catalog is padded on device, no host round trip
        on_device = isinstance(embeddings, jax.Array)
        identifiers = np.asarray(identifiers)
        if not on_device:
            embeddings = np.asarray(embeddings, dtype=np.float32)
        if identifiers.ndim != 1 or embeddings.ndim != 2:
            raise ValueError("identifiers must be (N,), embeddings (N, E)")
        if len(identifiers) != len(embeddings):
            raise ValueError("identifiers and embeddings length mismatch")
        if k <= 0:
            raise ValueError("k must be positive")
        self.k = int(k)
        self.num_candidates = len(identifiers)
        if self.num_candidates < k:
            raise ValueError(
                f"k={k} exceeds number of candidates "
                f"{self.num_candidates}"
            )
        # Pad to an MXU/lane-aligned multiple with zero rows; the score
        # bias makes pad rows unselectable.
        n_pad = _pad_to_multiple(
            self.num_candidates, self.PAD_MULTIPLE
        )
        ids = np.zeros((n_pad,), identifiers.dtype)
        ids[: self.num_candidates] = identifiers
        self.identifiers = jnp.asarray(ids)
        if on_device:
            self.embeddings, self._score_bias = _pad_device(
                embeddings.astype(jnp.float32), n_pad
            )
        else:
            emb = np.zeros(
                (n_pad, embeddings.shape[1]), np.float32
            )
            emb[: self.num_candidates] = embeddings
            bias = np.zeros((n_pad,), np.float32)
            bias[self.num_candidates:] = -np.inf
            self.embeddings = jnp.asarray(emb)
            self._score_bias = jnp.asarray(bias)
        if method == "auto":
            if n_pad <= 16384:
                method = "full"
            elif jax.default_backend() == "tpu":
                method = "pallas"
            else:
                method = "partial_reduce"
        self.method = method

    # ------------------------------------------------------------------
    # Build (ref: runner.py:88-93 embeds the catalog in batches, then
    # brute_force.py:31-52 materializes it)
    # ------------------------------------------------------------------
    @classmethod
    def build_from_batches(
        cls,
        k: int,
        candidate_id_col: str,
        embed_fn: Callable[[Batch], jax.Array],
        batches: Iterable[Batch],
        batch_size: int,
        device: bool = False,
    ) -> "BruteForceIndex":
        """Embed the full catalog with the candidate tower, batching to a
        fixed padded size so the tower compiles exactly once.
        ``device=True`` keeps the embeddings on device end to end (no
        host round trip — the per-epoch rebuild path on accelerators,
        see builder.collect_catalog_device)."""
        from hm_retrieval_tpu.indices.builder import (
            collect_catalog,
            collect_catalog_device,
        )

        collect = (
            collect_catalog_device if device else collect_catalog
        )
        identifiers, embeddings = collect(
            candidate_id_col, embed_fn, batches, batch_size
        )
        logger.info(
            "Built brute-force index over %d candidates (dim %d)",
            len(identifiers),
            embeddings.shape[1],
        )
        return cls(k, identifiers, embeddings)

    # ------------------------------------------------------------------
    # Query (ref: brute_force.py:54-83)
    # ------------------------------------------------------------------
    @staticmethod
    @partial(
        jax.jit,
        static_argnames=("k", "method", "n_real", "recall_target"),
    )
    def _topk(
        query_embeddings,
        embeddings,
        score_bias,
        identifiers,
        k,
        method,
        n_real,
        recall_target=0.95,
    ):
        if method == "pallas":
            from hm_retrieval_tpu.ops.pallas_retrieval import (
                DEFAULT_Q_BLOCK,
                pallas_exact_topk,
                pick_bins,
            )

            L = pick_bins(
                min(query_embeddings.shape[0], DEFAULT_Q_BLOCK),
                query_embeddings.shape[1],
                k,
                keep_per_bin=2,
            )
            if L is not None:
                top_scores, top_idx, _ = pallas_exact_topk(
                    query_embeddings,
                    embeddings[:n_real],
                    k,
                    keep_per_bin=2,
                )
                return top_scores, jnp.take(identifiers, top_idx)
            # no feasible (k, B) kernel config: fall through to the XLA
            # PartialReduce path below
            method = "partial_reduce"
        if method == "approx":
            # Score only the real rows (n_real is static): -inf pad rows
            # would occupy PartialReduce bins and silently lower the
            # effective recall below recall_target on pad-heavy catalogs.
            scores = jnp.dot(
                query_embeddings,
                embeddings[:n_real].T,
                preferred_element_type=jnp.float32,
            )
            top_scores, top_idx = jax.lax.approx_max_k(
                scores, k, recall_target=recall_target
            )
            return top_scores, jnp.take(
                identifiers[:n_real], top_idx
            )
        scores = (
            jnp.dot(
                query_embeddings,
                embeddings.T,
                preferred_element_type=jnp.float32,
            )
            + score_bias[None, :]
        )
        if method == "partial_reduce":
            from hm_retrieval_tpu.ops.exact_topk import (
                exact_topk_scores,
            )

            top_scores, top_idx, _ = exact_topk_scores(scores, k)
        else:
            top_scores, top_idx = jax.lax.top_k(scores, k)
        return top_scores, jnp.take(identifiers, top_idx)

    def topk_from_embeddings(self, query_embeddings: jax.Array):
        """(B, E) query embeddings -> ((B, k) scores, (B, k) int ids)."""
        return self._topk(
            query_embeddings,
            self.embeddings,
            self._score_bias,
            self.identifiers,
            self.k,
            self.method,
            self.num_candidates,
            self.recall_target,
        )

    def query(
        self,
        query_fn: Callable[[Batch], jax.Array],
        batch: Batch,
    ) -> jax.Array:
        """Full serving path: embed queries, score, select
        (ref: brute_force.py:108-114). Returns (B, k) int ids."""
        _, ids = self.topk_from_embeddings(query_fn(batch))
        return ids

    # ------------------------------------------------------------------
    # Persistence (ref saves a SavedModel; here: arrays + meta,
    # SURVEY §5.4 "export = plain arrays + a tiny serving fn")
    # ------------------------------------------------------------------
    def save(self, dirpath: str) -> None:
        os.makedirs(dirpath, exist_ok=True)
        from hm_retrieval_tpu.indices.artifact import (
            clear_stale,
        )

        clear_stale(dirpath)  # drop any stale shard files
        np.savez(
            os.path.join(dirpath, "index.npz"),
            identifiers=np.asarray(
                self.identifiers[: self.num_candidates]
            ),
            embeddings=np.asarray(
                self.embeddings[: self.num_candidates]
            ),
        )
        with open(os.path.join(dirpath, "meta.json"), "w") as f:
            json.dump(
                {
                    "k": self.k,
                    "type": "brute_force",
                    "method": self.method,
                    "recall_target": self.recall_target,
                },
                f,
            )
        logger.info("Saved brute-force index to %s", dirpath)

    @classmethod
    def load(cls, dirpath: str) -> "BruteForceIndex":
        with open(os.path.join(dirpath, "meta.json")) as f:
            meta = json.load(f)
        # Honor the saved method so reload preserves result order even
        # for tied scores (exact methods may break ties differently);
        # remap only when the saved method cannot run on this backend
        # (the Pallas kernel is TPU-only).
        method = meta.get("method", "auto")
        if method == "pallas" and jax.default_backend() != "tpu":
            logger.warning(
                "Index at %s was saved with method='pallas' but the "
                "current backend is %s; using 'partial_reduce' (exact, "
                "but tied scores may order differently)",
                dirpath,
                jax.default_backend(),
            )
            method = "partial_reduce"
        from hm_retrieval_tpu.indices.artifact import (
            load_index_arrays,
        )

        z = load_index_arrays(dirpath)  # single-file OR sharded layout
        return cls(
            meta["k"],
            z["identifiers"],
            z["embeddings"],
            method=method,
            recall_target=meta.get("recall_target", 0.95),
        )
