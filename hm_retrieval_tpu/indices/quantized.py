"""Int8-quantized scan index: the TPU-native ANN family.

Beyond-parity component (the reference is exact-only,
ref: pkg/modelling/indices/brute_force.py:75-83). The classic ANN answer
on CPU/GPU is an inverted-file (IVF) index, but IVF is a poor fit for
TPUs: per-query bucket probing needs scattered HBM gathers with
data-dependent shapes — exactly what the MXU/XLA model punishes. The
TPU-honest design (ScaNN-style) keeps the scan **dense** and attacks the
real bottleneck, HBM bandwidth:

1. store the catalog as symmetric per-row int8 (4x less HBM traffic
   than fp32; the MXU multiplies int8 natively);
2. stream the catalog once, selecting an oversampled top-k' of the
   dequantized scores — either the fused Pallas bin-max kernel reading
   the catalog AS int8 and dequantizing in VMEM
   (``ops/pallas_retrieval.py::pallas_quantized_topk``, the TPU
   default: exact-kernel speed at 1/4 the HBM bytes), or an XLA scan
   of int8 x int8 -> int32 chunk matmuls with per-chunk
   ``lax.approx_max_k`` merges (the portable fallback);
3. optionally re-score the k' survivors against the fp32 rows and take
   the exact top-k among them, so quantization affects only which rows
   *reach* the rescore, not their final ordering.

With the default 4x oversample the end-to-end recall vs the exact
brute-force oracle is ~1.0 (tests assert >= 0.99 on Gaussian data); the
memory story is 1/4 of fp32 with ``rescore=False`` and 5/4 with the
fp32 rescore table kept.

API-compatible with BruteForceIndex (query / topk_from_embeddings /
save / load), so IndexRecall and the runners can use either.
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

from hm_retrieval_tpu.ops.topk import topk_pair

logger = logging.getLogger(__name__)

Batch = Dict[str, jax.Array]


def _pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pallas_feasible(k_eff: int, dim: int) -> bool:
    """Single-pass (pallas_rounds=1) threshold-free layout at the
    kernel's smallest fallback block size."""
    from hm_retrieval_tpu.ops.pallas_retrieval import pick_bins

    return pick_bins(256, dim, k_eff, 2, first_pass=True) is not None


def _resolve_method(method: str, k_eff: int, dim: int) -> str:
    """Resolve "auto": pallas on TPU when the survivor count fits a
    feasible bin layout (k_eff <= L within the VMEM budget), else the
    portable XLA scan."""
    if method != "auto":
        return method
    if jax.default_backend() != "tpu":
        return "scan"
    return "pallas" if _pallas_feasible(k_eff, dim) else "scan"


def shrink_survivors(k_floor: int, k_over: int, dim: int) -> int:
    """Largest pallas-feasible survivor count obtained by halving
    ``k_over`` toward ``k_floor`` (the SHARED shrink policy for the
    single-device and distributed quantized paths — one deterministic
    rule so the same configuration selects the same survivor count
    everywhere). Returns ``k_over`` unchanged when already feasible,
    ``k_floor`` when nothing larger is."""
    while k_over > k_floor and not _pallas_feasible(k_over, dim):
        k_over = max(k_floor, k_over // 2)
    return k_over


def _auto_survivors(
    method: str, k: int, k_over: int, rescore: bool, dim: int
):
    """Resolve (method, k_over). Large requested k_over can make the
    fused pallas engine infeasible (survivors must fit the bin layout:
    k_over <= L <= 2048 within VMEM); with a fp32 rescore downstream,
    SHRINKING the oversampled survivor set to the largest feasible
    size beats both failing and the ~16x-slower scan — at k'~L the
    per-bin top-2 bounds recall, not the survivor count (measured at
    k=1000: k'=1000 == k'=2000 recall, BASELINE.md "k=1000" sweep).
    The shrink applies to method="auto" (instead of the scan fallback)
    AND to an explicit method="pallas" (which would otherwise raise on
    the first query — and a saved auto-shrunk index reloads with the
    resolved 'pallas' recorded in its meta, so the reload must
    re-shrink identically). Explicit method="scan" keeps the literal
    oversample."""
    k_eff = k_over if rescore else k
    resolved = _resolve_method(method, k_eff, dim)
    if rescore and not _pallas_feasible(k_over, dim):
        if resolved == "pallas" or (
            method == "auto" and jax.default_backend() == "tpu"
        ):
            cand = shrink_survivors(k, k_over, dim)
            if cand < k_over and _pallas_feasible(cand, dim):
                logger.info(
                    "oversampled survivor set %d is infeasible for "
                    "the pallas engine; shrinking to %d (rescore "
                    "bounds recall, see BASELINE.md k=1000 sweep)",
                    k_over,
                    cand,
                )
                return "pallas", cand
    return resolved, k_over


def quantize_rows(embeddings: np.ndarray):
    """Symmetric per-row int8 quantization: returns (int8 codes,
    fp32 per-row scales). Zero rows get scale 1 (codes all 0)."""
    emb = np.asarray(embeddings, np.float32)
    # fp32 constant-reciprocal multiply (no float64 promotion, no
    # compiler-dependent div->mul rewrite): bit-identical to the jitted
    # device build in _quantize_pad_device
    scales = np.max(np.abs(emb), axis=1) * np.float32(1.0 / 127.0)
    scales = np.where(scales > 0, scales, 1.0).astype(np.float32)
    codes = np.clip(
        np.rint(emb / scales[:, None]), -127, 127
    ).astype(np.int8)
    return codes, scales


def quantize_rows_global(embeddings: np.ndarray):
    """Symmetric int8 quantization with ONE scale for the whole
    catalog: returns (int8 codes, fp32 scalar scale). Raw int scores
    against a shared-scale catalog are order-comparable across rows,
    which lets the retrieval kernel drop its per-column dequantization
    FMA entirely (ops/pallas_retrieval.py::pallas_quantized_topk_global)
    at the cost of coarser resolution for small-norm rows."""
    emb = np.asarray(embeddings, np.float32)
    g = np.max(np.abs(emb)) * np.float32(1.0 / 127.0)
    g = np.float32(g) if g > 0 else np.float32(1.0)
    codes = np.clip(np.rint(emb / g), -127, 127).astype(np.int8)
    return codes, np.float32(g)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _quantize_pad_device(emb, n_pad, scale_mode, keep_fp32):
    """Device-side analog of quantize_rows(_global) + padding: same
    numerics (rint, clip to +-127, zero rows -> scale 1, padded tail
    scored -inf via the bias row). Returns (codes, scales, bias,
    fp32 rescore table or None, global scale or 0)."""
    n = emb.shape[0]
    if scale_mode == "global":
        g = jnp.max(jnp.abs(emb)) * np.float32(1.0 / 127.0)
        g = jnp.where(g > 0, g, 1.0).astype(jnp.float32)
        scales = jnp.full((n,), g, jnp.float32)
    else:
        g = jnp.float32(0)
        scales = jnp.max(jnp.abs(emb), axis=1) * np.float32(
            1.0 / 127.0
        )
        scales = jnp.where(scales > 0, scales, 1.0).astype(
            jnp.float32
        )
    codes = jnp.clip(
        jnp.rint(emb / scales[:, None]), -127, 127
    ).astype(jnp.int8)
    pad = n_pad - n
    codes_p = jnp.pad(codes, ((0, pad), (0, 0)))
    scales_p = jnp.pad(scales, (0, pad))
    bias = jnp.concatenate(
        [
            jnp.zeros((n,), jnp.float32),
            jnp.full((pad,), -jnp.inf, jnp.float32),
        ]
    )
    emb_p = (
        jnp.pad(emb, ((0, pad), (0, 0))) if keep_fp32 else None
    )
    return codes_p, scales_p, bias, emb_p, g


class QuantizedIndex:
    """Approximate (near-exact) top-k retrieval over an int8 catalog.

    Parameters
    ----------
    k:
        Neighbours returned.
    identifiers / embeddings:
        Same contract as BruteForceIndex: (N,) int ids, (N, E) fp32.
    oversample:
        The quantized scan keeps ``oversample * k`` candidates before the
        fp32 rescore; higher = better recall, more rescore work. For
        ``method="pallas"`` the survivor set is already near-exact, so
        oversample=2 matches oversample=4's recall at ~2/3 the cost
        (BASELINE.md); 4 stays the default for scan-path parity.
    rescore:
        Keep the fp32 catalog and exactly re-score the survivors
        (default). ``False`` drops the fp32 copy (1/4 memory) and ranks
        by dequantized scores.
    chunk:
        Catalog rows scored per scan step (bounds peak score-matrix
        memory at ``B * chunk`` fp32).
    recall_target:
        Per-chunk ``approx_max_k`` recall target for the oversampled
        candidate set (scan method only).
    method:
        Survivor-selection engine. "pallas" streams the int8 catalog
        through the fused bin-max kernel (bf16 queries); "scan" is the
        XLA chunked int8 x int8 scan (portable, quantized queries);
        "auto" picks pallas on TPU, scan elsewhere.
    pallas_rounds:
        Streaming passes for the pallas engine. The default 1 takes a
        single pass (per-bin top-2 + one merge): survivors are then
        approximate, but measured recall is IDENTICAL to fully-refined
        survivors (0.995 at N=1M/k=100, BASELINE.md) because
        quantization error, not survivor refinement, bounds coverage —
        and it is 4x faster. Raise to refine survivors to the exact
        dequantized top-k' (matters only without rescore on adversarial
        score distributions).
    scale_mode:
        "per_row" (default): symmetric per-row scales — best survivor
        accuracy AND measured speed. "global": ONE scale for the whole
        catalog — raw int scores become order-comparable, so the
        single-pass pallas engine drops the per-column dequantization
        FMA (pallas_quantized_topk_global). Measured on v5e this buys
        NOTHING (the FMA rides the matmul epilogue; BASELINE.md round-4
        "rejected" section) and small-norm rows quantize more coarsely
        — use only when a single scale is semantically required, and
        pair with ``rescore``.
    """

    # build_from_batches(device=True) keeps the catalog on
    # device end to end (runners/modelling.py::build_index)
    supports_device_build = True
    PAD_MULTIPLE = 1024

    def __init__(
        self,
        k: int,
        identifiers: np.ndarray,
        embeddings: np.ndarray,
        oversample: int = 4,
        rescore: bool = True,
        chunk: int = 65536,
        recall_target: float = 0.95,
        method: str = "auto",
        pallas_rounds: int = 1,
        pallas_fold: int = None,
        scale_mode: str = "per_row",
    ):
        if k <= 0:
            raise ValueError("k must be positive")
        if oversample < 1:
            raise ValueError("oversample must be >= 1")
        if not 0.0 < recall_target <= 1.0:
            raise ValueError("recall_target must be in (0, 1]")
        if method not in ("auto", "scan", "pallas"):
            raise ValueError(f"unknown method {method!r}")
        if pallas_rounds < 1:
            raise ValueError("pallas_rounds must be >= 1")
        if scale_mode not in ("per_row", "global"):
            raise ValueError(f"unknown scale_mode {scale_mode!r}")
        self.scale_mode = scale_mode
        if pallas_fold is not None:
            if pallas_fold < 1:
                raise ValueError("pallas_fold must be >= 1")
            if pallas_fold > 1 and pallas_rounds != 1:
                raise ValueError(
                    "pallas_fold > 1 requires pallas_rounds == 1"
                )
        self.pallas_rounds = int(pallas_rounds)
        # None = kernel auto policy (measured (q_block, fold) table)
        self.pallas_fold = (
            None if pallas_fold is None else int(pallas_fold)
        )
        # Device-resident construction: embeddings already on device
        # (e.g. straight out of the candidate tower, or synthesized on
        # device — uploading a multi-GB fp32 catalog through a slow
        # host<->device link would dominate build time). Quantization
        # and padding then run jitted on device; the host never holds
        # the catalog.
        on_device = isinstance(embeddings, jax.Array)
        identifiers = np.asarray(identifiers)
        if not on_device:
            embeddings = np.asarray(embeddings, np.float32)
        if identifiers.ndim != 1 or embeddings.ndim != 2:
            raise ValueError(
                "identifiers must be (N,), embeddings (N, E)"
            )
        if len(identifiers) != len(embeddings):
            raise ValueError(
                "identifiers and embeddings length mismatch"
            )
        self.k = int(k)
        self.num_candidates = len(identifiers)
        if self.num_candidates < k:
            raise ValueError(
                f"k={k} exceeds number of candidates "
                f"{self.num_candidates}"
            )
        self.oversample = int(oversample)
        self.rescore = bool(rescore)
        self.recall_target = float(recall_target)

        n_pad = _pad_to_multiple(
            self.num_candidates, self.PAD_MULTIPLE
        )
        # Small catalogs: one chunk covering everything. The per-chunk
        # approx_max_k keeps k_over rows, so chunk must cover both k and
        # the oversampled set.
        self.chunk = int(min(chunk, n_pad))
        if self.chunk < self.k:
            raise ValueError(
                f"chunk={self.chunk} must be >= k={self.k}"
            )
        n_pad = _pad_to_multiple(self.num_candidates, self.chunk)
        self.k_over = int(
            min(max(self.oversample * self.k, self.k), self.chunk)
        )
        self.method, self.k_over = _auto_survivors(
            method,
            self.k,
            min(self.k_over, self.num_candidates)
            if self.rescore
            else self.k_over,
            self.rescore,
            embeddings.shape[1],
        )

        ids = np.zeros((n_pad,), identifiers.dtype)
        ids[: self.num_candidates] = identifiers
        self.identifiers = jnp.asarray(ids)

        if on_device:
            codes_p, scales_p, bias, emb_p, g = (
                _quantize_pad_device(
                    embeddings.astype(jnp.float32),
                    n_pad,
                    scale_mode,
                    self.rescore,
                )
            )
            self.global_scale = (
                float(g) if scale_mode == "global" else None
            )
            self.codes = codes_p
            self.scales = scales_p
            self._score_bias = bias
            self.embeddings: Optional[jax.Array] = emb_p
            return

        if scale_mode == "global":
            codes, g = quantize_rows_global(embeddings)
            scales = np.full((len(codes),), g, np.float32)
            self.global_scale = float(g)
        else:
            codes, scales = quantize_rows(embeddings)
            self.global_scale = None
        codes_p = np.zeros((n_pad, embeddings.shape[1]), np.int8)
        codes_p[: self.num_candidates] = codes
        scales_p = np.zeros((n_pad,), np.float32)
        scales_p[: self.num_candidates] = scales
        bias = np.zeros((n_pad,), np.float32)
        bias[self.num_candidates:] = -np.inf

        self.codes = jnp.asarray(codes_p)
        self.scales = jnp.asarray(scales_p)
        self._score_bias = jnp.asarray(bias)
        if self.rescore:
            emb_p = np.zeros(
                (n_pad, embeddings.shape[1]), np.float32
            )
            emb_p[: self.num_candidates] = embeddings
            self.embeddings = jnp.asarray(emb_p)
        else:
            self.embeddings = None

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
        **kwargs,
    ) -> "QuantizedIndex":
        """Embed the catalog with the candidate tower (same contract as
        BruteForceIndex.build_from_batches). ``device=True`` keeps the
        embeddings on device end to end: quantization runs jitted and
        the host never holds the catalog."""
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
            "Built int8 quantized index over %d candidates (dim %d)",
            len(identifiers),
            embeddings.shape[1],
        )
        return cls(k, identifiers, embeddings, **kwargs)

    # ------------------------------------------------------------------
    @staticmethod
    @partial(
        jax.jit,
        static_argnames=(
            "k",
            "k_over",
            "chunk",
            "recall_target",
        ),
    )
    def _topk(
        query_embeddings,  # (B, E) fp32
        codes,             # (N_pad, E) int8
        scales,            # (N_pad,)
        score_bias,        # (N_pad,) 0 / -inf
        identifiers,       # (N_pad,)
        fp32_embeddings,   # (N_pad, E) or None
        k,
        k_over,
        chunk,
        recall_target,
    ):
        q = query_embeddings.astype(jnp.float32)
        b = q.shape[0]
        # Symmetric per-query int8 quantization.
        t = jnp.max(jnp.abs(q), axis=1, keepdims=True) / 127.0
        t = jnp.maximum(t, jnp.float32(1e-30))
        qq = jnp.clip(jnp.rint(q / t), -127, 127).astype(jnp.int8)

        n_pad = codes.shape[0]
        n_chunks = n_pad // chunk
        codes_r = codes.reshape(n_chunks, chunk, -1)
        # Fold the per-query scale in once at the end: ranking within a
        # query is invariant to t, so chunk scores use the row scale only.
        row_scale = scales.reshape(n_chunks, chunk)
        bias_r = score_bias.reshape(n_chunks, chunk)
        base = (
            jnp.arange(n_chunks, dtype=jnp.int32) * chunk
        )

        def body(carry, xs):
            top_s, top_i = carry
            codes_c, scale_c, bias_c, base_c = xs
            iscores = jax.lax.dot_general(
                qq,
                codes_c,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (B, chunk)
            s = (
                iscores.astype(jnp.float32) * scale_c[None, :]
                + bias_c[None, :]
            )
            cs, ci = jax.lax.approx_max_k(
                s, k_over, recall_target=recall_target
            )
            ci = ci.astype(jnp.int32) + base_c
            ms = jnp.concatenate([top_s, cs], axis=1)
            mi = jnp.concatenate([top_i, ci], axis=1)
            ns, ni = topk_pair(ms, mi, k_over)
            return (ns, ni), None

        init = (
            jnp.full((b, k_over), -jnp.inf, jnp.float32),
            jnp.zeros((b, k_over), jnp.int32),
        )
        (top_s, top_i), _ = jax.lax.scan(
            body, init, (codes_r, row_scale, bias_r, base)
        )

        if fp32_embeddings is not None:
            # Exact fp32 rescore of the survivors: quantization decides
            # only WHICH rows reach here, never their final order.
            rows = jnp.take(
                fp32_embeddings, top_i, axis=0
            )  # (B, k_over, E)
            exact = jnp.einsum(
                "be,bke->bk",
                q,
                rows,
                preferred_element_type=jnp.float32,
            ) + jnp.take(score_bias, top_i)
            # Never resurrect invalid survivor slots: when the catalog
            # has fewer finite rows than k_over, top_k tie-breaks fill
            # the tail with the scan's -inf init entries, whose index 0
            # aliases a REAL row — rescoring it to a real score would
            # crowd the true top-k out with duplicates.
            exact = jnp.where(jnp.isneginf(top_s), -jnp.inf, exact)
            top_s, top_i = topk_pair(exact, top_i, k)
        else:
            # Dequantize to true score scale (t folds back in here).
            top_s = top_s[:, :k] * t
            top_i = top_i[:, :k]
        return top_s, jnp.take(identifiers, top_i)

    @staticmethod
    @partial(
        jax.jit,
        static_argnames=(
            "k", "k_over", "n_valid", "max_rounds", "fold"
        ),
    )
    def _topk_pallas(
        query_embeddings,  # (B, E) fp32
        codes,             # (N_pad, E) int8
        scales,            # (N_pad,)
        identifiers,       # (N_pad,)
        fp32_embeddings,   # (N_pad, E) or None
        k,
        k_over,
        n_valid,
        max_rounds,
        fold,
    ):
        """Fused-kernel survivor selection: top-k_over of the
        dequantized scores via pallas_quantized_topk (the catalog
        streams from HBM as int8), then the usual fp32 rescore."""
        from hm_retrieval_tpu.ops.pallas_retrieval import (
            pallas_quantized_topk,
        )

        q = query_embeddings.astype(jnp.float32)
        kk = k_over if fp32_embeddings is not None else k
        top_s, top_i, _ = pallas_quantized_topk(
            q,
            codes,
            scales,
            kk,
            n_valid=n_valid,
            max_rounds=max_rounds,
            fold=fold,
            # interpret off-TPU: slow but correct, keeps the method
            # testable on the fake CPU mesh
            interpret=jax.default_backend() != "tpu",
        )
        if fp32_embeddings is not None:
            rows = jnp.take(fp32_embeddings, top_i, axis=0)
            exact = jnp.einsum(
                "be,bke->bk",
                q,
                rows,
                preferred_element_type=jnp.float32,
            )
            # n_valid >= kk guarantees every survivor slot is a real
            # row (round 1 always reveals >= min(n_valid, 2L) distinct
            # valid elements), so no -inf resurrection case here; the
            # guard keeps the invariant explicit anyway.
            exact = jnp.where(jnp.isneginf(top_s), -jnp.inf, exact)
            top_s, top_i = topk_pair(exact, top_i, k)
        return top_s, jnp.take(identifiers, top_i)

    @staticmethod
    @partial(
        jax.jit,
        static_argnames=("k", "k_over", "n_valid", "fold"),
    )
    def _topk_pallas_global(
        query_embeddings,  # (B, E) fp32
        codes,             # (N_pad, E) int8, ONE shared scale
        global_scale,      # scalar fp32
        identifiers,       # (N_pad,)
        fp32_embeddings,   # (N_pad, E) or None
        k,
        k_over,
        n_valid,
        fold,
    ):
        """Global-scale survivor selection: the raw streaming kernel
        (no per-column dequant FMA) picks top-k_over, then the usual
        exact fp32 rescore."""
        from hm_retrieval_tpu.ops.pallas_retrieval import (
            pallas_quantized_topk_global,
        )

        q = query_embeddings.astype(jnp.float32)
        kk = k_over if fp32_embeddings is not None else k
        top_s, top_i, _ = pallas_quantized_topk_global(
            q,
            codes,
            global_scale,
            kk,
            n_valid=n_valid,
            fold=fold,
            interpret=jax.default_backend() != "tpu",
        )
        if fp32_embeddings is not None:
            rows = jnp.take(fp32_embeddings, top_i, axis=0)
            exact = jnp.einsum(
                "be,bke->bk",
                q,
                rows,
                preferred_element_type=jnp.float32,
            )
            exact = jnp.where(jnp.isneginf(top_s), -jnp.inf, exact)
            top_s, top_i = topk_pair(exact, top_i, k)
        return top_s, jnp.take(identifiers, top_i)

    def topk_from_embeddings(self, query_embeddings: jax.Array):
        """(B, E) query embeddings -> ((B, k) scores, (B, k) int ids)."""
        if (
            self.method == "pallas"
            and self.scale_mode == "global"
            and self.pallas_rounds == 1
        ):
            return self._topk_pallas_global(
                query_embeddings,
                self.codes,
                jnp.float32(self.global_scale),
                self.identifiers,
                self.embeddings,
                self.k,
                min(self.k_over, self.num_candidates),
                self.num_candidates,
                self.pallas_fold,
            )
        if self.method == "pallas":
            return self._topk_pallas(
                query_embeddings,
                self.codes,
                self.scales,
                self.identifiers,
                self.embeddings,
                self.k,
                min(self.k_over, self.num_candidates),
                self.num_candidates,
                self.pallas_rounds,
                self.pallas_fold,
            )
        return self._topk(
            query_embeddings,
            self.codes,
            self.scales,
            self._score_bias,
            self.identifiers,
            self.embeddings,
            self.k,
            self.k_over,
            self.chunk,
            self.recall_target,
        )

    def query(
        self,
        query_fn: Callable[[Batch], jax.Array],
        batch: Batch,
    ) -> jax.Array:
        """Embed queries, scan, select: (B, k) int ids."""
        _, ids = self.topk_from_embeddings(query_fn(batch))
        return ids

    # ------------------------------------------------------------------
    def save(self, dirpath: str) -> None:
        os.makedirs(dirpath, exist_ok=True)
        from hm_retrieval_tpu.indices.artifact import (
            clear_stale,
        )

        clear_stale(dirpath)  # drop any stale shard files
        arrays = {
            "identifiers": np.asarray(
                self.identifiers[: self.num_candidates]
            ),
            "codes": np.asarray(
                self.codes[: self.num_candidates]
            ),
            "scales": np.asarray(
                self.scales[: self.num_candidates]
            ),
        }
        if self.embeddings is not None:
            arrays["embeddings"] = np.asarray(
                self.embeddings[: self.num_candidates]
            )
        np.savez(os.path.join(dirpath, "index.npz"), **arrays)
        with open(os.path.join(dirpath, "meta.json"), "w") as f:
            json.dump(
                {
                    "k": self.k,
                    "type": "quantized",
                    "oversample": self.oversample,
                    "rescore": self.rescore,
                    "chunk": self.chunk,
                    "recall_target": self.recall_target,
                    "method": self.method,
                    "pallas_rounds": self.pallas_rounds,
                    "pallas_fold": self.pallas_fold,
                    "scale_mode": self.scale_mode,
                },
                f,
            )
        logger.info("Saved quantized index to %s", dirpath)

    @classmethod
    def load(cls, dirpath: str) -> "QuantizedIndex":
        with open(os.path.join(dirpath, "meta.json")) as f:
            meta = json.load(f)
        # Honor the saved survivor-selection method; remap pallas off
        # TPU (interpret mode would be correct but impractically slow
        # for a serving-size catalog).
        method = meta.get("method", "auto")
        if method == "pallas" and jax.default_backend() != "tpu":
            logger.warning(
                "Quantized index at %s was saved with method='pallas' "
                "but the current backend is %s; using 'scan'",
                dirpath,
                jax.default_backend(),
            )
            method = "scan"
        from hm_retrieval_tpu.indices.artifact import (
            load_index_arrays,
        )

        z = load_index_arrays(dirpath)  # single-file OR sharded layout
        rescore = meta.get("rescore", True)
        if rescore and "embeddings" in z:
            idx = cls(
                meta["k"],
                z["identifiers"],
                z["embeddings"],
                oversample=meta.get("oversample", 4),
                rescore=True,
                chunk=meta.get("chunk", 65536),
                recall_target=meta.get("recall_target", 0.95),
                method=method,
                pallas_rounds=meta.get("pallas_rounds", 1),
                pallas_fold=meta.get("pallas_fold"),
                scale_mode=meta.get("scale_mode", "per_row"),
            )
            # Preserve the exact saved codes (round-trip identity
            # regardless of requantization drift).
            n = idx.num_candidates
            idx.codes = idx.codes.at[:n].set(
                jnp.asarray(z["codes"])
            )
            idx.scales = idx.scales.at[:n].set(
                jnp.asarray(z["scales"])
            )
            return idx
        # No fp32 table stored: reconstruct from codes alone.
        idx = cls.__new__(cls)
        idx.k = meta["k"]
        idx.oversample = meta.get("oversample", 4)
        idx.rescore = False
        idx.recall_target = meta.get("recall_target", 0.95)
        idx.pallas_rounds = meta.get("pallas_rounds", 1)
        idx.pallas_fold = meta.get("pallas_fold")
        idx.scale_mode = meta.get("scale_mode", "per_row")
        codes = z["codes"]
        scales = z["scales"]
        idx.global_scale = (
            float(scales[0]) if idx.scale_mode == "global" else None
        )
        identifiers = z["identifiers"]
        idx.num_candidates = len(identifiers)
        n_pad = _pad_to_multiple(
            idx.num_candidates, cls.PAD_MULTIPLE
        )
        idx.chunk = int(
            min(meta.get("chunk", 65536), n_pad)
        )
        n_pad = _pad_to_multiple(
            idx.num_candidates, idx.chunk
        )
        idx.k_over = int(
            min(max(idx.oversample * idx.k, idx.k), idx.chunk)
        )
        idx.method = _resolve_method(
            method, idx.k, codes.shape[1]
        )
        codes_p = np.zeros(
            (n_pad, codes.shape[1]), np.int8
        )
        codes_p[: idx.num_candidates] = codes
        scales_p = np.zeros((n_pad,), np.float32)
        scales_p[: idx.num_candidates] = scales
        bias = np.zeros((n_pad,), np.float32)
        bias[idx.num_candidates:] = -np.inf
        ids = np.zeros((n_pad,), identifiers.dtype)
        ids[: idx.num_candidates] = identifiers
        idx.codes = jnp.asarray(codes_p)
        idx.scales = jnp.asarray(scales_p)
        idx._score_bias = jnp.asarray(bias)
        idx.identifiers = jnp.asarray(ids)
        idx.embeddings = None
        return idx
