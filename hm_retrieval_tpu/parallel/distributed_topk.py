"""Distributed exact brute-force top-k over a sharded candidate matrix.

SURVEY §2.9 "distributed top-k retrieval": the reference computes one
``top_k`` over the whole (N, E) matrix on one device
(ref: brute_force.py:75-83). Here the candidate matrix is row-sharded over
the mesh; each device scores its (N/S, E) shard against the (replicated)
queries, takes a local (B, k) leaderboard, and the per-shard winners are
all-gathered and k-way merged — communication is O(S * B * k), never
O(B * N).

Shards are padded to equal rows; pad rows carry a -inf score bias so they
are never selected (same trick as indices/brute_force.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from hm_retrieval_tpu.ops.topk import topk_pair
from hm_retrieval_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    place_global,
)


def shard_candidates(
    embeddings: np.ndarray,   # (N, E)
    identifiers: np.ndarray,  # (N,)
    mesh,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pad + place (embeddings, identifiers, score_bias) row-sharded over
    the model axis."""
    S = mesh.shape[MODEL_AXIS]
    n = embeddings.shape[0]
    per = -(-n // S)
    total = per * S
    emb = np.zeros((total, embeddings.shape[1]), np.float32)
    emb[:n] = embeddings
    ids = np.zeros((total,), np.int32)
    ids[:n] = identifiers
    bias = np.full((total,), 0.0, np.float32)
    bias[n:] = -np.inf
    row_shard = NamedSharding(mesh, P(MODEL_AXIS, None))
    vec_shard = NamedSharding(mesh, P(MODEL_AXIS))
    return (
        place_global(emb, row_shard),
        place_global(ids, vec_shard),
        place_global(bias, vec_shard),
    )


def make_distributed_topk(
    mesh,
    k: int,
    method: str = "xla",
    interpret: bool = False,
    compute_dtype=None,
    data_sharded_queries: bool = False,
):
    """Returns topk(queries, emb, ids, bias) -> (scores (B,k), ids (B,k)).

    ``queries`` replicated (or sharded ``P("data")`` with
    ``data_sharded_queries=True`` — each data-axis group then scores only
    its B/D query rows against every catalog shard, the 2-D
    DP-over-queries x MP-over-catalog layout; B must divide by the data
    axis size); ``emb``/``ids``/``bias`` row-sharded as placed by
    ``shard_candidates``.

    ``method``: "xla" materializes each shard's (B, N/S) score block and
    takes ``lax.top_k``; "pallas" runs the streaming bin-max kernel
    (ops/pallas_retrieval.py) per shard, never materializing scores in
    HBM — the production path on real chips (``interpret=True`` runs it
    on CPU for tests). Pad rows can't be excluded by a static row count
    under SPMD (the count differs per shard), so the pallas path folds
    the -inf score bias into the matmul as an extra feature column:
    queries get a 1.0 coordinate and every row its bias, making pad-row
    scores -inf exactly as the XLA path's ``+ bias`` does.
    """
    if method not in ("xla", "pallas"):
        raise ValueError(f"unknown method {method!r}")

    def local(queries, emb_shard, ids_shard, bias_shard):
        kk = min(k, emb_shard.shape[0])
        if method == "pallas":
            from hm_retrieval_tpu.ops.pallas_retrieval import (
                pallas_exact_topk,
            )

            q_aug = jnp.concatenate(
                [queries, jnp.ones((queries.shape[0], 1), queries.dtype)],
                axis=1,
            )
            c_aug = jnp.concatenate(
                [emb_shard, bias_shard[:, None].astype(emb_shard.dtype)],
                axis=1,
            )
            kw = (
                {}
                if compute_dtype is None
                else {"compute_dtype": compute_dtype}
            )
            ls, li, _ = pallas_exact_topk(
                q_aug, c_aug, kk, interpret=interpret, **kw
            )
        else:
            # (B, n_local) local scores
            s = (
                jnp.dot(
                    queries,
                    emb_shard.T,
                    preferred_element_type=jnp.float32,
                )
                + bias_shard[None, :]
            )
            ls, li = jax.lax.top_k(s, kk)          # (B, kk) local
        lids = jnp.take(ids_shard, li, axis=0)     # (B, kk) global ids
        # Gather every shard's leaderboard: (S, B, kk)
        all_s = jax.lax.all_gather(ls, MODEL_AXIS)
        all_i = jax.lax.all_gather(lids, MODEL_AXIS)
        S, B, _ = all_s.shape
        flat_s = jnp.transpose(all_s, (1, 0, 2)).reshape(B, S * kk)
        flat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(B, S * kk)
        return topk_pair(flat_s, flat_i, k)

    q_spec = P(DATA_AXIS) if data_sharded_queries else P()
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            q_spec,
            P(MODEL_AXIS, None),
            P(MODEL_AXIS),
            P(MODEL_AXIS),
        ),
        out_specs=(q_spec, q_spec),
        check_vma=False,
    )


# ---------------------------------------------------------------------------
# Quantized distributed retrieval (int8 shards; indices/quantized.py
# semantics per shard, all-gather merge of the exact-rescored winners)
# ---------------------------------------------------------------------------


def shard_candidates_quantized(
    embeddings: np.ndarray,   # (N, E)
    identifiers: np.ndarray,  # (N,)
    mesh,
    keep_fp32: bool = True,
):
    """Pad + quantize + place the catalog row-sharded over the model
    axis: returns (codes int8, scales, fp32 embeddings or None, ids,
    bias). With ``keep_fp32=False`` each shard holds only 1/4 of the
    fp32 footprint (the memory knob that lets a catalog 4x too big for
    the slice still be scanned)."""
    from hm_retrieval_tpu.indices.quantized import quantize_rows

    S = mesh.shape[MODEL_AXIS]
    n = embeddings.shape[0]
    per = -(-n // S)
    total = per * S
    emb = np.zeros((total, embeddings.shape[1]), np.float32)
    emb[:n] = embeddings
    ids = np.zeros((total,), np.int32)
    ids[:n] = identifiers
    bias = np.zeros((total,), np.float32)
    bias[n:] = -np.inf
    codes, scales = quantize_rows(emb)
    scales[n:] = 0.0  # pad rows contribute nothing pre-bias

    row_shard = NamedSharding(mesh, P(MODEL_AXIS, None))
    vec_shard = NamedSharding(mesh, P(MODEL_AXIS))
    return (
        place_global(codes, row_shard),
        place_global(scales, vec_shard),
        place_global(emb, row_shard) if keep_fp32 else None,
        place_global(ids, vec_shard),
        place_global(bias, vec_shard),
    )


def make_distributed_quantized_topk(
    mesh,
    k: int,
    oversample: int = 4,
    recall_target: float = 0.95,
    rescore: bool = True,
    method: str = "scan",
    interpret: bool = False,
    pallas_rounds: int = 1,
    pallas_fold: int = None,
    data_sharded_queries: bool = False,
):
    """Returns topk(queries, codes, scales, emb_or_None, ids, bias) ->
    ((B, k) scores, (B, k) ids) over shards placed by
    ``shard_candidates_quantized``. ``data_sharded_queries`` shards the
    query batch ``P("data")`` (DP-over-queries x MP-over-catalog; B must
    divide by the data axis size) instead of replicating it.

    Per shard: an int8 catalog scan selects ``oversample * k``
    survivors — ``method="scan"`` is the int8 x int8 MXU scan with a
    hardware-PartialReduce merge, ``method="pallas"`` streams the fused
    bin-max kernel over the int8 shard (exact top-k_over of the
    dequantized scores, 1/4 the HBM bytes of the fp32 exact kernel;
    ``interpret=True`` runs it on CPU for tests) — then an optional
    exact fp32 rescore of the local survivors, one all-gather of the
    (B, k) per-shard leaderboards, and a k-way merge. Communication
    stays O(S * B * k). Because each shard rescores its own winners in
    fp32 BEFORE the merge, the merged ordering is exact over the union
    of surviving rows — quantization only decides which rows survive
    per shard."""
    if method not in ("scan", "pallas"):
        raise ValueError(f"unknown method {method!r}")

    def local(queries, codes_shard, scales_shard, emb_shard,
              ids_shard, bias_shard):
        n_local = codes_shard.shape[0]
        kk = min(k, n_local)
        k_over = min(max(oversample * kk, kk), n_local)

        q = queries.astype(jnp.float32)
        if method == "pallas":
            from hm_retrieval_tpu.indices.quantized import (
                shrink_survivors,
            )
            from hm_retrieval_tpu.ops.pallas_retrieval import (
                pallas_quantized_topk,
            )

            # large k x oversample can exceed every feasible bin
            # layout (survivors must fit k_over <= L <= 2048 within
            # VMEM): shrink the per-shard survivor set instead of
            # failing. With the fp32 rescore the per-bin top-2 bounds
            # recall at k'~L, not the survivor count (BASELINE.md
            # k=1000 sweep); WITHOUT it the output is truncated to kk
            # anyway, so shrinking is output-preserving. Shared policy
            # with the single-device index (quantized.py); all static
            # python — resolved once at trace time, identical shards.
            k_over = shrink_survivors(
                kk, k_over, codes_shard.shape[1]
            )

            # Pad rows can't be excluded by a static row count under
            # SPMD; the kernel's bias row carries their -inf instead.
            cs, ci, _ = pallas_quantized_topk(
                q,
                codes_shard,
                scales_shard,
                k_over,
                bias=bias_shard,
                max_rounds=pallas_rounds,
                fold=pallas_fold,
                interpret=interpret,
            )
            # A shard with < k_over finite-bias rows leaves -inf
            # leaderboard slots whose index is a sentinel: clamp for
            # gather safety; the -inf value keeps them out of merges.
            ci = jnp.clip(ci, 0, n_local - 1)
            t = None
        else:
            t = jnp.max(jnp.abs(q), axis=1, keepdims=True) / 127.0
            t = jnp.maximum(t, jnp.float32(1e-30))
            qq = jnp.clip(jnp.rint(q / t), -127, 127).astype(jnp.int8)

            iscores = jax.lax.dot_general(
                qq,
                codes_shard,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (B, n_local)
            s = (
                iscores.astype(jnp.float32) * scales_shard[None, :]
                + bias_shard[None, :]
            )
            cs, ci = jax.lax.approx_max_k(
                s, k_over, recall_target=recall_target
            )
        if emb_shard is not None:
            rows = jnp.take(emb_shard, ci, axis=0)  # (B, k_over, E)
            exact = jnp.einsum(
                "be,bke->bk",
                q,
                rows,
                preferred_element_type=jnp.float32,
            ) + jnp.take(bias_shard, ci)
            # Never resurrect unfilled/-inf survivor slots as real rows.
            exact = jnp.where(jnp.isneginf(cs), -jnp.inf, exact)
            ls, li = topk_pair(exact, ci, kk)
        elif method == "pallas":
            # already true-scale dequantized scores (bf16 queries)
            ls, li = cs[:, :kk], ci[:, :kk]
        else:
            ls = cs[:, :kk] * t  # back to true score scale
            li = ci[:, :kk]
        lids = jnp.take(ids_shard, li, axis=0)

        all_s = jax.lax.all_gather(ls, MODEL_AXIS)
        all_i = jax.lax.all_gather(lids, MODEL_AXIS)
        S, B, _ = all_s.shape
        flat_s = jnp.transpose(all_s, (1, 0, 2)).reshape(B, S * kk)
        flat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(B, S * kk)
        return topk_pair(flat_s, flat_i, k)

    q_spec = P(DATA_AXIS) if data_sharded_queries else P()

    def topk(queries, codes, scales, emb, ids, bias):
        if emb is None:
            fn = shard_map(
                lambda q, c, s, i, b: local(q, c, s, None, i, b),
                mesh=mesh,
                in_specs=(
                    q_spec,
                    P(MODEL_AXIS, None),
                    P(MODEL_AXIS),
                    P(MODEL_AXIS),
                    P(MODEL_AXIS),
                ),
                out_specs=(q_spec, q_spec),
                check_vma=False,
            )
            return fn(queries, codes, scales, ids, bias)
        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(
                q_spec,
                P(MODEL_AXIS, None),
                P(MODEL_AXIS),
                P(MODEL_AXIS, None),
                P(MODEL_AXIS),
                P(MODEL_AXIS),
            ),
            out_specs=(q_spec, q_spec),
            check_vma=False,
        )
        return fn(queries, codes, scales, emb, ids, bias)

    return topk
