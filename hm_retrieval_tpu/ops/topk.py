"""Exact top-k retrieval ops: score + select.

The retrieval hot loop (SURVEY §3.3): ``scores = Q @ C^T`` then top-k
(ref: pkg/modelling/indices/brute_force.py:75-83). Three implementations,
all exact:

- ``topk_dot``: one fused XLA ``dot`` + ``lax.top_k`` over the full (B, N)
  score matrix. Best when (B, N) fits comfortably in HBM.
- ``topk_dot_chunked``: lax.scan over N-chunks keeping a running (B, k)
  leaderboard, so the (B, N) matrix is never materialized — the
  streaming-top-k design SURVEY §7 calls for (the Pallas fused kernel in
  ops/pallas_topk.py pushes the same idea into VMEM).
- ``merge_topk``: k-way merge of per-shard top-k results — the reduction
  step for the distributed index (parallel/distributed_topk.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def topk_pair(vals: jax.Array, ids: jax.Array, k: int):
    """Exact row-wise top-k over (value, id) pairs, ids as payload.

    For small k, ``lax.top_k`` + a row-wise gather: top_k lowers to the
    hardware PartialReduce and the (B, k) gather is cheap. For large k,
    ONE stable variadic sort carries the ids alongside the values
    (``num_keys=1``) — measured 5x on v5e at (1024, 4096) -> k=1000,
    where the row-wise ``take_along_axis`` gather (10.6 of 12.2 ms),
    not the sort, was the cost (BASELINE.md round 5).

    Ties: both paths order equal values by position (stable sort /
    top_k contract), so results are identical.
    """
    if k > vals.shape[-1]:
        # lax.top_k raises here; the sort path's slice would silently
        # clamp to fewer than k columns — keep the loud contract
        raise ValueError(
            f"k={k} exceeds input width {vals.shape[-1]}"
        )
    if k <= 256:
        v, sel = lax.top_k(vals, k)
        return v, jnp.take_along_axis(ids, sel, axis=1)
    nv, ni = lax.sort(
        (-vals, ids), num_keys=1, is_stable=True
    )
    return -nv[..., :k], ni[..., :k]


@partial(jax.jit, static_argnames=("k",))
def topk_dot(
    queries: jax.Array,      # (B, E)
    candidates: jax.Array,   # (N, E)
    k: int,
):
    """Returns (scores (B, k), indices (B, k)) — exact top-k of Q @ C^T."""
    scores = jnp.dot(
        queries, candidates.T, preferred_element_type=jnp.float32
    )
    return lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("k", "chunk_size"))
def topk_dot_chunked(
    queries: jax.Array,      # (B, E)
    candidates: jax.Array,   # (N, E), N divisible by chunk_size
    k: int,
    chunk_size: int = 4096,
):
    """Streaming exact top-k: scan over candidate chunks, merging each
    chunk's top-k into a running (B, k) leaderboard. Peak memory is
    O(B*chunk + B*2k) instead of O(B*N)."""
    B, E = queries.shape
    N = candidates.shape[0]
    if N % chunk_size != 0:
        raise ValueError(
            f"N={N} must be divisible by chunk_size={chunk_size}; pad the "
            "candidate matrix (pad rows score -inf via zero embeddings "
            "+ masking at call site)"
        )
    kc = min(k, chunk_size)
    chunks = candidates.reshape(N // chunk_size, chunk_size, E)

    def body(carry, chunk_pair):
        best_s, best_i = carry
        chunk, start = chunk_pair
        s = jnp.dot(queries, chunk.T, preferred_element_type=jnp.float32)
        cs, ci = lax.top_k(s, kc)  # (B, kc) within-chunk
        ci = ci + start
        all_s = jnp.concatenate([best_s, cs], axis=1)
        all_i = jnp.concatenate([best_i, ci], axis=1)
        ns, ni = topk_pair(all_s, all_i, k)
        return (ns, ni), None

    init = (
        jnp.full((B, k), -jnp.inf, jnp.float32),
        jnp.zeros((B, k), jnp.int32),
    )
    starts = jnp.arange(0, N, chunk_size, dtype=jnp.int32)
    (scores, indices), _ = lax.scan(body, init, (chunks, starts))
    return scores, indices


@partial(jax.jit, static_argnames=("k",))
def merge_topk(
    shard_scores: jax.Array,   # (S, B, k) per-shard top-k scores
    shard_ids: jax.Array,      # (S, B, k) per-shard candidate ids (global)
    k: int,
):
    """Merge S per-shard leaderboards into the global (B, k) top-k."""
    S, B, ks = shard_scores.shape
    flat_s = jnp.transpose(shard_scores, (1, 0, 2)).reshape(B, S * ks)
    flat_i = jnp.transpose(shard_ids, (1, 0, 2)).reshape(B, S * ks)
    return topk_pair(flat_s, flat_i, k)
