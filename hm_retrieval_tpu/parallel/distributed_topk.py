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

from hm_retrieval_tpu.parallel.mesh import MODEL_AXIS


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
        jax.device_put(emb, row_shard),
        jax.device_put(ids, vec_shard),
        jax.device_put(bias, vec_shard),
    )


def make_distributed_topk(
    mesh,
    k: int,
    method: str = "xla",
    interpret: bool = False,
    compute_dtype=None,
):
    """Returns topk(queries, emb, ids, bias) -> (scores (B,k), ids (B,k)).

    ``queries`` replicated; ``emb``/``ids``/``bias`` row-sharded as placed
    by ``shard_candidates``.

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
        ms, sel = jax.lax.top_k(flat_s, k)
        return ms, jnp.take_along_axis(flat_i, sel, axis=1)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),
            P(MODEL_AXIS, None),
            P(MODEL_AXIS),
            P(MODEL_AXIS),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
