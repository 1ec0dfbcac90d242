"""Row-sharded embedding tables with cross-shard lookup.

SURVEY §2.9: the only large tensors in a two-tower model are the id
embedding tables (customer_id ~1.4M x 128, article_id ~10^5 x E; the
synthetic scale config targets 10M+ rows). One table can exceed a single
chip's HBM budget once optimizer state is counted, so tables are
row-sharded ``P("model", None)`` across the mesh and lookups exchange data
over ICI.

Sharding layout: **contiguous blocks** — shard s of S owns rows
``[s*R, (s+1)*R)`` where ``R = ceil(V/S)`` (tables are padded to S*R rows).
Owner of id i is ``i // R`` (a shift, no division tables needed).

Two exchange strategies, both differentiable under shard_map AD:

- ``lookup_psum`` (default): every shard gathers the ids it owns (others
  masked to its base row, results zeroed) and the partial results are
  psum'd over the model axis. Communication: one (B, E) psum — optimal
  when B*E is small relative to bucketed all-to-all bookkeeping, which is
  exactly the two-tower regime (B≈4k, E≈128 -> 2MB).
- ``lookup_all_to_all``: ids are DEDUPLICATED (``jnp.unique`` + inverse
  map — a Zipf-hot id occupies one exchange slot regardless of its batch
  multiplicity, SURVEY §7 hard part #4), bucketed by owning shard with a
  static per-shard capacity, exchanged via ``all_to_all``, gathered
  locally, and sent back; duplicates are re-expanded locally from the
  unique results. Communication: 2 * (S * cap * E / S) with
  cap = min(B, R) by default (a shard cannot own more than its R rows'
  worth of distinct ids) — the DLRM-style pattern (PAPERS.md sharding
  papers). ``capacity`` tightens cap further when the id distribution is
  known to be skewed; overflow poisons the output with NaN (loud, never
  silently wrong).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from hm_retrieval_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def padded_rows(vocab_rows: int, num_shards: int) -> Tuple[int, int]:
    """(rows_per_shard, padded_total)."""
    r = -(-vocab_rows // num_shards)
    return r, r * num_shards


def shard_table(table: np.ndarray, mesh) -> jax.Array:
    """Pad a (V, E) host table to shard-divisible rows and place it
    row-sharded over the model axis."""
    num_shards = mesh.shape[MODEL_AXIS]
    _, total = padded_rows(table.shape[0], num_shards)
    padded = np.zeros((total, table.shape[1]), table.dtype)
    padded[: table.shape[0]] = table
    return jax.device_put(
        padded, NamedSharding(mesh, P(MODEL_AXIS, None))
    )


def make_sharded_lookup(
    mesh, strategy: str = "psum", capacity: int = None
):
    """Returns lookup(table, ids) -> (B, E) embeddings.

    ``table``: (S*R, E) row-sharded P("model", None).
    ``ids``:   (B,) int32, replicated over the model axis (each data shard
               looks up its own batch; the model axis cooperates).
    ``capacity``: per-destination-shard slot count for the
               ``all_to_all`` exchange, AFTER deduplication — sets the
               comm volume to O(S * capacity * E). Default
               min(B, rows_per_shard), which is always exact. Lower
               values exploit known skew (Zipf article ids dedup to far
               fewer uniques); if any shard's deduped demand exceeds
               capacity the output is NaN-poisoned rather than silently
               truncated.
    """
    if strategy not in ("psum", "all_to_all"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if capacity is not None and capacity < 1:
        raise ValueError("capacity must be >= 1")

    def local_psum(table_shard, ids):
        # table_shard: (R, E) — this shard's rows; ids: (B,) global ids.
        R = table_shard.shape[0]
        shard = jax.lax.axis_index(MODEL_AXIS)
        base = shard * R
        local = ids - base                       # (B,) maybe out of range
        mine = (local >= 0) & (local < R)
        safe = jnp.where(mine, local, 0)
        rows = jnp.take(table_shard, safe, axis=0)  # (B, E)
        rows = jnp.where(mine[:, None], rows, 0.0)
        return jax.lax.psum(rows, MODEL_AXIS)

    def local_all_to_all(table_shard, ids):
        # Deduplicated static-capacity bucketed exchange: unique ids
        # only ride the interconnect (a hot id sends ONE row however
        # many batch slots repeat it); duplicates re-expand locally via
        # the inverse map after the round trip.
        R = table_shard.shape[0]
        S = jax.lax.axis_size(MODEL_AXIS)
        B = ids.shape[0]
        cap = min(B, R) if capacity is None else min(capacity, B, R)
        uids, inv = jnp.unique(
            ids, size=B, fill_value=-1, return_inverse=True
        )  # fill slots land at the END (sorted uniques first)
        valid = uids >= 0
        owner = jnp.where(valid, uids // R, S)  # fills sort last
        # Sort unique ids by owner to build contiguous buckets.
        order = jnp.argsort(owner)
        sorted_uids = uids[order]
        sorted_owner = owner[order]
        sorted_valid = valid[order]
        # position of each element within its owner bucket
        pos_in_bucket = jnp.arange(B) - jnp.searchsorted(
            sorted_owner, sorted_owner, side="left"
        )
        fits = sorted_valid & (pos_in_bucket < cap)
        # Demand above capacity is a configuration error: poison the
        # result (NaN) instead of silently dropping rows.
        overflow = jnp.any(sorted_valid & ~fits)
        dest = jnp.where(fits, sorted_owner, S)     # OOB -> dropped
        slot = jnp.where(fits, pos_in_bucket, cap)  # OOB -> dropped
        send_ids = (
            jnp.zeros((S, cap), jnp.int32)
            .at[dest, slot]
            .set(sorted_uids - sorted_owner * R, mode="drop")
        )
        send_mask = (
            jnp.zeros((S, cap), bool)
            .at[dest, slot]
            .set(True, mode="drop")
        )
        # Exchange: shard s receives the requests destined to it.
        recv_ids = jax.lax.all_to_all(
            send_ids, MODEL_AXIS, split_axis=0, concat_axis=0,
            tiled=False,
        )                                      # (S, cap) requests for me
        recv_mask = jax.lax.all_to_all(
            send_mask, MODEL_AXIS, split_axis=0, concat_axis=0,
            tiled=False,
        )
        safe = jnp.where(recv_mask, recv_ids, 0)
        rows = jnp.take(table_shard, safe.reshape(-1), axis=0)
        rows = rows.reshape(S, cap, -1)
        rows = jnp.where(recv_mask[:, :, None], rows, 0.0)
        # Send results back to requesters.
        back = jax.lax.all_to_all(
            rows, MODEL_AXIS, split_axis=0, concat_axis=0,
            tiled=False,
        )                                      # (S, cap, E) my answers
        # Unscramble to unique order, then re-expand duplicates.
        g_dest = jnp.where(fits, sorted_owner, 0)
        g_slot = jnp.where(fits, pos_in_bucket, 0)
        gathered = back[g_dest, g_slot]        # (B, E) sorted order
        gathered = jnp.where(fits[:, None], gathered, 0.0)
        uout = (
            jnp.zeros((B, rows.shape[-1]), rows.dtype)
            .at[order]
            .set(gathered)
        )
        out = jnp.take(uout, inv, axis=0)      # back to batch order
        # poison multiplier in the TABLE dtype: a float32 scalar would
        # silently promote bf16 lookups to float32
        return out * jnp.where(
            overflow, jnp.nan, 1.0
        ).astype(out.dtype)

    fn = local_psum if strategy == "psum" else local_all_to_all
    # ids are sharded over the data axis (each data shard looks up its own
    # local batch) and replicated over the model axis; the table is the
    # reverse. Collectives run over the model axis only, so DP composes.
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,
    )
