"""Shared catalog-collection loops for index builders.

All index families build the same way (ref: pkg/modelling/runner.py:88-93
embeds the catalog in batches, brute_force.py:31-52 materializes it):
embed every candidate batch with the candidate tower at a FIXED padded
batch size (so the tower compiles exactly once), trim each tail back to
its true row count, and either concatenate ids + embeddings on the host
(``collect_catalog``, the single-device path) or stream them straight
into mesh-sharded device placement (``collect_catalog_sharded``) so peak
host memory stays O(N*E/S) — the sharded-scale analog the reference's
single-device materialization cannot express.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Iterable, Iterator, Tuple

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

Batch = Dict[str, jax.Array]

logger = logging.getLogger(__name__)


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


def collect_catalog_device(
    candidate_id_col: str,
    embed_fn: Callable[[Batch], jax.Array],
    batches: Iterable[Batch],
    batch_size: int,
) -> Tuple[np.ndarray, jax.Array]:
    """Like ``collect_catalog`` but the embeddings NEVER leave the
    device: per-batch tower outputs stay as device arrays and are
    concatenated on device. Feeding the result straight into an index
    constructor (which accepts jax.Array since round 5) removes the
    device->host->device round trip of the per-epoch rebuild — at
    N=1M that round trip is the whole cost on a slow link (BASELINE.md
    index-build table: ~45 ms of chip time vs 40 s e2e through the
    relay). Ids stay on host (they are O(N) int32, not O(N*E))."""
    import jax.numpy as jnp

    ids_parts, emb_parts = [], []
    for batch in batches:
        n = len(batch[candidate_id_col])
        padded = _pad_batch_rows(batch, batch_size, n)
        emb_parts.append(embed_fn(padded)[:n])
        ids_parts.append(np.asarray(batch[candidate_id_col])[:n])
    return np.concatenate(ids_parts), jnp.concatenate(emb_parts)


# ---------------------------------------------------------------------------
# Streaming sharded build: rows flow batch -> shard buffer -> device shard
# without ever materializing the host (N, E) fp32 catalog.
# ---------------------------------------------------------------------------


def _pad_batch_rows(batch: Batch, batch_size: int, n: int) -> Batch:
    # oversized batches pass through unpadded (collect_catalog's
    # behavior: they merely recompile), instead of np.pad crashing on
    # negative widths
    if n >= batch_size:
        return batch

    def _pad(v):
        v = np.asarray(v)
        widths = [(0, batch_size - n)] + [(0, 0)] * (v.ndim - 1)
        return np.pad(v, widths)

    return {key: _pad(v) for key, v in batch.items()}


def iter_embedded_blocks(
    candidate_id_col: str,
    embed_fn: Callable[[Batch], jax.Array],
    batches: Iterable[Batch],
    batch_size: int,
) -> Iterator[Tuple[np.ndarray, Callable[[], np.ndarray]]]:
    """Yield ``(ids_block, embed_thunk)`` per candidate batch. The thunk
    runs the candidate tower lazily, so a process that owns none of a
    block's destination shards skips its embedding compute entirely
    (the redundant-everywhere embed of the replicated build is the cost
    this path removes)."""
    for batch in batches:
        n = len(batch[candidate_id_col])
        padded = _pad_batch_rows(batch, batch_size, n)
        ids = np.asarray(padded[candidate_id_col])[:n]

        def thunk(padded=padded, n=n):
            return np.asarray(embed_fn(padded))[:n]

        yield ids, thunk


def place_catalog_rows(
    row_blocks: Iterable[Tuple[np.ndarray, Callable[[], np.ndarray]]],
    num_rows: int,
    dim: int,
    mesh,
    quantize: bool = False,
    keep_fp32: bool = True,
    stats: dict = None,
):
    """Stream ``(ids_block, embed_thunk)`` row blocks (in catalog row
    order) into mesh-sharded placement over the model axis.

    Peak host memory is one shard buffer — O(ceil(N/S) * E) fp32 plus
    its int8 codes when ``quantize`` — never the full (N, E) catalog
    (the replicated analog of ref: brute_force.py:31-52 holds all of it
    on every host). Each model-axis shard is finalized as soon as its
    rows have streamed past: quantized (per-row int8, exactly
    ``quantize_rows``' layout), copied to every addressable device that
    holds it, and the reusable buffer rolls on to the next shard.
    Multi-host: a process only embeds blocks overlapping shards its
    devices own, and the global arrays are assembled from per-device
    shards (``jax.make_array_from_single_device_arrays``).

    Returns ``(ids_host (total,), placed)`` where ``placed`` is a dict
    with keys ``emb`` (or ``codes``/``scales`` when quantizing, plus
    ``emb`` when ``keep_fp32``), ``ids``, ``bias`` — the exact layouts
    of ``parallel.distributed_topk.shard_candidates[_quantized]``.
    ``stats`` (optional dict) receives ``peak_host_bytes`` and
    ``embedded_blocks`` for memory/compute accounting in tests."""
    from hm_retrieval_tpu.parallel.mesh import MODEL_AXIS

    S = mesh.shape[MODEL_AXIS]
    per = -(-num_rows // S)
    total = per * S
    row_shard = NamedSharding(mesh, P(MODEL_AXIS, None))
    vec_shard = NamedSharding(mesh, P(MODEL_AXIS))

    # model-shard id -> addressable devices holding it (replicated
    # across the data axis, so usually several devices per shard)
    devs_by_shard: Dict[int, list] = {}
    for dev, idx in row_shard.addressable_devices_indices_map(
        (total, dim)
    ).items():
        start = idx[0].start or 0
        devs_by_shard.setdefault(start // per, []).append(dev)
    owned = set(devs_by_shard)

    ids_host = np.zeros((total,), np.int32)
    buf = np.zeros((per, dim), np.float32)  # reused per shard
    per_dev: Dict[str, list] = {
        name: []
        for name in (
            ("codes", "scales") if quantize else ()
        )
        + (("emb",) if (not quantize or keep_fp32) else ())
        + ("ids", "bias")
    }
    embedded_blocks = 0
    peak = buf.nbytes + ids_host.nbytes

    def finalize(s: int, fill: int):
        nonlocal peak
        if s not in owned:
            return
        if fill < per:
            buf[fill:] = 0.0
        arrs = {}
        if quantize:
            from hm_retrieval_tpu.indices.quantized import (
                quantize_rows,
            )

            codes, scales = quantize_rows(buf)
            scales[fill:] = 0.0  # pad rows contribute nothing pre-bias
            arrs["codes"] = codes
            arrs["scales"] = scales
            if keep_fp32:
                arrs["emb"] = buf.copy()
        else:
            # device_put of host numpy may alias on some backends; the
            # buffer is reused, so hand each shard its own copy
            arrs["emb"] = buf.copy()
        bias = np.zeros((per,), np.float32)
        bias[fill:] = -np.inf
        arrs["bias"] = bias
        arrs["ids"] = ids_host[s * per : (s + 1) * per].copy()
        peak = max(
            peak,
            buf.nbytes
            + ids_host.nbytes
            + sum(a.nbytes for a in arrs.values()),
        )
        for dev in devs_by_shard[s]:
            for name, a in arrs.items():
                per_dev[name].append(jax.device_put(a, dev))

    cursor = 0
    s_cur = 0
    fill = 0
    for ids_block, embed_thunk in row_blocks:
        nb = len(ids_block)
        if cursor + nb > total:
            raise ValueError(
                f"catalog stream yielded more than the declared "
                f"{num_rows} rows"
            )
        ids_host[cursor : cursor + nb] = ids_block
        s_lo = cursor // per
        s_hi = (cursor + nb - 1) // per if nb else s_lo
        need = any(s in owned for s in range(s_lo, s_hi + 1))
        emb = None
        if need:
            emb = embed_thunk()
            embedded_blocks += 1
            if emb.shape != (nb, dim):
                raise ValueError(
                    f"embed_fn returned {emb.shape}, expected "
                    f"({nb}, {dim})"
                )
        off = 0
        while off < nb:
            take = min(per - fill, nb - off)
            if emb is not None and s_cur in owned:
                buf[fill : fill + take] = emb[off : off + take]
            fill += take
            off += take
            cursor += take
            if fill == per:
                finalize(s_cur, per)
                s_cur += 1
                fill = 0
    if cursor != num_rows:
        raise ValueError(
            f"catalog stream yielded {cursor} rows, expected "
            f"{num_rows}"
        )
    if fill:
        finalize(s_cur, fill)
        s_cur += 1
    while s_cur < S:
        # trailing shards with ZERO real rows (ceil rounding can leave
        # them when N < (S-1)*per + per): still need their all-pad
        # device arrays or the global assembly below is incomplete
        finalize(s_cur, 0)
        s_cur += 1

    if stats is not None:
        stats["peak_host_bytes"] = peak
        stats["embedded_blocks"] = embedded_blocks
        stats["rows_per_shard"] = per

    placed = {}
    for name, arrays in per_dev.items():
        if name in ("emb", "codes"):
            shape, shd = (total, dim), row_shard
        else:
            shape, shd = (total,), vec_shard
        placed[name] = jax.make_array_from_single_device_arrays(
            shape, shd, arrays
        )
    logger.info(
        "Streamed %d catalog rows into %d model shards "
        "(%d rows/shard, peak host %.1f MB)",
        num_rows,
        S,
        per,
        peak / 1e6,
    )
    return ids_host, placed


def collect_catalog_sharded(
    candidate_id_col: str,
    embed_fn: Callable[[Batch], jax.Array],
    batches: Iterable[Batch],
    batch_size: int,
    mesh,
    num_candidates: int = None,
    dim: int = None,
    quantize: bool = False,
    keep_fp32: bool = True,
    stats: dict = None,
):
    """Sharded-build entry: embed the catalog in fixed-size batches and
    stream the rows into model-axis-sharded placement (see
    ``place_catalog_rows``).

    ``num_candidates`` should come from the dataset manifest
    (``ShardDataset.num_rows``); when absent the FEATURE batches (int32
    id columns — typically ~E/n_features smaller than the embeddings)
    are materialized once to count rows before streaming."""
    if num_candidates is None:
        batches = list(batches)
        num_candidates = sum(
            len(b[candidate_id_col]) for b in batches
        )
    if dim is None:
        # probe the embedding width with one padded forward of the
        # first batch, peeked without materializing the rest (the
        # block is re-embedded later only if its rows are owned)
        import itertools

        it = iter(batches)
        first = next(it, None)
        if first is None:
            raise ValueError("no candidate batches")
        batches = itertools.chain([first], it)
        n0 = len(first[candidate_id_col])
        dim = int(
            np.asarray(
                embed_fn(_pad_batch_rows(first, batch_size, n0))
            ).shape[1]
        )
    blocks = iter_embedded_blocks(
        candidate_id_col, embed_fn, batches, batch_size
    )
    ids_host, placed = place_catalog_rows(
        blocks,
        num_candidates,
        dim,
        mesh,
        quantize=quantize,
        keep_fp32=keep_fp32,
        stats=stats,
    )
    return ids_host, placed, num_candidates
