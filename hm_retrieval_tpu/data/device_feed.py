"""Host -> device feeding with background prefetch.

The part the single-device reference never needed (SURVEY §7 hard part #6:
input-pipeline throughput so host work doesn't starve the chips): a
bounded-queue background thread encodes/shards the next batches while the
device runs the current step, overlapping host ETL with device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from hm_retrieval_tpu.parallel.mesh import shard_batch

Batch = Dict[str, np.ndarray]


def device_feed(
    batches: Iterator[Batch],
    mesh=None,
    prefetch: int = 2,
) -> Iterator[Dict[str, jax.Array]]:
    """Wrap a host batch iterator into sharded device arrays with
    ``prefetch`` batches of HOST work in flight.

    The background thread runs only the host side (shard reading,
    shuffling, numpy batch assembly); every device interaction
    (device_put / shard_batch) happens on the consumer's thread.
    Issuing transfers from a second thread while the main thread runs a
    collective program deadlocks XLA:CPU's in-process rendezvous (two
    programs racing over overlapping device sets) — and buys nothing
    anyway, since device_put is async: the consumer thread dispatches
    the transfer and returns immediately, so transfer/compute overlap
    is preserved without cross-thread device access."""

    def put(b: Batch):
        if mesh is None:
            return {k: jax.device_put(np.asarray(v)) for k, v in b.items()}
        return shard_batch(
            {k: np.asarray(v) for k, v in b.items()}, mesh
        )

    for b in _prefetch_host(batches, prefetch):
        yield put(b)


def chunk_batches(
    batches: Iterator[Batch], k: int
) -> Iterator[Batch]:
    """Stack ``k`` consecutive host batches into one
    ``{feature: (k, B, ...)}`` super-batch. A RAGGED TAIL (fewer than
    ``k`` trailing batches) IS DROPPED, like ``drop_remainder`` one
    level up — a warning is logged so short epochs (< k batches, which
    would otherwise train zero steps) are never silent. Feeds
    ``make_chunked_train_step``: one host->device transfer and ONE
    dispatch run ``k`` train steps, amortizing the dispatch path when
    it is slow relative to the step (measured 10x on the relay-proxied
    chip, BASELINE.md pipeline-fed section)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    stack = []
    for b in batches:
        stack.append(b)
        if len(stack) == k:
            yield {
                key: np.stack([s[key] for s in stack])
                for key in stack[0]
            }
            stack = []
    if stack:
        import logging

        logging.getLogger(__name__).warning(
            "chunk_batches dropped a ragged tail of %d batch(es) "
            "(< steps_per_dispatch=%d); lower steps_per_dispatch or "
            "provide a step count divisible by it to train on every "
            "batch",
            len(stack),
            k,
        )


def chunk_sharding(mesh):
    """Sharding for stacked ``(k, B, ...)`` super-batches: rows split
    over the data axis (axis 1 — axis 0 is the scan/step axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hm_retrieval_tpu.parallel.mesh import DATA_AXIS

    return NamedSharding(mesh, P(None, DATA_AXIS))


def device_feed_chunked(
    batches: Iterator[Batch],
    k: int,
    mesh=None,
    prefetch: int = 2,
) -> Iterator[Dict[str, jax.Array]]:
    """``device_feed`` over ``chunk_batches``: yields device-resident
    ``(k, B, ...)`` super-batches (sharded P(None, "data") on a mesh).
    Multi-host: each process supplies its local (k, B/P) rows, assembled
    per step-slice like ``shard_batch``."""
    chunks = chunk_batches(batches, k)
    if mesh is None:
        for c in device_feed(chunks, mesh=None, prefetch=prefetch):
            yield c
        return
    sharding = chunk_sharding(mesh)

    def put(b):
        if jax.process_count() == 1:
            return {
                key: jax.device_put(np.asarray(v), sharding)
                for key, v in b.items()
            }
        return {
            key: jax.make_array_from_process_local_data(
                sharding, np.asarray(v)
            )
            for key, v in b.items()
        }

    # host-side chunk assembly runs in the prefetch thread; placement
    # (device_put) stays on the consumer thread (see device_feed's
    # threading note)
    for c in _prefetch_host(chunks, prefetch):
        yield put(c)


def _prefetch_host(
    batches: Iterator[Batch], prefetch: int
) -> Iterator[Batch]:
    """Background-thread host prefetch (the device_feed worker without
    the placement step)."""
    if prefetch <= 0:
        yield from batches
        return
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _END = object()
    err: list = []

    def worker():
        try:
            for b in batches:
                q.put(b)
        except Exception as e:
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
    if err:
        raise err[0]


def make_chunked_train_step(step_fn):
    """Wrap a ``(state, batch) -> (state, {"loss": ...})`` train step
    into ``(state, stacked) -> (state, metrics)`` running
    ``stacked.shape[0]`` steps in ONE dispatch via ``lax.scan``.
    Numerics are identical to calling ``step_fn`` per batch in order
    (the scan body inlines the step); metrics carry the per-step loss
    trace plus its mean."""
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chunk_step(state, stacked):
        def body(st, batch):
            st, m = step_fn(st, batch)
            return st, m["loss"]

        state, losses = lax.scan(body, state, stacked)
        return state, {
            "loss": losses[-1],
            "loss_mean": jnp.mean(losses),
            "losses": losses,
        }

    return chunk_step
