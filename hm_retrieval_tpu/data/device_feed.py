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

    if prefetch <= 0:
        for b in batches:
            yield put(b)
        return

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _END = object()
    err: list = []

    def worker():
        try:
            for b in batches:
                q.put({k: np.asarray(v) for k, v in b.items()})
        except Exception as e:  # surface in consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield put(item)
    if err:
        raise err[0]
