"""Device mesh + sharding helpers.

The reference has no multi-device support at all (SURVEY §2.9); this module
is the foundation of the new distributed layer. Axes:

- ``"data"``: batch/data parallelism. Batches are sharded ``P("data")``;
  params replicated ``P()``; XLA/GSPMD inserts the gradient psum and the
  candidate all-gather for global-batch negatives over ICI.
- optional ``"model"``: row-sharding axis for large embedding tables
  (parallel/sharded_embedding.py).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans every host's devices (SURVEY §5.8).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host process group (SURVEY §5.8: the platform-native
    'NCCL init'). On TPU pods with default env configuration, call with no
    arguments; arguments are for manual/CPU bring-up.

    MUST run before any other JAX call — even ``jax.process_count()``
    initializes the XLA backend and would make ``distributed.initialize``
    fail. Failures from being already-initialized are tolerated; anything
    else propagates (silently proceeding as a 1-process group on a pod
    would corrupt training)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        msg = str(e).lower()
        if "already" in msg:
            logger.info("jax.distributed already initialized")
        elif "before" in msg and "jax" in msg:
            # Backend already touched by this process. On a real pod this
            # is a caller bug (init must be the first JAX call); warn
            # loudly instead of silently proceeding as 1 process.
            logger.warning(
                "initialize_multihost called after backend init — "
                "continuing single-process: %s", e
            )
        elif coordinator_address is None and num_processes is None:
            # No pod/cluster env detected: single-host dev path.
            logger.info(
                "single-host run (no cluster env): %s", e
            )
        else:
            raise
    logger.info(
        "process %d of %d",
        jax.process_index(),
        jax.process_count(),
    )


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh over the given (default: all) devices.

    ``data=None`` uses every device not claimed by ``model``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} != {n} available devices"
        )
    arr = np.asarray(devices).reshape(data, model)
    mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    logger.info(
        "Created mesh %s over %d device(s)", dict(mesh.shape), n
    )
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def data_axis_process_aligned(mesh: Mesh) -> bool:
    """True iff every data-axis chunk's devices belong to a single
    process. Multi-host runners feed each process a DISJOINT shard
    subset as its slice of the global batch; if a data chunk's model
    replicas span processes, two hosts would supply different rows for
    the same chunk and the computation silently diverges per rank —
    the runners refuse such meshes up front. (Meshes with data chunks
    deliberately replicated across processes are still usable via
    shard_batch directly when every member feeds identical rows.)"""
    arr = np.asarray(mesh.devices, dtype=object)
    d = mesh.axis_names.index(DATA_AXIS)
    rows = np.moveaxis(arr, d, 0).reshape(arr.shape[d], -1)
    return all(
        len({dev.process_index for dev in row}) == 1 for row in rows
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = MODEL_AXIS) -> NamedSharding:
    """Row-shard a (V, E) table over the given axis."""
    return NamedSharding(mesh, P(axis, None))


def place_global(x, sharding: NamedSharding):
    """Place a host-local array under ``sharding``. Multi-host safe:
    with multiple processes each host must hold the FULL value, and the
    global array is assembled from each host's local slice
    (``make_array_from_callback``) — plain device_put to shardings that
    span non-addressable devices is unsupported on some backends."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(
        x.shape, sharding, lambda idx: x[idx]
    )


def replicate_pytree(tree, mesh: Mesh):
    """Place every leaf fully replicated over the mesh.

    Multi-host safe: with multiple processes the global array is built
    from each host's LOCAL copy (``make_array_from_callback``), so no
    cross-host device transfer is attempted — every process must hold
    identical values (true for checkpoint restores and seeded inits,
    the two callers). Single-process falls through to device_put."""
    sharding = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def place(x):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return jax.tree.map(place, tree)


def shard_batch(batch, mesh: Mesh):
    """Host numpy batch dict -> device arrays sharded over the data axis.

    Single-process path uses device_put; multi-host feeding goes through
    jax.make_array_from_process_local_data with per-host shards.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return {
            k: jax.device_put(v, sharding) for k, v in batch.items()
        }
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }
