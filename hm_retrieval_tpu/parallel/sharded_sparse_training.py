"""Sparse Adagrad training over ROW-SHARDED embedding tables.

No reference analog (the reference is single-device, SURVEY §2.9). This
closes the last composition gap in the training matrix: the two fastest
layouts in the framework could previously not be combined —

- ``parallel/sharded_training.py``: big tables row-sharded
  ``P("model", None)`` so table + Adagrad accumulator exceed one chip's
  HBM — but a DENSE update (full-table read/write every step).
- ``models/sparse_optimizer.py`` / ``parallel/sparse_data_parallel.py``:
  update only the rows a batch touches (7x measured) — but with
  replicated tables only.

Mesh is 2-D ``(data=D, model=S)``. Per device ``(d, s)`` with local batch
``b = B/D`` and table shard ``(R, E)`` where ``R = V_padded/S``:

    forward   rows_partial = table_s[ids_d - s*R]  masked to owned rows
              rows_d = psum(rows_partial, "model")       # (b, E) ICI
              ... towers / global-negative loss exactly as
              parallel/sparse_data_parallel.py (all_gather over "data")
    backward  g_rows_d = dL/d rows_d   # rows are an explicit grad leaf,
                                       # so no AD through the model-axis
                                       # psum; identical on every s
    update    G, I = all_gather(g_rows_d, ids_d, "data") # global (B, E)
              owned = (I - s*R) in [0, R)  -> local ids, else -1
              sparse Adagrad on shard rows only (masked ids drop out of
              the unique/segment-sum exactly like padding does)

Every ``(d, s)`` device sees the same global (G, I), so shard ``s``'s
update is identical across the data axis and the ``P("model", None)``
layout is preserved without any extra collective. Communication per step:
one (b, E) psum over "model" + the same (B, E) all_gather over "data" the
DP sparse path already pays. Duplicate ids across shards stay exact: the
unique/segment-sum runs over the gathered GLOBAL id vector.

Small tables (and the MLP) stay replicated and take the same update as
``sparse_data_parallel`` (sparse Adagrad on global ids / psum'd dense
grads), so semantics equal the single-device sparse step on the global
batch — asserted to bitwise-level tolerance in
tests/test_sharded_sparse.py on the fake 8-device mesh.
"""

from __future__ import annotations

from typing import Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from hm_retrieval_tpu.models.sparse_optimizer import (
    SparseAdagradState,
    SparseTrainState,
    _sparse_adagrad_update,
    _table_features,
    create_sparse_train_state,
    merge_dense_params,
    split_dense_params,
)
from hm_retrieval_tpu.models.two_tower import TwoTowerModel
from hm_retrieval_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _path_keys(path):
    return tuple(
        getattr(p, "key", getattr(p, "name", getattr(p, "idx", None)))
        for p in path
    )


def sharded_sparse_specs(
    state: SparseTrainState, sharded_features: Iterable[str]
):
    """PartitionSpec pytree for a SparseTrainState: listed feature tables
    (params AND Adagrad accumulators) row-sharded over the model axis,
    everything else replicated."""
    sharded = set(sharded_features)

    def spec_of(path, leaf):
        keys = _path_keys(path)
        if keys and keys[-1] in sharded and getattr(
            leaf, "ndim", 0
        ) == 2:
            return P(MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_of, state)


def create_sharded_sparse_state(
    model: TwoTowerModel,
    dense_optimizer,
    mesh,
    sharded_features: Iterable[str],
    seed: int = 0,
) -> SparseTrainState:
    """Init the sparse train state and place it on the mesh with the
    listed feature tables row-sharded. Sharded tables (and their
    accumulators) are row-padded to a multiple of the model-axis size;
    pad rows are unreachable by any id and never updated."""
    sharded = set(sharded_features)
    state = create_sparse_train_state(model, dense_optimizer, seed)
    specs = sharded_sparse_specs(state, sharded)
    S = mesh.shape[MODEL_AXIS]

    def place(x, spec):
        if spec == P(MODEL_AXIS, None) and x.shape[0] % S != 0:
            pad = S - (x.shape[0] % S)
            x = jnp.concatenate(
                [x, jnp.zeros((pad, x.shape[1]), x.dtype)]
            )
        # place_global: multi-host safe (every process holds the full
        # seeded init; device_put to shardings spanning non-addressable
        # devices is unsupported)
        from hm_retrieval_tpu.parallel.mesh import place_global

        return place_global(
            np.asarray(x), NamedSharding(mesh, spec)
        )

    # Pad rows (tables and accumulators alike) are zero-filled dead rows:
    # no id can reach them, so their contents never matter.
    return jax.tree.map(place, state, specs)


def unpad_params(params: Dict, model: TwoTowerModel) -> Dict:
    """Slice row-padded embedding tables back to their true vocab row
    counts (for export/serving parity with the unsharded layout)."""
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    for tower, feats in _table_features(model).items():
        for f in feats:
            rows = f.num_embeddings
            t = out[tower]["embeddings"][f.name]
            if t.shape[0] != rows:
                out[tower]["embeddings"][f.name] = t[:rows]
    return out


def make_sharded_sparse_train_step(
    model: TwoTowerModel,
    dense_optimizer,
    learning_rate: float,
    mesh,
    sharded_features: Iterable[str],
    eps: float = 1e-7,
):
    """Jitted SPMD train step: sparse Adagrad everywhere, listed tables
    row-sharded ``P("model", None)``, batch sharded ``P("data")``,
    global-batch in-batch negatives. State must be placed by
    ``create_sharded_sparse_state``."""
    sharded = set(sharded_features)
    tables = _table_features(model)
    all_table_feats = {
        f.name for feats in tables.values() for f in feats
    }
    unknown = sharded - all_table_feats
    if unknown:
        raise ValueError(
            f"sharded_features {sorted(unknown)} are not embedding-table "
            f"features of this model (have {sorted(all_table_feats)})"
        )

    def seq(token, x):
        """Sequencing primitive: the returned copy of ``x`` cannot be
        computed before ``token`` is. XLA:CPU's thunk executor starts
        mutually independent collectives in whatever order each
        device's thread pool picks, and two devices blocking in
        different collectives over intersecting device groups deadlock
        the in-process rendezvous — so every hand-written collective in
        this step is chained into one total order (observed: data-axis
        all_gather racing the model-axis psum on the fake 8-device
        mesh). On real TPUs the barrier costs nothing measurable: these
        collectives move KBs."""
        return jax.lax.optimization_barrier((token, x))[1]

    def gather_rows_local(params, batch, token):
        """{tower: {feature: (b, E) or (b, L, E)}} — cross-shard psum
        gather for sharded tables, plain local take otherwise.
        Returns (rows, token) with the psums sequenced on ``token``."""
        out = {}
        for tower, feats in tables.items():
            out[tower] = {}
            for f in feats:
                ids = batch[f.name]
                tbl = params[tower]["embeddings"][f.name]
                if f.name in sharded:
                    flat = ids.reshape(-1)
                    R = tbl.shape[0]  # local shard rows
                    base = jax.lax.axis_index(MODEL_AXIS) * R
                    local = flat - base
                    mine = (local >= 0) & (local < R)
                    rows = jnp.take(
                        tbl, jnp.where(mine, local, 0), axis=0
                    )
                    rows = jnp.where(mine[:, None], rows, 0.0)
                    rows = jax.lax.psum(
                        seq(token, rows), MODEL_AXIS
                    )
                    token = rows[0, 0]
                    out[tower][f.name] = rows.reshape(
                        ids.shape + (tbl.shape[1],)
                    )
                else:
                    out[tower][f.name] = jnp.take(tbl, ids, axis=0)
        return out, token

    def local_step(state: SparseTrainState, batch):
        params = state.params
        token0 = jnp.zeros((), jnp.float32)
        rows, token = gather_rows_local(params, batch, token0)
        token = jax.lax.stop_gradient(token)
        dense_params = split_dense_params(params)
        ids_local = batch[model.candidate_id_col]
        b = ids_local.shape[0]

        def loss_fn(dense_params, rows):
            full = merge_dense_params(dense_params, params)
            q = model.query_forward(
                full, batch, rows=rows["query_tower"]
            )
            c = model.candidate_forward(
                full, batch, rows=rows["candidate_tower"]
            )
            all_c = jax.lax.all_gather(
                seq(token, c), DATA_AXIS, axis=0, tiled=True
            )
            all_ids = jax.lax.all_gather(
                seq(all_c[0, 0], ids_local),
                DATA_AXIS,
                axis=0,
                tiled=True,
            )
            logits = jnp.dot(
                q, all_c.T, preferred_element_type=jnp.float32
            )
            if model.logq is not None:
                logits = logits - jnp.take(
                    model.logq, all_ids, axis=0
                )[None, :]
            d = jax.lax.axis_index(DATA_AXIS)
            diag_cols = d * b + jnp.arange(b)
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            picked = jnp.take_along_axis(
                log_probs, diag_cols[:, None], axis=1
            )[:, 0]
            # Local sum: grads w.r.t. local rows still carry every data
            # shard's contribution via the all_gather transpose.
            return -jnp.sum(picked)

        loss_local, (g_dense, g_rows) = jax.value_and_grad(
            loss_fn, argnums=(0, 1)
        )(dense_params, rows)
        # loss_local is ready before the backward pass, so its psum
        # must be explicitly sequenced after the backward's
        # reduce-scatter (the all_gather transpose) completes
        grads_done = jax.tree.leaves(g_rows)[0].ravel()[0]
        loss = jax.lax.psum(
            seq(grads_done, loss_local), DATA_AXIS
        )
        g_dense = jax.lax.psum(seq(loss, g_dense), DATA_AXIS)
        token = jax.tree.leaves(g_dense)[0].ravel()[0]

        updates, dense_opt_state = dense_optimizer.update(
            g_dense, state.dense_opt_state, dense_params
        )
        new_dense = optax.apply_updates(dense_params, updates)

        new_params = {}
        new_accs = {}
        for tower, feats in tables.items():
            new_params[tower] = {
                **new_dense[tower],
                "embeddings": dict(params[tower]["embeddings"]),
            }
            new_accs[tower] = {}
            for f in feats:
                ids = batch[f.name].reshape(-1)
                g = g_rows[tower][f.name].reshape(ids.shape[0], -1)
                all_ids = jax.lax.all_gather(
                    seq(token, ids), DATA_AXIS, axis=0, tiled=True
                )
                all_g = jax.lax.all_gather(
                    seq(all_ids[0], g),
                    DATA_AXIS,
                    axis=0,
                    tiled=True,
                )
                token = all_g[0, 0]
                tbl = params[tower]["embeddings"][f.name]
                acc = state.sparse_state.accumulators[tower][f.name]
                if f.name in sharded:
                    # Keep only the rows this model shard owns; foreign
                    # ids become -1 and drop out inside the update
                    # (same masking path as the static-size padding).
                    R = tbl.shape[0]
                    base = jax.lax.axis_index(MODEL_AXIS) * R
                    local = all_ids - base
                    owned = (local >= 0) & (local < R)
                    upd_ids = jnp.where(owned, local, -1)
                else:
                    upd_ids = all_ids
                table, acc = _sparse_adagrad_update(
                    tbl, acc, upd_ids, all_g, learning_rate, eps
                )
                new_params[tower]["embeddings"][f.name] = table
                new_accs[tower][f.name] = acc

        return (
            SparseTrainState(
                params=new_params,
                dense_opt_state=dense_opt_state,
                sparse_state=SparseAdagradState(new_accs),
                step=state.step + 1,
            ),
            {"loss": loss},
        )

    batch_specs = {
        f.name: P(DATA_AXIS)
        for f in model.query_features + model.candidate_features
    }
    jitted = None

    def stepper(state, batch):
        # The state's spec tree depends on the optax transform's state
        # structure, so it is derived from the first state seen; the
        # jitted function is built once and cached.
        nonlocal jitted
        if jitted is None:
            state_specs = sharded_sparse_specs(state, sharded)
            smapped = shard_map(
                local_step,
                mesh=mesh,
                in_specs=(state_specs, batch_specs),
                out_specs=(state_specs, P()),
                check_vma=False,
            )
            jitted = jax.jit(smapped, donate_argnums=0)
        return jitted(state, batch)

    return stepper
