"""Data-parallel sparse-embedding training (shard_map formulation).

No reference analog (the reference is single-device, SURVEY §2.9). This
combines the two fastest paths in the framework, which previously could
not be used together:

- ``parallel/data_parallel.py``: batch sharded ``P("data")``, params
  replicated, global in-batch negatives — but a DENSE Adagrad update,
  which at H&M scale is HBM-bound on the 1.37M-row customer table
  (~2.8GB of optimizer traffic per step for <=512 touched rows).
- ``models/sparse_optimizer.py``: updates only the rows a batch touches
  (7x step speedup measured) — but single-replica.

Per device d (data axis, size D; local batch b = B/D):

    rows_d   = tables[batch_d]                        # local gather
    q_d, c_d = towers(rows_d)                         # (b, E) each
    C, ids   = all_gather(c_d), all_gather(ids_d)     # (B, E) ICI
    logits_d = q_d @ C^T - logQ[ids]                  # (b, B)
    loss_d   = sum-CE, positives at column d*b + i
    g_rows_d = dL/d rows_d          # all_gather transposes to
                                    # reduce-scatter: g_rows_d already
                                    # sums every shard's contribution
    g_dense  = psum(dL/d dense_d)   # MLP grads replicated
    G, I     = all_gather(g_rows_d), all_gather(row ids)   # (B, E) ICI
    sparse Adagrad(tables, G, I)    # identical on every shard ->
                                    # tables stay replicated

Gathering the (B, E) row-gradients costs ~2MB over ICI at B=4096/E=128 —
noise next to the dense update's HBM traffic. Duplicate ids ACROSS shards
are handled exactly: the unique/segment-sum runs over the gathered global
id vector, so semantics equal the single-device sparse step on the global
batch (tests/test_sparse_dp.py asserts parity), which itself has exact
dense-Adagrad parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from hm_retrieval_tpu.models.sparse_optimizer import (
    SparseAdagradState,
    SparseTrainState,
    _gather_rows,
    _sparse_adagrad_update,
    _table_features,
    merge_dense_params,
    split_dense_params,
)
from hm_retrieval_tpu.models.two_tower import TwoTowerModel
from hm_retrieval_tpu.parallel.mesh import DATA_AXIS, replicated


def make_dp_sparse_train_step(
    model: TwoTowerModel,
    dense_optimizer,
    learning_rate: float,
    mesh,
    eps: float = 1e-7,
):
    """Jitted SPMD train step: sparse Adagrad for every embedding table,
    the given optax transform for the MLP params, global-batch in-batch
    negatives. ``batch`` must be sharded ``P("data")`` on the leading
    axis; state replicated (see ``replicate_sparse_state``)."""
    tables = _table_features(model)

    def local_step(state: SparseTrainState, batch):
        params = state.params
        rows = _gather_rows(params, model, batch)
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
                c, DATA_AXIS, axis=0, tiled=True
            )
            all_ids = jax.lax.all_gather(
                ids_local, DATA_AXIS, axis=0, tiled=True
            )
            logits = jnp.dot(
                q, all_c.T, preferred_element_type=jnp.float32
            )
            if model.logq is not None:
                logits = logits - jnp.take(
                    model.logq, all_ids, axis=0
                )[None, :]
            shard = jax.lax.axis_index(DATA_AXIS)
            diag_cols = shard * b + jnp.arange(b)
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            picked = jnp.take_along_axis(
                log_probs, diag_cols[:, None], axis=1
            )[:, 0]
            # Local (un-psummed) sum: grads w.r.t. local rows still
            # carry every shard's contribution via the all_gather
            # transpose (reduce-scatter).
            return -jnp.sum(picked)

        loss_local, (g_dense, g_rows) = jax.value_and_grad(
            loss_fn, argnums=(0, 1)
        )(dense_params, rows)
        loss = jax.lax.psum(loss_local, DATA_AXIS)
        g_dense = jax.lax.psum(g_dense, DATA_AXIS)

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
                    ids, DATA_AXIS, axis=0, tiled=True
                )
                all_g = jax.lax.all_gather(
                    g, DATA_AXIS, axis=0, tiled=True
                )
                table, acc = _sparse_adagrad_update(
                    params[tower]["embeddings"][f.name],
                    state.sparse_state.accumulators[tower][f.name],
                    all_ids,
                    all_g,
                    learning_rate,
                    eps,
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
    smapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=0)


def replicate_sparse_state(
    state: SparseTrainState, mesh
) -> SparseTrainState:
    from hm_retrieval_tpu.parallel.mesh import replicate_pytree

    return replicate_pytree(state, mesh)
