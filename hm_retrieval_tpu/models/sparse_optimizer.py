"""Sparse embedding-table training: update only the rows a batch touches.

Profiling the dense train step on TPU v5e showed ~7.5ms/step at B=512 —
dominated by the dense Adagrad update of the 1.37M x 128 customer table
(materialize dense grad + read/write table and accumulator ~= 2.8GB of HBM
traffic per step for <=512 touched rows). This module restructures the
step so embedding gradients stay in their natural sparse form:

    rows_f   = table_f[ids_f]                      # gather (B, E)
    loss     = f(dense_params, rows_*)             # towers recomputed
    g_rows   = dL/d rows_f                         # (B, E), no scatter
    uids, inv = unique(ids, size=B)                # static-shape unique
    g_sum    = segment_sum(g_rows, inv)            # exact dup handling
    acc[uids]   += g_sum^2                         # Adagrad, B rows only
    table[uids] -= lr * g_sum / sqrt(acc[uids] + eps)

Semantics are EXACTLY the dense Adagrad update (rows not in the batch get
zero grad => zero accumulator/param change; duplicate ids are summed
before squaring, as a dense scatter-add would); tests assert bitwise-level
parity with the dense step. Restricted to Adagrad — stateful-decay
optimizers (Adam) are NOT sparsity-invariant.

Dense (MLP) params keep their optax transform untouched.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from hm_retrieval_tpu.models.embedding import Params
from hm_retrieval_tpu.models.two_tower import TwoTowerModel
from hm_retrieval_tpu.schema.features import FeatureKind


class SparseAdagradState(NamedTuple):
    # {tower: {feature: (V, E) accumulator}}
    accumulators: Dict


class SparseTrainState(NamedTuple):
    params: Dict
    dense_opt_state: optax.OptState
    sparse_state: SparseAdagradState
    step: jax.Array


def split_dense_params(params: Dict) -> Dict:
    """The dense-updated subtree: everything except the embedding
    tables (the MLP "dense" stack plus any attention-pooling params —
    see models/tower.py's pytree layout). This is what the optax
    transform owns; tables get the sparse Adagrad update."""
    return {
        t: {k: v for k, v in params[t].items() if k != "embeddings"}
        for t in params
    }


def merge_dense_params(dense_params: Dict, params: Dict) -> Dict:
    """Rebuild the full tree from a dense subtree + the embedding
    tables of ``params`` (inverse of split_dense_params)."""
    return {
        t: {**dense_params[t], "embeddings": params[t]["embeddings"]}
        for t in dense_params
    }


def _table_features(model: TwoTowerModel):
    return {
        "query_tower": [
            f
            for f in model.query_features
            if f.kind in (FeatureKind.CATEGORICAL, FeatureKind.SEQUENCE)
        ],
        "candidate_tower": [
            f
            for f in model.candidate_features
            if f.kind in (FeatureKind.CATEGORICAL, FeatureKind.SEQUENCE)
        ],
    }


def _gather_rows(params, model, batch):
    """{tower: {feature: gathered rows}} — (B, E) or (B, L, E)."""
    out = {}
    for tower, feats in _table_features(model).items():
        out[tower] = {
            f.name: jnp.take(
                params[tower]["embeddings"][f.name],
                batch[f.name],
                axis=0,
            )
            for f in feats
        }
    return out


def _forward_from_rows(params, model, batch, rows):
    """Loss with table lookups replaced by the provided rows — shares the
    exact forward/loss code with the dense path via the ``rows``
    override, so the two training paths cannot drift apart."""
    return model.loss(
        params,
        batch,
        query_rows=rows["query_tower"],
        candidate_rows=rows["candidate_tower"],
    )


def _sparse_adagrad_update(
    table, acc, ids, g_rows, lr, eps
):
    """Exact dense-parity sparse Adagrad on the touched rows.

    ``ids``: (M,) int32 (flattened for sequences); ``g_rows``: (M, E).
    """
    M = ids.shape[0]
    uids, inv = jnp.unique(
        ids, size=M, fill_value=-1, return_inverse=True
    )
    g_sum = jax.ops.segment_sum(
        g_rows, inv.reshape(-1), num_segments=M
    )
    valid = uids >= 0
    safe_uids = jnp.where(valid, uids, 0)
    g_sum = jnp.where(valid[:, None], g_sum, 0.0)
    new_acc_rows = (
        jnp.take(acc, safe_uids, axis=0) + g_sum * g_sum
    )
    update = lr * g_sum * jax.lax.rsqrt(new_acc_rows + eps)
    # rows with valid=False collapse onto row 0 with zero update
    acc = acc.at[safe_uids].max(
        jnp.where(valid[:, None], new_acc_rows, -jnp.inf)
    )
    table = table.at[safe_uids].add(
        jnp.where(valid[:, None], -update, 0.0)
    )
    return table, acc


def create_sparse_train_state(
    model: TwoTowerModel,
    dense_optimizer,
    seed: int = 0,
) -> SparseTrainState:
    params = model.init_params(seed)
    tables = _table_features(model)
    accumulators = {
        tower: {
            f.name: jnp.full_like(
                params[tower]["embeddings"][f.name], 0.1
            )  # Keras legacy initial_accumulator_value
            for f in feats
        }
        for tower, feats in tables.items()
    }
    # dense transform sees everything but the embedding tables
    dense_params = split_dense_params(params)
    return SparseTrainState(
        params=params,
        dense_opt_state=dense_optimizer.init(dense_params),
        sparse_state=SparseAdagradState(accumulators),
        step=jnp.zeros((), jnp.int32),
    )


def make_sparse_train_step(
    model: TwoTowerModel,
    dense_optimizer,
    learning_rate: float,
    eps: float = 1e-7,
):
    """Jitted train step with sparse Adagrad for every embedding table
    and the given optax transform for the MLP params."""
    tables = _table_features(model)

    def step(state: SparseTrainState, batch):
        params = state.params
        rows = _gather_rows(params, model, batch)
        dense_params = split_dense_params(params)

        def loss_fn(dense_params, rows):
            full = merge_dense_params(dense_params, params)
            return _forward_from_rows(full, model, batch, rows)

        loss, (g_dense, g_rows) = jax.value_and_grad(
            loss_fn, argnums=(0, 1)
        )(dense_params, rows)

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
                g = g_rows[tower][f.name].reshape(
                    ids.shape[0], -1
                )
                table, acc = _sparse_adagrad_update(
                    params[tower]["embeddings"][f.name],
                    state.sparse_state.accumulators[tower][f.name],
                    ids,
                    g,
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

    return jax.jit(step, donate_argnums=0)
