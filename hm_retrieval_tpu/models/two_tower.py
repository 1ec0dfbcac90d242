"""Two-tower retrieval model: pure-function core + jitted train step.

Re-design of ref: pkg/modelling/models/two_tower_model.py. The reference is
a Keras model with a custom ``train_step`` doing in-batch negative sampling
(ref: two_tower_model.py:94-124); here the model is a pytree of params plus
pure functions, and the train step is one jitted, donated function:

    logits = Q @ C^T                      (ref: two_tower_model.py:65-92)
    logits -= logQ[candidate_ids]         (ref: layers/logq_correction.py)
    labels = eye(B)                       (ref: two_tower_model.py:119-121)
    loss   = sum_i CE(labels_i, logits_i) (SUM reduction,
                                           ref: pkg/modelling/runner.py:79-82)

Distribution model (new; the reference is single-device): the train step is
written over GLOBAL shapes and jitted once. Under a ``Mesh`` with the batch
sharded ``P("data")`` and params replicated, GSPMD computes each device's
``(B/d, B)`` logits block by all-gathering candidate embeddings over ICI —
which IS the "global in-batch negatives via all-gather" design of
BASELINE.json's north star; identity labels need no shard offset because
XLA keeps global index semantics. See parallel/ for the explicit shard_map
equivalents and sharded-table variants.
"""

from __future__ import annotations

import logging
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hm_retrieval_tpu.models.logq_correction import apply_logq_correction
from hm_retrieval_tpu.models.tower import init_tower_params, tower_forward
from hm_retrieval_tpu.schema.features import Feature
from hm_retrieval_tpu.schema.schema import Schema

logger = logging.getLogger(__name__)

Batch = Dict[str, jax.Array]


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jax.Array  # scalar int32


class TwoTowerModel:
    """Static architecture config + pure functions over a params pytree
    (ref class: two_tower_model.py:12-57)."""

    def __init__(
        self,
        query_features: List[Feature],
        candidate_features: List[Feature],
        candidate_id_col: str,
        joint_embedding_size: int,
        query_tower_units: Optional[List[int]] = None,
        candidate_tower_units: Optional[List[int]] = None,
        logq: Optional[np.ndarray] = None,
    ):
        if candidate_id_col not in [f.name for f in candidate_features]:
            raise ValueError(
                f"candidate_id_col {candidate_id_col!r} not a candidate "
                "feature (ref: two_tower_model.py:47-50)"
            )
        self.query_features = query_features
        self.candidate_features = candidate_features
        self.candidate_id_col = candidate_id_col
        self.joint_embedding_size = joint_embedding_size
        self.query_tower_units = query_tower_units
        self.candidate_tower_units = candidate_tower_units
        # Dense logQ table or None (ref: optional candidate_prob_lookup).
        self.logq = (
            jnp.asarray(logq, jnp.float32) if logq is not None else None
        )

    @classmethod
    def create_from_schema(cls, schema: Schema) -> "TwoTowerModel":
        """(ref: two_tower_model.py:132-158)"""
        return cls(
            query_features=schema.query_features,
            candidate_features=schema.candidate_features,
            candidate_id_col=schema.candidate_id_col,
            joint_embedding_size=schema.model_config.joint_embedding_size,
            query_tower_units=schema.model_config.query_tower_units,
            candidate_tower_units=schema.model_config.candidate_tower_units,
            logq=(
                schema.logq
                if schema.training_config.use_logq_correction
                else None
            ),
        )

    # ------------------------------------------------------------------
    # Params
    # ------------------------------------------------------------------
    def init_params(self, seed: int = 0) -> Dict:
        q_rng, c_rng = jax.random.split(jax.random.PRNGKey(seed))
        return {
            "query_tower": init_tower_params(
                q_rng,
                self.query_features,
                self.joint_embedding_size,
                self.query_tower_units,
            ),
            "candidate_tower": init_tower_params(
                c_rng,
                self.candidate_features,
                self.joint_embedding_size,
                self.candidate_tower_units,
            ),
        }

    # ------------------------------------------------------------------
    # Forward
    # ------------------------------------------------------------------
    def query_forward(
        self, params: Dict, batch: Batch, rows=None
    ) -> jax.Array:
        return tower_forward(
            params["query_tower"],
            self.query_features,
            batch,
            rows=rows,
        )

    def candidate_forward(
        self, params: Dict, batch: Batch, rows=None
    ) -> jax.Array:
        return tower_forward(
            params["candidate_tower"],
            self.candidate_features,
            batch,
            rows=rows,
        )

    def scores(
        self,
        params: Dict,
        batch: Batch,
        query_rows=None,
        candidate_rows=None,
    ) -> jax.Array:
        """(B, B) dot-product score matrix
        (ref: two_tower_model.py:65-92)."""
        q = self.query_forward(params, batch, rows=query_rows)
        c = self.candidate_forward(
            params, batch, rows=candidate_rows
        )
        return jnp.dot(q, c.T, preferred_element_type=jnp.float32)

    # ------------------------------------------------------------------
    # Loss
    # ------------------------------------------------------------------
    def loss(
        self,
        params: Dict,
        batch: Batch,
        query_rows=None,
        candidate_rows=None,
    ) -> jax.Array:
        """In-batch sampled-softmax CE, SUM-reduced over the batch
        (ref: two_tower_model.py:94-124 + runner.py:79-82). With identity
        labels this reduces to sum_i (logsumexp(row_i) - logits[i, i]).
        ``*_rows`` optionally replace table gathers (sparse path)."""
        logits = self.scores(
            params,
            batch,
            query_rows=query_rows,
            candidate_rows=candidate_rows,
        )
        if self.logq is not None:
            logits = apply_logq_correction(
                logits, batch[self.candidate_id_col], self.logq
            )
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.sum(jnp.diagonal(log_probs))


def make_train_step(
    model: TwoTowerModel,
    optimizer,
    catalog=None,
    num_uniform_negatives: int = 0,
    base_seed: int = 0,
):
    """One jitted, state-donating train step (replaces Keras
    optimizer.minimize + GradientTape, ref: two_tower_model.py:110-124).

    With ``catalog`` + ``num_uniform_negatives > 0`` the loss mixes
    uniformly sampled negatives into the in-batch softmax (BASELINE
    config[4], models/mixed_negatives.py); the sampling key derives from
    the step counter, so resume-from-checkpoint replays the same stream.
    """
    if num_uniform_negatives > 0 and catalog is None:
        raise ValueError(
            "uniform negatives require a CandidateCatalog"
        )

    if num_uniform_negatives > 0:
        from hm_retrieval_tpu.models.mixed_negatives import (
            mixed_negatives_loss,
        )

        base_key = jax.random.PRNGKey(base_seed)

        def loss_fn(params, batch, step):
            key = jax.random.fold_in(base_key, step)
            return mixed_negatives_loss(
                model,
                params,
                batch,
                catalog,
                key,
                num_uniform_negatives,
            )

    else:

        def loss_fn(params, batch, step):
            return model.loss(params, batch)

    def step(state: TrainState, batch: Batch):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch, state.step
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss},
        )

    return jax.jit(step, donate_argnums=0)


def create_train_state(
    model: TwoTowerModel, optimizer, seed: int = 0
) -> TrainState:
    params = model.init_params(seed)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )
