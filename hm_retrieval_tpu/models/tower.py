"""Tower MLP: embedding front-end -> hidden Dense+ReLU stack -> joint layer.

Re-design of ref: pkg/modelling/models/tower.py:36-75 as pure functions over
a params pytree. Matches the reference architecture exactly:

- optional hidden ``Dense(units, relu)`` layers
- final ``Dense(joint_embedding_size)`` **with ReLU and no L2 norm** — scores
  are raw dot products, not cosine (SURVEY C13 note, ref: tower.py:44-49)
- Dense init = Keras defaults (glorot_uniform W, zero bias)

Training caveat (applies to the reference architecture too): numeric
features pass through unscaled (ref: input_layer.py:61-69), so a
large-magnitude numeric input (e.g. raw age 18..70) dominates the glorot-
scaled pre-activations, and with the all-ReLU stack the towers can die into
all-zero outputs (uniform logits, loss pinned at B*ln(B)). Standardize
numeric features in ETL before training.

Params pytree:
    {"embeddings": {feature: (V+1, E)},
     "dense": [{"w": (in, out), "b": (out,)}, ...],
     "attention": {feature: (E,)}}   # only when a sequence feature
                                     # uses pooling="attention"

Everything outside "embeddings" (the MLP stack and the attention pooling
queries) is dense-updated by the optax transform; the sparse optimizers
split on that key (models/sparse_optimizer.py::split_dense_params).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from hm_retrieval_tpu.models.embedding import (
    apply_embeddings,
    embedding_output_dim,
    init_embedding_params,
)
from hm_retrieval_tpu.schema.features import Feature, FeatureKind

TowerParams = Dict


def init_tower_params(
    rng: jax.Array,
    features: List[Feature],
    joint_embedding_size: int,
    hidden_units: Optional[List[int]] = None,
    dtype=jnp.float32,
) -> TowerParams:
    emb_rng, dense_rng = jax.random.split(rng)
    params: TowerParams = {
        "embeddings": init_embedding_params(emb_rng, features, dtype),
        "dense": [],
    }
    dims = (
        [embedding_output_dim(features)]
        + list(hidden_units or [])
        + [joint_embedding_size]
    )
    keys = jax.random.split(dense_rng, len(dims) - 1)
    for key, d_in, d_out in zip(keys, dims[:-1], dims[1:]):
        limit = (6.0 / (d_in + d_out)) ** 0.5  # glorot_uniform
        params["dense"].append(
            {
                "w": jax.random.uniform(
                    key, (d_in, d_out), minval=-limit, maxval=limit,
                    dtype=dtype,
                ),
                "b": jnp.zeros((d_out,), dtype),
            }
        )
    attn_feats = [
        f
        for f in features
        if f.kind == FeatureKind.SEQUENCE and f.pooling == "attention"
    ]
    if attn_feats:
        # zero-init: attention starts exactly at the masked-mean
        # solution (see embedding.pool_sequence)
        params["attention"] = {
            f.name: jnp.zeros((f.embedding_size,), dtype)
            for f in attn_feats
        }
    return params


def tower_forward(
    params: TowerParams,
    features: List[Feature],
    batch: Dict[str, jax.Array],
    rows: Dict[str, jax.Array] = None,
) -> jax.Array:
    """(B,) feature dict -> (B, joint_embedding_size). Every layer,
    including the last, uses ReLU (ref: tower.py:36-49). ``rows``
    optionally overrides table gathers (see apply_embeddings)."""
    x = apply_embeddings(
        params["embeddings"],
        features,
        batch,
        rows=rows,
        attention=params.get("attention"),
    )
    for layer in params["dense"]:
        x = jax.nn.relu(
            jnp.dot(x, layer["w"], preferred_element_type=jnp.float32)
            + layer["b"]
        )
    return x
