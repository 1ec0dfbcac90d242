"""Per-feature embedding front-end (the reference InputLayer analog).

Re-design of ref: pkg/modelling/layers/input_layer.py:24-69 for TPU:

- No on-device string lookup: batches arrive as int32 ids (0 = OOV) from the
  data pipeline, so the front-end is a pure table gather per categorical
  feature, concatenated with float32 numeric passthrough columns into one
  ``(B, sum(E) + n_numeric)`` activation — same output contract as the
  reference's concat (ref: input_layer.py:61-69).
- Tables are plain pytree leaves: ``{feature_name: (V+1, E) float32}``.
  Row 0 is the OOV row, mirroring ``Embedding(len(vocab)+1, emb)``
  (ref: input_layer.py:37-41).
- Init matches Keras Embedding's default ``uniform(-0.05, 0.05)``.

Under GSPMD these tables can be row-sharded over the mesh; see
parallel/sharded_embedding.py for the explicit all-to-all path.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from hm_retrieval_tpu.schema.features import Feature, FeatureKind

Params = Dict[str, jax.Array]


def init_embedding_params(
    rng: jax.Array, features: List[Feature], dtype=jnp.float32
) -> Params:
    params: Params = {}
    tabled = [
        f
        for f in features
        if f.kind
        in (FeatureKind.CATEGORICAL, FeatureKind.SEQUENCE)
    ]
    keys = jax.random.split(rng, max(1, len(tabled)))
    for key, f in zip(keys, tabled):
        params[f.name] = jax.random.uniform(
            key,
            (f.num_embeddings, f.embedding_size),
            minval=-0.05,
            maxval=0.05,
            dtype=dtype,
        )
    return params


def embedding_output_dim(features: List[Feature]) -> int:
    dim = 0
    for f in features:
        if f.kind == FeatureKind.NUMERIC:
            dim += 1
        else:  # categorical or sequence
            dim += f.embedding_size
    return dim


def pool_sequence(
    f: Feature,
    ids: jax.Array,
    emb: jax.Array,
    attention: Dict[str, jax.Array] = None,
) -> jax.Array:
    """(B, L, E) token embeddings -> (B, E), masking pad id 0.

    ``f.pooling == "mean"``: masked mean (all-pad rows pool to zeros).
    ``f.pooling == "attention"``: learned-query dot-product attention —
    softmax over valid positions of ``emb @ w`` with ``w`` the (E,)
    vector in ``attention[f.name]``. ``w`` is zero-initialized
    (models/tower.py), so at init the weights are uniform over valid
    positions and the pooled output equals the masked mean; training
    then learns which history positions matter. All-pad rows pool to
    zeros, matching the mean path."""
    mask = (ids != 0).astype(emb.dtype)  # (B, L)
    if f.pooling == "attention":
        w = attention[f.name]  # (E,)
        scores = jnp.einsum("ble,e->bl", emb, w)
        scores = jnp.where(ids != 0, scores, -jnp.inf)
        # exp(score - max); all-pad rows have max=-inf -> force exp=0
        # everywhere instead of nan, so they pool to zeros like "mean"
        z = jnp.exp(
            scores
            - jnp.maximum(
                scores.max(axis=1, keepdims=True), -1e30
            )
        )
        z = z * mask
        denom = jnp.maximum(z.sum(axis=1, keepdims=True), 1e-30)
        return jnp.einsum("bl,ble->be", z / denom, emb)
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    return (emb * mask[:, :, None]).sum(axis=1) / denom


def apply_embeddings(
    params: Params,
    features: List[Feature],
    batch: Dict[str, jax.Array],
    rows: Dict[str, jax.Array] = None,
    attention: Dict[str, jax.Array] = None,
) -> jax.Array:
    """Gather + concat. ``batch[name]`` is (B,) int32 for categorical
    features, (B, max_len) int32 for sequence features (0 = pad, pooled
    to (B, E) per the feature's ``pooling`` mode), and (B,) float32 for
    numeric ones.

    ``rows``: optional pre-gathered table rows per feature ((B, E) /
    (B, L, E)) replacing the ``params`` lookups — the sparse-optimizer
    differentiation point (models/sparse_optimizer.py). Pooling/concat
    stay shared so the dense and sparse paths cannot drift apart.

    ``attention``: pooling params for attention-pooled sequence
    features ({feature: (E,)}), from the tower's "attention" subtree."""
    parts = []
    for f in features:
        x = batch[f.name]
        if f.kind == FeatureKind.CATEGORICAL:
            emb = (
                rows[f.name]
                if rows is not None and f.name in rows
                else jnp.take(params[f.name], x, axis=0)
            )
            parts.append(emb)
        elif f.kind == FeatureKind.SEQUENCE:
            emb = (
                rows[f.name]
                if rows is not None and f.name in rows
                else jnp.take(params[f.name], x, axis=0)
            )  # (B, L, E)
            parts.append(pool_sequence(f, x, emb, attention))
        else:
            parts.append(x.astype(jnp.float32)[:, None])
    return jnp.concatenate(parts, axis=-1)
