"""Export the retrieval path as a TF-Serving SavedModel.

The reference's deployment artifact is a TF SavedModel whose concrete
serving function takes ``(None, 1)`` string feature tensors and returns
``(B, k)`` string candidate ids (ref: pkg/modelling/indices/
brute_force.py:108-114, pkg/modelling/models/abstract_keras_model.py:
109-131, README.md:101-105). The TPU-native framework keeps strings off
the device (SURVEY §7), so serving normally goes through
``serving/service.py`` (host-edge encode/decode around npz artifacts).

This module closes the deployment-contract gap for users who serve with
TF-Serving: it wraps the JAX query tower + exact top-k into a single
self-contained SavedModel —

    string features ─► tf.lookup.StaticHashTable (vocab -> int id, 0=OOV,
                       mirroring the reference's StringLookup
                       num_oov_indices=1, ref: input_layer.py:33-36)
                   ─► jax2tf-converted tower forward + dot + top-k
                       (weights stored as tf.Variables)
                   ─► tf.gather over the candidate vocab (id -> string,
                       id 0 -> "<OOV>", matching Feature.decode)

The exported graph uses the portable XLA top-k path (not the Pallas TPU
kernel) so the SavedModel runs on stock TF-Serving CPU/GPU images; the
Pallas path remains the on-TPU serving fast path via RetrievalService.

Feature kinds and their serving tensors (the reference supports exactly
tf.string / tf.float32 scalars, ref: pkg/schema/features.py:43; SEQUENCE
is this framework's extension):

    CATEGORICAL  (None, 1) tf.string        -> hash-table id lookup
    NUMERIC      (None, 1) tf.float32       -> standardize + nan_to_num
    SEQUENCE     (None, max_len) tf.string  -> per-token id lookup;
                 right-pad short histories with "" (never in a vocab, so
                 it encodes to 0 = pad/OOV, which pooling masks out —
                 the same contract as Feature.encode_sequence). Clients
                 must pre-truncate to the LAST max_len tokens.
"""

from __future__ import annotations

import logging
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from hm_retrieval_tpu.indices.brute_force import BruteForceIndex
from hm_retrieval_tpu.models.tower import tower_forward
from hm_retrieval_tpu.schema.features import Feature, FeatureKind
from hm_retrieval_tpu.schema.schema import Schema

logger = logging.getLogger(__name__)

OOV_TOKEN = "<OOV>"


def validate_exportable_schema(schema: Schema) -> None:
    """Raise if the schema cannot be exported as a SavedModel.

    Pure host-side check (no TF import) so runners can fail fast BEFORE
    training instead of crashing at export time after all epochs ran.
    """
    for f in list(schema.query_features) + [
        schema.candidate_id_feature
    ]:
        if f.kind in (
            FeatureKind.CATEGORICAL,
            FeatureKind.SEQUENCE,
        ):
            if f.vocab is None:
                raise ValueError(
                    f"SavedModel export: feature {f.name!r} has no "
                    "built vocab (run build_schema_runner first)"
                )
        elif f.standardize and (f.mean is None or f.std is None):
            raise ValueError(
                f"SavedModel export: numeric feature {f.name!r} is "
                "standardized but its train statistics are not built"
            )


def export_index_savedmodel(
    schema: Schema,
    query_tower_params,
    index: BruteForceIndex,
    out_dir: str,
    platforms: List[str] = ("cpu",),
) -> None:
    """Write a servable SavedModel to ``out_dir``.

    ``platforms``: jax2tf native-serialization targets (e.g. ["cpu"] for
    stock TF-Serving, ["cpu", "tpu"] for Cloud TPU serving).
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    validate_exportable_schema(schema)
    query_features = schema.query_features

    # ---- device-side function (traced once by jax2tf) ----------------
    # Closure-free: all weights arrive as explicit leaves so they become
    # tf.Variables in the SavedModel instead of giant graph constants.
    index_emb = index.embeddings
    if index_emb is None:
        # QuantizedIndex without the fp32 rescore table: export the
        # dequantized catalog (codes * per-row scale) — the same ranking
        # its rescore=False serving path uses.
        index_emb = np.asarray(
            index.codes, np.float32
        ) * np.asarray(index.scales)[:, None]
    emb = np.asarray(index_emb)  # padded (N_pad, E)
    bias = np.asarray(index._score_bias)  # (N_pad,), -inf on pad rows
    ids = np.asarray(index.identifiers)  # (N_pad,) int
    k = index.k

    def _topk_ids(params, emb, bias, ids, int_batch):
        q = tower_forward(params, query_features, int_batch)
        scores = (
            jnp.dot(q, emb.T, preferred_element_type=jnp.float32)
            + bias[None, :]
        )
        _, top_idx = jax.lax.top_k(scores, k)
        return jnp.take(ids, top_idx)

    tf_fn = jax2tf.convert(
        _topk_ids,
        with_gradient=False,
        native_serialization_platforms=tuple(platforms),
        # dynamic batch dimension "b" on every feature input; weights
        # (params/emb/bias/ids) are static; sequence windows are static
        # max_len columns
        polymorphic_shapes=[
            None,
            None,
            None,
            None,
            {
                f.name: (
                    f"(b, {f.max_len})"
                    if f.kind == FeatureKind.SEQUENCE
                    else "(b,)"
                )
                for f in query_features
            },
        ],
    )

    # ---- TF module ----------------------------------------------------
    params_leaves, params_treedef = jax.tree.flatten(query_tower_params)

    module = tf.Module()
    module._variables = [
        tf.Variable(np.asarray(leaf), trainable=False)
        for leaf in params_leaves
    ]
    module._emb = tf.Variable(emb, trainable=False)
    module._bias = tf.Variable(bias, trainable=False)
    module._ids = tf.Variable(ids, trainable=False)

    # String-edge lookup tables (one per categorical/sequence feature),
    # exactly the encode contract of Feature.encode: vocab[i] -> i+1,
    # OOV -> 0 (sequence pads "" are OOV too, masked by pooling).
    tables = {}
    for f in query_features:
        if f.kind in (
            FeatureKind.CATEGORICAL,
            FeatureKind.SEQUENCE,
        ):
            vocab = np.asarray(f.vocab, dtype=str)
            tables[f.name] = tf.lookup.StaticHashTable(
                tf.lookup.KeyValueTensorInitializer(
                    keys=tf.constant(list(vocab)),
                    values=tf.constant(
                        np.arange(1, len(vocab) + 1, dtype=np.int32)
                    ),
                ),
                default_value=0,
            )
    module._tables = tables

    # id -> string decode table for the returned candidates
    # (Feature.decode: padded vocab with "<OOV>" at 0).
    cid = schema.candidate_id_feature
    decode_vocab = np.concatenate(
        [np.array([OOV_TOKEN]), np.asarray(cid.vocab, dtype=str)]
    )
    module._decode = tf.constant(list(decode_vocab))

    numeric_stats = {
        f.name: (
            float(f.mean) if f.standardize else 0.0,
            float(f.std) if f.standardize else 1.0,
        )
        for f in query_features
        if f.kind == FeatureKind.NUMERIC
    }

    # The reference serving signature: dict of (None, 1) tensors
    # (ref: abstract_keras_model.py:30-44); sequence features widen to
    # (None, max_len).
    input_signature = [
        {
            f.name: tf.TensorSpec(
                shape=(
                    (None, f.max_len)
                    if f.kind == FeatureKind.SEQUENCE
                    else (None, 1)
                ),
                dtype=(
                    tf.float32
                    if f.kind == FeatureKind.NUMERIC
                    else tf.string
                ),
                name=f.name,
            )
            for f in query_features
        }
    ]

    def serve(raw):
        int_batch = {}
        for f in query_features:
            if f.kind == FeatureKind.SEQUENCE:
                # per-token lookup over the (b, max_len) window; ""
                # pads hit the default value 0 (pad/OOV, masked by
                # the pooling in tower_forward)
                int_batch[f.name] = module._tables[f.name].lookup(
                    raw[f.name]
                )
                continue
            x = tf.squeeze(raw[f.name], axis=1)
            if f.kind == FeatureKind.CATEGORICAL:
                int_batch[f.name] = module._tables[f.name].lookup(x)
            else:
                mean, std = numeric_stats[f.name]
                x = (x - mean) / std
                # Mirror Feature.transform_numeric's np.nan_to_num:
                # NaN -> 0 after standardization (missing reads as 'at
                # the mean'), +/-inf squashed to the float32 extremes.
                x = tf.where(tf.math.is_nan(x), tf.zeros_like(x), x)
                int_batch[f.name] = tf.clip_by_value(
                    x, tf.float32.min, tf.float32.max
                )
        params = jax.tree.unflatten(
            params_treedef, list(module._variables)
        )
        top_ids = tf_fn(
            params, module._emb, module._bias, module._ids, int_batch
        )
        # Mirror Feature.decode: ids outside [0, len(vocab)] decode to
        # '<OOV>' instead of aborting the gather at serve time (an index
        # built from ids not encoded with this schema must not crash).
        safe_ids = tf.where(
            (top_ids >= 0)
            & (top_ids < tf.size(module._decode, out_type=top_ids.dtype)),
            top_ids,
            tf.zeros_like(top_ids),
        )
        return {
            "candidate_ids": tf.gather(module._decode, safe_ids)
        }

    module.serve = tf.function(serve, input_signature=input_signature)
    concrete = module.serve.get_concrete_function()
    tf.saved_model.save(
        module, out_dir, signatures={"serving_default": concrete}
    )
    logger.info(
        "Exported TF-Serving SavedModel to %s (k=%d, %d candidates, "
        "platforms=%s)",
        out_dir,
        k,
        index.num_candidates,
        list(platforms),
    )
