"""logQ sampled-softmax correction as a dense table gather.

Re-design of ref: pkg/modelling/layers/logq_correction.py:44-71. The
reference looks probabilities up in a ``tf.lookup.StaticHashTable`` with
``default_value=1.0`` (unknown id => subtract log(1)=0); here the Schema
precomputes ``logq[id] = log(P(id))`` with ``logq[0] = 0`` for OOV, so the
correction is a single gather + broadcast subtract:

    logits[i, j] -= logq[candidate_ids[j]]

Candidates sit on the logits column axis, and the correction row is
broadcast over all query rows, exactly like the reference's transpose +
broadcast (ref: logq_correction.py:65-71). Math motivation: in-batch
negatives are sampled ∝ popularity, so subtracting log Q(j) de-biases the
softmax (ref: README.md:87-99).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_logq_correction(
    logits: jax.Array,        # (Q, C)
    candidate_ids: jax.Array,  # (C,) int32 — ids of the column candidates
    logq_table: jax.Array,     # (V+1,) float32, [0] == 0.0
) -> jax.Array:
    corrections = jnp.take(logq_table, candidate_ids, axis=0)  # (C,)
    return logits - corrections[None, :]
