"""Mixed-negative training: in-batch + uniformly sampled negatives.

BASELINE config[4] (no reference analog — the reference trains purely on
in-batch negatives, ref: two_tower_model.py:94-124). Motivation: in-batch
negatives are popularity-biased; mixing in uniform negatives exposes the
model to the long tail.

Loss shape: logits over ``[B in-batch | M uniform]`` candidate columns,
labels still the identity on the first B columns. Sampled-softmax
corrections subtract the log *expected appearance count* of each column's
candidate among the negatives:

    in-batch column j:  log E[count] = log(B * p_j)   = log B + logQ[j]
    uniform  column u:  log E[count] = log(M * 1/N)   = log M - log N

(The reference drops the constant ``log B`` because with a single column
group a constant shift cancels in the softmax — with two groups the
relative offset matters, so both terms are kept exactly.)

The uniform negatives need full candidate features (the candidate tower
consumes more than the id), so sampling draws random ROWS of the candidate
catalog (the unique-candidates dataset, ref: tfrecord_writer/runner.py:32-43)
held on device as a dict of int columns.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


class CandidateCatalog:
    """Device-resident unique-candidate feature columns."""

    def __init__(self, columns: Dict[str, np.ndarray]):
        if not columns:
            raise ValueError("catalog must have at least one column")
        n = {len(v) for v in columns.values()}
        if len(n) != 1:
            raise ValueError("catalog columns must share length")
        self.num_candidates = n.pop()
        self.columns = {
            k: jnp.asarray(v) for k, v in columns.items()
        }

    def sample(self, key: jax.Array, m: int) -> Dict[str, jax.Array]:
        idx = jax.random.randint(
            key, (m,), 0, self.num_candidates
        )
        return {
            k: jnp.take(v, idx, axis=0)
            for k, v in self.columns.items()
        }


def mixed_negatives_loss(
    model,
    params,
    batch: Dict[str, jax.Array],
    catalog: CandidateCatalog,
    key: jax.Array,
    num_uniform: int,
) -> jax.Array:
    """Sum-reduced softmax CE over [in-batch | uniform] candidates."""
    q = model.query_forward(params, batch)              # (B, E)
    c_in = model.candidate_forward(params, batch)       # (B, E)
    neg_batch = catalog.sample(key, num_uniform)
    c_neg = model.candidate_forward(params, neg_batch)  # (M, E)

    B = q.shape[0]
    logits_in = jnp.dot(
        q, c_in.T, preferred_element_type=jnp.float32
    )
    logits_neg = jnp.dot(
        q, c_neg.T, preferred_element_type=jnp.float32
    )

    # Corrections come as a pair: relative offsets between the two column
    # groups are what matters, so apply either both or neither — applying
    # only the uniform term (when logQ is disabled) would systematically
    # boost uniform negatives in the softmax.
    if model.logq is not None:
        corr_in = jnp.take(
            model.logq, batch[model.candidate_id_col], axis=0
        ) + jnp.log(jnp.float32(B))
        logits_in = logits_in - corr_in[None, :]
        corr_neg = jnp.log(
            jnp.float32(num_uniform) / catalog.num_candidates
        )
        logits_neg = logits_neg - corr_neg

    logits = jnp.concatenate([logits_in, logits_neg], axis=1)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.diagonal(log_probs[:, :B]))
