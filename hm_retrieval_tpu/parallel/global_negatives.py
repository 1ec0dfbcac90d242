"""Explicit shard_map formulation of global-batch in-batch negatives.

The BASELINE.json north star: "in-batch sampled-softmax with logQ
correction computed on the global batch via cross-host all-gather of
candidate embeddings". The GSPMD path (parallel/data_parallel.py) gets this
implicitly; this module spells the communication out with shard_map so the
collective pattern is explicit, testable, and tunable:

    per device d (data axis, size D; local batch b = B/D):
      q_d = query_tower(batch_d)                      # (b, E)   local
      c_d = candidate_tower(batch_d)                  # (b, E)   local
      C   = all_gather(c_d,  axis="data")             # (B, E)   ICI
      ids = all_gather(ids_d, axis="data")            # (B,)     ICI
      logits_d = q_d @ C^T - logQ[ids]                # (b, B)
      labels: row i of shard d is positive at column d*b + i
      loss_d = sum-CE over local rows; loss = psum(loss_d)

The identity-label diagonal offset per shard is SURVEY §7 hard part #2.
Gradients flow through the collectives (all_gather transposes to
reduce-scatter under AD); params stay replicated so grads arrive psum'd.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from hm_retrieval_tpu.models.two_tower import TwoTowerModel
from hm_retrieval_tpu.parallel.mesh import DATA_AXIS


def make_global_negatives_loss(model: TwoTowerModel, mesh):
    """Returns loss_fn(params, batch) where batch is globally sharded
    ``P("data")`` and the result equals the single-device loss on the same
    global batch (verified by tests/test_parallel.py)."""

    def local_loss(params, batch):
        # Runs per-shard inside shard_map: shapes are LOCAL.
        q = model.query_forward(params, batch)        # (b, E)
        c = model.candidate_forward(params, batch)    # (b, E)
        ids = batch[model.candidate_id_col]           # (b,)
        b = q.shape[0]

        all_c = jax.lax.all_gather(
            c, DATA_AXIS, axis=0, tiled=True
        )                                             # (B, E)
        all_ids = jax.lax.all_gather(
            ids, DATA_AXIS, axis=0, tiled=True
        )                                             # (B,)

        logits = jnp.dot(
            q, all_c.T, preferred_element_type=jnp.float32
        )                                             # (b, B)
        if model.logq is not None:
            logits = logits - jnp.take(
                model.logq, all_ids, axis=0
            )[None, :]

        shard = jax.lax.axis_index(DATA_AXIS)
        # row i (local) is positive at global column shard*b + i
        diag_cols = shard * b + jnp.arange(b)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(
            log_probs, diag_cols[:, None], axis=1
        )[:, 0]
        loss = -jnp.sum(picked)
        return jax.lax.psum(loss, DATA_AXIS)

    batch_specs = {
        f.name: P(DATA_AXIS)
        for f in model.query_features + model.candidate_features
    }

    smapped = shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=P(),
        check_vma=False,
    )

    return smapped
