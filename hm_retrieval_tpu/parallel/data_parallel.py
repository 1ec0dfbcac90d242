"""Data-parallel training over the mesh (GSPMD path).

No reference analog (the reference is single-device, SURVEY §2.9). The
train step itself (models/two_tower.py) is written over GLOBAL shapes; this
module pins the shardings so GSPMD compiles it SPMD:

- params + opt state replicated ``P()``
- batch sharded ``P("data")`` on the leading axis
- XLA inserts: all-gather of candidate embeddings to build each device's
  ``(B/d, B)`` logits block (global in-batch negatives), then a gradient
  psum over ICI. Identity labels keep their global index semantics, so no
  per-shard offset bookkeeping is needed — that's the point of writing the
  loss globally (cf. parallel/global_negatives.py for the explicit
  shard_map formulation used as a cross-check).
"""

from __future__ import annotations

import jax
import optax

from hm_retrieval_tpu.models.two_tower import (
    TrainState,
    TwoTowerModel,
)
from hm_retrieval_tpu.parallel.mesh import batch_sharding, replicated


def make_dp_train_step(
    model: TwoTowerModel,
    optimizer,
    mesh,
    catalog=None,
    num_uniform_negatives: int = 0,
    base_seed: int = 0,
):
    """Jitted SPMD train step with explicit in/out shardings. Optional
    mixed uniform negatives as in models.two_tower.make_train_step."""
    repl = replicated(mesh)
    bshard = batch_sharding(mesh)

    if num_uniform_negatives > 0:
        if catalog is None:
            raise ValueError(
                "uniform negatives require a CandidateCatalog"
            )
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

    def step(state: TrainState, batch):
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

    state_shardings = TrainState(
        params=repl, opt_state=repl, step=repl
    )
    return jax.jit(
        step,
        in_shardings=(state_shardings, bshard),
        out_shardings=(state_shardings, repl),
        donate_argnums=0,
    )


def replicate_state(state: TrainState, mesh) -> TrainState:
    from hm_retrieval_tpu.parallel.mesh import replicate_pytree

    return replicate_pytree(state, mesh)
