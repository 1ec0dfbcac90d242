"""Training with row-sharded embedding tables (BASELINE config[2]).

At 10M-item / 50M-user scale a single id table + its Adagrad accumulator
(2 x V x E fp32) exceeds one chip's HBM, so the big tables are row-sharded
``P("model", None)`` across the mesh while MLP weights and small tables
stay replicated (SURVEY §2.9 "tensor/model parallelism" row).

This module takes the idiomatic GSPMD route: only the PLACEMENT of the
table params changes; the train step stays the global-shape function from
models/two_tower.py. XLA partitions the gathers and transposes them to
sharded scatter-adds in the backward pass, inserting the all-to-all /
all-gather collectives over ICI automatically. (The explicit shard_map
equivalents live in parallel/sharded_embedding.py and are tested to match
dense gathers element-for-element.)

Optimizer state inherits table shardings by running ``optimizer.init``
under jit with the sharded params as inputs (GSPMD propagation).
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from hm_retrieval_tpu.models.two_tower import (
    TrainState,
    TwoTowerModel,
)
from hm_retrieval_tpu.parallel.mesh import (
    MODEL_AXIS,
    batch_sharding,
    place_global,
    replicated,
)


def param_shardings(
    model: TwoTowerModel,
    mesh,
    sharded_features: Iterable[str],
):
    """Sharding pytree matching ``model.init_params()``: listed feature
    tables are row-sharded over the model axis, everything else
    replicated."""
    sharded = set(sharded_features)
    repl = replicated(mesh)
    rows = NamedSharding(mesh, P(MODEL_AXIS, None))
    params = jax.eval_shape(lambda: model.init_params(0))

    def spec_of(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "embeddings" in keys:
            name = keys[keys.index("embeddings") + 1]
            if name in sharded:
                return rows
        return repl

    return jax.tree_util.tree_map_with_path(spec_of, params)


def create_sharded_train_state(
    model: TwoTowerModel,
    optimizer,
    mesh,
    sharded_features: Iterable[str],
    seed: int = 0,
) -> TrainState:
    """Init + place params. Sharded tables are row-padded to a multiple
    of the model-axis size (explicit device_put needs divisible dims; the
    pad rows are unreachable by any id and receive zero gradient)."""
    shardings = param_shardings(model, mesh, sharded_features)
    params = model.init_params(seed)
    n_shards = mesh.shape[MODEL_AXIS]

    def place(x, s):
        if (
            isinstance(s, NamedSharding)
            and s.spec == P(MODEL_AXIS, None)
            and x.shape[0] % n_shards != 0
        ):
            pad = n_shards - (x.shape[0] % n_shards)
            x = jnp.concatenate(
                [x, jnp.zeros((pad, x.shape[1]), x.dtype)]
            )
        # multi-host safe: every process holds the full seeded init
        return place_global(np.asarray(x), s)

    params = jax.tree.map(place, params, shardings)

    # Optimizer accumulators must be sharded like their params, but optax
    # init builds them as constants (full_like), which GSPMD leaves
    # unconstrained — so derive explicit out_shardings: an opt-state leaf
    # whose path ends with a param's path gets that param's sharding.
    def path_keys(path):
        return tuple(
            getattr(p, "key", getattr(p, "name", getattr(p, "idx", None)))
            for p in path
        )

    by_path = {}
    for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]:
        by_path[path_keys(path)] = s
    repl = replicated(mesh)

    def opt_spec(path, leaf):
        keys = path_keys(path)
        for start in range(len(keys)):
            s = by_path.get(keys[start:])
            if s is not None:
                return s
        return repl

    opt_struct = jax.eval_shape(optimizer.init, params)
    opt_shardings = jax.tree_util.tree_map_with_path(
        opt_spec, opt_struct
    )
    opt_state = jax.jit(
        optimizer.init, out_shardings=opt_shardings
    )(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        step=place_global(
            np.zeros((), np.int32), replicated(mesh)
        ),
    )


def make_sharded_train_step(
    model: TwoTowerModel,
    optimizer,
    mesh,
    catalog=None,
    num_uniform_negatives: int = 0,
    base_seed: int = 0,
):
    """Jitted train step over sharded params: batch P("data"), params as
    placed by create_sharded_train_state (propagated from inputs)."""
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

    return jax.jit(step, donate_argnums=0)
