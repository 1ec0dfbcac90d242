"""Micro-breakdown of the sparse train step on the real TPU.

Times each phase of models/sparse_optimizer.py's step in isolation with
on-device scan loops: (a) jnp.unique-based dedup, (b) the sparse Adagrad
scatter update, (c) tower fwd+bwd, (d) the full step.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

os.makedirs(".jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

import bench
from hm_retrieval_tpu.models import OptimizerFactory
from hm_retrieval_tpu.models.sparse_optimizer import (
    _sparse_adagrad_update,
    create_sparse_train_state,
    make_sparse_train_step,
)

B = 512
ITERS = 200


def _sync(out):
    """Force a VALUE fetch: through the relay tunnel
    block_until_ready can return before execution finishes
    (CLAUDE.md timing note)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]


def timed(name, fn, *args):
    out = jax.jit(fn)(*args)
    _sync(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        out = jax.jit(fn)(*args)
        _sync(out)
        best = min(best, (time.time() - t0) / ITERS)
    print(f"{name:28s} {best*1e6:9.1f} us/iter")


def main():
    model, n_customers, n_articles = bench.hm_scale_model()
    opt = OptimizerFactory.get_optimizer(
        "adagrad", {"learning_rate": 0.05}
    )
    state = create_sparse_train_state(model, opt, 0)
    key = jax.random.PRNGKey(0)

    def ids_for(key):
        return jax.random.randint(
            key, (B,), 0, n_customers, dtype=jnp.int32
        )

    # (a) unique + inverse (the sort)
    def unique_loop(key):
        def body(c, i):
            ids = ids_for(jax.random.fold_in(key, i))
            u, inv = jnp.unique(
                ids, size=B, fill_value=-1, return_inverse=True
            )
            return c + u[0] + inv[0], None

        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(ITERS))
        return c

    timed("unique(512)", unique_loop, key)

    # (b) full sparse update on the big table
    table = state.params["query_tower"]["embeddings"]["customer_id"]
    acc = state.sparse_state.accumulators["query_tower"]["customer_id"]

    def update_loop(table, acc, key):
        def body(carry, i):
            t, a = carry
            ids = ids_for(jax.random.fold_in(key, i))
            g = jnp.ones((B, t.shape[1]), jnp.float32) * 1e-4
            t, a = _sparse_adagrad_update(t, a, ids, g, 0.05, 1e-7)
            return (t, a), None

        (t, a), _ = jax.lax.scan(
            body, (table, acc), jnp.arange(ITERS)
        )
        return t[0, 0] + a[0, 0]

    timed("sparse_update(1.37M table)", update_loop, table, acc, key)

    # (c) loss fwd+bwd only (no update)
    def fwdbwd_loop(params, key):
        def body(c, i):
            k = jax.random.fold_in(key, i)
            kc, ka, kp, kcol = jax.random.split(k, 4)
            batch = {
                "customer_id": jax.random.randint(
                    kc, (B,), 0, n_customers + 1, dtype=jnp.int32
                ),
                "article_id": jax.random.randint(
                    ka, (B,), 0, n_articles + 1, dtype=jnp.int32
                ),
                "product_type_name": jax.random.randint(
                    kp, (B,), 0, 131, dtype=jnp.int32
                ),
                "colour_group_name": jax.random.randint(
                    kcol, (B,), 0, 51, dtype=jnp.int32
                ),
            }
            loss, grads = jax.value_and_grad(model.loss)(
                params, batch
            )
            leaf = jax.tree.leaves(grads)[0]
            return c + loss + leaf.ravel()[0], None

        c, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        return c

    timed("loss fwd+bwd (dense grads)", fwdbwd_loop, state.params, key)

    # (d) the production full step
    inner = make_sparse_train_step(model, opt, 0.05)

    def step_loop(state, key):
        def body(carry, i):
            st, _ = carry
            k = jax.random.fold_in(key, i)
            kc, ka, kp, kcol = jax.random.split(k, 4)
            batch = {
                "customer_id": jax.random.randint(
                    kc, (B,), 0, n_customers + 1, dtype=jnp.int32
                ),
                "article_id": jax.random.randint(
                    ka, (B,), 0, n_articles + 1, dtype=jnp.int32
                ),
                "product_type_name": jax.random.randint(
                    kp, (B,), 0, 131, dtype=jnp.int32
                ),
                "colour_group_name": jax.random.randint(
                    kcol, (B,), 0, 51, dtype=jnp.int32
                ),
            }
            st, m = inner.__wrapped__(st, batch)
            return (st, m["loss"]), None

        (st, loss), _ = jax.lax.scan(
            body, (state, 0.0), jnp.arange(ITERS)
        )
        return loss

    timed("full sparse step", step_loop, state, key)


if __name__ == "__main__":
    main()
