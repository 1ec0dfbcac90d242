"""Shared TPU timing harness for the retrieval benchmarks.

Two hard-won rules (CLAUDE.md):

1. Loop ON DEVICE (lax.scan) with inputs varied per iteration
   (jnp.roll + salt), sync ONCE with a VALUE fetch — host<->device
   round-trips through the relay tunnel are ~150ms and
   block_until_ready alone can return early.

2. CONSUME EVERY OUTPUT ELEMENT (jnp.sum of all leaves), never just
   out[0, 0]. The blocked Pallas drivers concatenate per-query-block
   results, and XLA dead-code-eliminates whole blocks (each an
   independent pallas_call + while_loop) behind a [0, 0] slice of a
   concatenate — measured "1.8ms" for a pass whose honest cost is
   6.4ms (1 of 4 blocks live). A full-batch reduction keeps every
   block live for ~us of extra work.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50


def consume(out):
    """Reduce every leaf to a scalar so nothing is DCE-able."""
    acc = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(out):
        acc = acc + jnp.sum(leaf).astype(jnp.float32)
    return acc


def time_fn(fn, q, arrays, iters=ITERS):
    """min over 2 salted runs of mean ms/iteration of fn(q, arrays)."""

    @jax.jit
    def run(q, arrays, salt):
        def body(acc, i):
            qq = jnp.roll(q, i + salt, axis=0)
            return acc + consume(fn(qq, arrays)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    float(run(q, arrays, jnp.int32(0)))  # compile + warm (value fetch)
    dt = float("inf")
    for salt in (1, 2):
        t0 = time.time()
        float(run(q, arrays, jnp.int32(salt)))
        dt = min(dt, (time.time() - t0) / iters)
    return dt


def recall_vs(want_ids, got_ids):
    want, got = np.asarray(want_ids), np.asarray(got_ids)
    hits = sum(
        len(set(w.tolist()) & set(g.tolist()))
        for w, g in zip(want, got)
    )
    return hits / want.size
