"""Measure Pallas exact-top-k variants on the real TPU chip.

Usage: timeout 1200 python benchmarks/measure_pallas_variants.py
Prints ms/batch, queries/s, and round count per (keep_per_bin, L).
All timing loops run on device (lax.scan) with per-iteration input
variation (see CLAUDE.md tunnel notes).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs(".jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp

from hm_retrieval_tpu.ops.pallas_retrieval import pallas_exact_topk

B, N, E, K = 1024, 131072, 128, 100
ITERS = 100


def main():
    q = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (B, E), jnp.float32
        )
    )()
    c = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(1), (N, E), jnp.float32
        )
    )()
    jax.block_until_ready((q, c))

    results = []
    for keep, L, qblk in [
        (2, None, None),        # production defaults (q_block=128)
        (2, 256, 1 << 30),      # round-1 monolithic configuration
        (1, 512, 1 << 30),
    ]:

        @jax.jit
        def run(q, c, L=L, keep=keep, qblk=qblk):
            kw = {} if qblk is None else {"q_block": qblk}

            def body(carry, i):
                qq = jnp.roll(q, i, axis=0)
                v, idx, r = pallas_exact_topk(
                    qq, c, K, L=L, keep_per_bin=keep, **kw
                )
                acc, rmax = carry
                return (
                    acc + v[0, 0] + idx[0, 0],
                    jnp.maximum(rmax, r),
                ), None

            (acc, rmax), _ = jax.lax.scan(
                body, (0.0, jnp.int32(0)), jnp.arange(ITERS)
            )
            return acc, rmax

        acc, rmax = run(q, c)
        jax.block_until_ready(acc)  # compile + warm
        # the first timed execution in a process can absorb tunnel
        # warm-up costs: time twice, keep the best
        dt = float("inf")
        for _ in range(2):
            t0 = time.time()
            acc, rmax = run(q, c)
            rounds = int(rmax)  # host sync
            dt = min(dt, (time.time() - t0) / ITERS)
        row = {
            "keep_per_bin": keep,
            "L": L,
            "q_block": qblk,
            "ms_per_batch": round(dt * 1e3, 2),
            "queries_per_s": round(B / dt),
            "max_rounds": rounds,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"config": {"B": B, "N": N, "E": E, "K": K}}))


if __name__ == "__main__":
    main()
