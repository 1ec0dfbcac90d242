"""Measure the int8 quantized scan index vs the exact paths on TPU.

Usage: timeout 1800 python benchmarks/measure_quantized_index.py
Per (N, method): ms/batch, queries/s, and top-k recall vs the exact
oracle on one batch. Timing loops run on device (lax.scan) with input
variation per iteration (see CLAUDE.md tunnel notes).
"""

import json
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

from hm_retrieval_tpu.indices.brute_force import BruteForceIndex
from hm_retrieval_tpu.indices.quantized import QuantizedIndex

B, E, K = 1024, 128, 100
ITERS = 100


def time_index(topk_fn, q, iters=ITERS):
    @jax.jit
    def run(q):
        def body(acc, i):
            qq = jnp.roll(q, i, axis=0)
            s, ids = topk_fn(qq)
            return acc + s[0, 0] + ids[0, 0].astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
        return acc

    acc = run(q)
    jax.block_until_ready(acc)  # compile + warm
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(run(q))
        dt = min(dt, (time.time() - t0) / iters)
    return dt


def recall_vs(want_ids, got_ids):
    want, got = np.asarray(want_ids), np.asarray(got_ids)
    hits = sum(
        len(set(w.tolist()) & set(g.tolist()))
        for w, g in zip(want, got)
    )
    return hits / want.size


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    for N in (131072, 1048576):
        key = jax.random.PRNGKey(0)
        c = jax.jit(
            lambda key=key, N=N: jax.random.normal(
                key, (N, E), jnp.float32
            )
        )()
        q = jax.jit(
            lambda: jax.random.normal(
                jax.random.PRNGKey(1), (B, E), jnp.float32
            )
        )()
        ids = np.arange(1, N + 1, dtype=np.int32)
        jax.block_until_ready((q, c))
        c_host = np.asarray(c)

        exact = BruteForceIndex(K, ids, c_host, method="pallas")
        _, want = exact.topk_from_embeddings(q)
        rows = []
        for name, idx in [
            ("pallas_exact", exact),
            (
                "quantized_rescore",
                QuantizedIndex(K, ids, c_host, rescore=True),
            ),
            (
                "quantized_noscore",
                QuantizedIndex(K, ids, c_host, rescore=False),
            ),
        ]:
            dt = time_index(idx.topk_from_embeddings, q)
            _, got = idx.topk_from_embeddings(q)
            r = recall_vs(want, got)
            row = {
                "N": N,
                "method": name,
                "ms_per_batch": round(dt * 1e3, 3),
                "queries_per_s": round(B / dt),
                "recall_vs_exact": round(r, 4),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        del exact, c, c_host


if __name__ == "__main__":
    main()
