"""Decompose the single-pass quantized rescore path: survivor pass vs
fp32 rescore, across survivor counts.

Usage: timeout 2400 python benchmarks/decompose_rescore.py
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

os.makedirs(".jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

from hm_retrieval_tpu.ops.pallas_retrieval import (
    pallas_exact_topk,
    pallas_quantized_topk,
)

B, E, K = 1024, 128, 100
QB, L = 256, 1024


@jax.jit
def quantize_on_device(c):
    scales = jnp.max(jnp.abs(c), axis=1) / 127.0
    scales = jnp.where(scales > 0, scales, 1.0)
    codes = jnp.clip(
        jnp.rint(c / scales[:, None]), -127, 127
    ).astype(jnp.int8)
    return codes, scales.astype(jnp.float32)


# shared harness: full-output consumption keeps every query block live
# (first/last-element-only consumers let XLA DCE interior query blocks)
from timing_util import recall_vs, time_fn  # noqa: E402


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    N = 1048576
    c = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (N, E), jnp.float32
        )
    )()
    q = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(1), (B, E), jnp.float32
        )
    )()
    codes, scales = quantize_on_device(c)
    jax.block_until_ready((q, c, codes, scales))
    arrays = (c, codes, scales)

    def exact(q, arrays):
        v, idx, _ = pallas_exact_topk(
            q, arrays[0], K, keep_per_bin=2
        )
        return v, idx + 1

    _, want = jax.jit(exact)(q, arrays)

    def pass_only(kk):
        def fn(q, arrays):
            _, codes, scales = arrays
            v, idx, _ = pallas_quantized_topk(
                q, codes, scales, kk, max_rounds=1, q_block=QB, L=L
            )
            return v, idx

        return fn

    def rescore_full(kk):
        def fn(q, arrays):
            c, codes, scales = arrays
            v, idx, _ = pallas_quantized_topk(
                q, codes, scales, kk, max_rounds=1, q_block=QB, L=L
            )
            rows = jnp.take(c, idx, axis=0)
            exact_s = jnp.einsum(
                "be,bke->bk",
                q,
                rows,
                preferred_element_type=jnp.float32,
            )
            v, sel = jax.lax.top_k(exact_s, K)
            idx = jnp.take_along_axis(idx, sel, axis=1)
            return v, idx + 1

        return fn

    for kk in (100, 128, 200, 256):
        row = {"kk": kk, "q_block": QB, "L": L}
        row["pass_ms"] = round(
            time_fn(pass_only(kk), q, arrays) * 1e3, 3
        )
        row["full_ms"] = round(
            time_fn(rescore_full(kk), q, arrays) * 1e3, 3
        )
        _, got = jax.jit(rescore_full(kk))(q, arrays)
        row["recall"] = round(recall_vs(want, got), 4)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
