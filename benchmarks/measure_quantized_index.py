"""Measure the int8 quantized scan index vs the exact Pallas path on TPU.

Usage: timeout 1800 python benchmarks/measure_quantized_index.py
Per (N, method): ms/batch, queries/s, and top-k recall vs the exact
oracle on one batch. All catalogs are synthesized ON DEVICE (a 512MB
fp32 catalog would take minutes to round-trip through the relay
tunnel), and every array reaches jit as an EXPLICIT argument — closure-
captured device arrays get serialized into the remote-compile HTTP
request and blow its length limit (HTTP 413) at large N.
"""

import json
import os
import sys
from functools import partial

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

os.makedirs(".jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

from hm_retrieval_tpu.indices.quantized import QuantizedIndex
from hm_retrieval_tpu.ops.pallas_retrieval import (
    pallas_exact_topk,
    pallas_quantized_topk,
)

B, E, K = 1024, 128, 100
CHUNK = 65536
K_OVER = 4 * K
ITERS = 100


@jax.jit
def quantize_on_device(c):
    scales = jnp.max(jnp.abs(c), axis=1) / 127.0
    scales = jnp.where(scales > 0, scales, 1.0)
    codes = jnp.clip(
        jnp.rint(c / scales[:, None]), -127, 127
    ).astype(jnp.int8)
    return codes, scales.astype(jnp.float32)


def make_fns(n):
    ids = jnp.arange(1, n + 1, dtype=jnp.int32)
    zeros = jnp.zeros((n,), jnp.float32)

    def exact(q, arrays):
        c, _, _ = arrays
        v, idx, _ = pallas_exact_topk(q, c, K, keep_per_bin=2)
        return v, idx + 1  # ids are 1-based row numbers

    def quant(q, arrays, rescore):
        c, codes, scales = arrays
        return QuantizedIndex._topk(
            q,
            codes,
            scales,
            zeros,
            ids,
            c if rescore else None,
            K,
            K_OVER,
            CHUNK,
            0.95,
        )

    def pquant(q, arrays, rescore):
        """Fused int8 Pallas scan (catalog streams as int8) + optional
        fp32 rescore of the k_over survivors. max_rounds=1 is the
        production default (QuantizedIndex.pallas_rounds): survivor
        refinement doesn't move recall, quantization error does —
        see benchmarks/tune_pallas_quantized.py."""
        c, codes, scales = arrays
        kk = K_OVER if rescore else K
        v, idx, _ = pallas_quantized_topk(
            q, codes, scales, kk, max_rounds=1
        )
        if rescore:
            rows = jnp.take(c, idx, axis=0)
            exact = jnp.einsum(
                "be,bke->bk",
                q,
                rows,
                preferred_element_type=jnp.float32,
            )
            v, sel = jax.lax.top_k(exact, K)
            idx = jnp.take_along_axis(idx, sel, axis=1)
        else:
            v, idx = v[:, :K], idx[:, :K]
        return v, idx + 1

    return {
        "pallas_exact": exact,
        "quantized_rescore": partial(quant, rescore=True),
        "quantized_noscore": partial(quant, rescore=False),
        "pallas_quant_rescore": partial(pquant, rescore=True),
        "pallas_quant_noscore": partial(pquant, rescore=False),
    }


# Timing via the shared harness: on-device scan, salted inputs, value-
# fetch sync, and FULL-output consumption (a [0,0]-only consumer lets
# XLA dead-code-eliminate whole query blocks of the blocked Pallas
# drivers — see timing_util.py).
from timing_util import recall_vs, time_fn  # noqa: E402


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    for N in (131072, 1048576):
        c = jax.jit(
            lambda N=N: jax.random.normal(
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

        fns = make_fns(N)
        _, want = jax.jit(fns["pallas_exact"])(q, arrays)
        for name, fn in fns.items():
            dt = time_fn(fn, q, arrays)
            _, got = jax.jit(fn)(q, arrays)
            row = {
                "N": N,
                "method": name,
                "ms_per_batch": round(dt * 1e3, 3),
                "queries_per_s": round(B / dt),
                "recall_vs_exact": round(recall_vs(want, got), 4),
            }
            print(json.dumps(row), flush=True)
        del c, codes, scales, arrays


if __name__ == "__main__":
    main()
