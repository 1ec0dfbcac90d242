"""Full-corpus retrieval at BASELINE config[2] scale — 10M items — on
ONE chip.

The point: the int8 quantized index makes a 10M x 128 catalog a
single-chip problem (1.25GB int8 vs 5GB fp32; the rescore variant keeps
both). Catalog is synthesized ON DEVICE (uploading 5GB through the
relay tunnel is not viable) and every array reaches jit as an explicit
argument (closure-captured arrays blow the remote-compile request).

Usage: timeout 3000 python benchmarks/measure_10m_catalog.py
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

# Shared harness: on-device scan, salted inputs, value-fetch sync,
# FULL-output consumption (see timing_util.py for why [0,0]-only
# consumers produce DCE artifacts with blocked Pallas drivers).
from timing_util import recall_vs, time_fn  # noqa: E402

from hm_retrieval_tpu.ops.pallas_retrieval import (
    pallas_exact_topk,
    pallas_quantized_topk,
)

N = 10 * 1024 * 1024
B, E, K = 1024, 128, 100
ITERS = 20


@jax.jit
def quantize_on_device(c):
    scales = jnp.max(jnp.abs(c), axis=1) / 127.0
    scales = jnp.where(scales > 0, scales, 1.0)
    codes = jnp.clip(
        jnp.rint(c / scales[:, None]), -127, 127
    ).astype(jnp.int8)
    return codes, scales.astype(jnp.float32)


def make_quant(k_over, rescore):
    def fn(q, arrays):
        c, codes, scales = arrays
        kk = k_over if rescore else K
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

    return fn


def main():
    print(f"backend: {jax.default_backend()}  N={N}", flush=True)
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

    variants = [
        ("pallas_exact", exact),
        ("pallas_quant_r1_os2_rescore", make_quant(2 * K, True)),
        ("pallas_quant_r1_noscore", make_quant(K, False)),
    ]
    for name, fn in variants:
        dt = time_fn(fn, q, arrays)
        _, got = jax.jit(fn)(q, arrays)
        print(
            json.dumps(
                {
                    "N": N,
                    "method": name,
                    "ms_per_batch": round(dt * 1e3, 3),
                    "queries_per_s": round(B / dt),
                    "recall_vs_exact": round(
                        recall_vs(want, got), 4
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
