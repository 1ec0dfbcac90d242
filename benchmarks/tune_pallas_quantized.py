"""Tune the fused int8 Pallas quantized path: survivor-pass count x
oversample x rescore split, measured on the real chip.

The rescored path doesn't need EXACT top-k_over survivors — the fp32
rescore fixes ordering, so survivor selection only needs good coverage
of the true top-k. max_rounds=1 turns the refinement loop into a single
streaming pass (per-bin top-2 + one merge), trading a provably-exact
survivor set for fewer passes.

Usage: timeout 2400 python benchmarks/tune_pallas_quantized.py
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

# Shared harness: on-device scan, salted inputs, value-fetch sync,
# FULL-output consumption (see timing_util.py for why [0,0]-only
# consumers produce DCE artifacts with blocked Pallas drivers).
from timing_util import recall_vs, time_fn  # noqa: E402

from hm_retrieval_tpu.ops.pallas_retrieval import (
    pallas_exact_topk,
    pallas_quantized_topk,
)

B, E, K = 1024, 128, 100
ITERS = 50


@jax.jit
def quantize_on_device(c):
    scales = jnp.max(jnp.abs(c), axis=1) / 127.0
    scales = jnp.where(scales > 0, scales, 1.0)
    codes = jnp.clip(
        jnp.rint(c / scales[:, None]), -127, 127
    ).astype(jnp.int8)
    return codes, scales.astype(jnp.float32)


def make_variant(k_over, max_rounds, rescore):
    def fn(q, arrays):
        c, codes, scales = arrays
        kk = k_over if rescore else K
        v, idx, _ = pallas_quantized_topk(
            q, codes, scales, kk, max_rounds=max_rounds
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

    variants = [
        ("exact", exact),
        ("quant_r8_os4_rescore", make_variant(400, 8, True)),
        ("quant_r1_os4_rescore", make_variant(400, 1, True)),
        ("quant_r1_os2_rescore", make_variant(200, 1, True)),
        ("quant_r2_os2_rescore", make_variant(200, 2, True)),
        ("quant_r1_os1_rescore", make_variant(100, 1, True)),
        ("quant_r8_noscore", make_variant(100, 8, False)),
        ("quant_r1_noscore", make_variant(100, 1, False)),
    ]
    for name, fn in variants:
        dt = time_fn(fn, q, arrays)
        _, got = jax.jit(fn)(q, arrays)
        print(
            json.dumps(
                {
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
