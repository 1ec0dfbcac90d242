"""Follow-up: map the (q_block, L) performance cliff for the
single-pass fused int8 path — explicit L instead of pick_bins.

Usage: timeout 2400 python benchmarks/tune_qblock2.py
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
    vmem_estimate,
    VMEM_BUDGET,
)

B, E, K = 1024, 128, 100


@jax.jit
def quantize_on_device(c):
    scales = jnp.max(jnp.abs(c), axis=1) / 127.0
    scales = jnp.where(scales > 0, scales, 1.0)
    codes = jnp.clip(
        jnp.rint(c / scales[:, None]), -127, 127
    ).astype(jnp.int8)
    return codes, scales.astype(jnp.float32)


# shared harness: full-output consumption keeps every query block live
# (a [0,0]-only consumer lets XLA DCE blocks 2..n of the blocked driver)
from timing_util import recall_vs, time_fn  # noqa: E402


def make_variant(k_over, rescore, q_block, L):
    def fn(q, arrays):
        c, codes, scales = arrays
        kk = k_over if rescore else K
        v, idx, _ = pallas_quantized_topk(
            q, codes, scales, kk, max_rounds=1, q_block=q_block, L=L
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

    cases = [
        # rescore (kk=200): small-block layouts (old default family)
        (True, 128, 1024),
        (True, 256, 512),
        (True, 256, 1024),
        (True, 512, 512),
        (True, 512, 768),
        # single-catalog-stream layouts (whole batch resident; the
        # threshold-free kernel's VMEM allows them)
        (True, 1024, 256),
        (True, 1024, 512),
        # no-rescore (kk=100)
        (False, 256, 1024),
        (False, 512, 1024),
        (False, 1024, 512),
    ]
    from hm_retrieval_tpu.ops.pallas_retrieval import (
        vmem_estimate_first,
    )

    for rescore, q_block, L in cases:
        kk = 2 * K if rescore else K
        if L < kk or vmem_estimate_first(q_block, E, L) > VMEM_BUDGET:
            continue
        fn = make_variant(kk, rescore, q_block, L)
        dt = time_fn(fn, q, arrays)
        _, got = jax.jit(fn)(q, arrays)
        print(
            json.dumps(
                {
                    "rescore": rescore,
                    "q_block": q_block,
                    "L": L,
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
