"""Fold-by-F tournament sweep at the 10M point (B=1024, E=128, k=100).

The single-pass kernel is VPU-select-cascade-bound (BASELINE.md
roofline); fold-by-F max-reduces F columns per bin before the top-2
cascade, cutting cascade ops/element ~F-fold for a ~k^2*F/(2N)
survivor-collision cost. This measures the real curve.

    timeout 3500 python benchmarks/tune_fold.py [--n N]
"""

import argparse
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

from timing_util import recall_vs, time_fn  # noqa: E402

from hm_retrieval_tpu.ops.pallas_retrieval import (  # noqa: E402
    pallas_exact_topk,
    pallas_quantized_topk,
    vmem_budget,
    vmem_estimate_first,
)

B, K = 1024, 100
E = int(os.environ.get("TUNE_E", "128"))


@jax.jit
def quantize_on_device(c):
    scales = jnp.max(jnp.abs(c), axis=1) / 127.0
    scales = jnp.where(scales > 0, scales, 1.0)
    codes = jnp.clip(
        jnp.rint(c / scales[:, None]), -127, 127
    ).astype(jnp.int8)
    return codes, scales.astype(jnp.float32)


def make_variant(k_over, rescore, q_block, L, fold):
    def fn(q, arrays):
        c, codes, scales = arrays
        kk = k_over if rescore else K
        v, idx, _ = pallas_quantized_topk(
            q, codes, scales, kk, max_rounds=1,
            q_block=q_block, L=L, fold=fold,
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10 * 1024 * 1024)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    N = args.n
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

    cases = [
        # (rescore, q_block, L, fold) — the measured frontier
        # (2026-08-21, BASELINE.md): deeper folds win while the
        # F*L-wide score tile fits VMEM; recall tracks L, not fold.
        (True, 1024, 512, 1),
        (True, 1024, 512, 2),
        (True, 512, 512, 8),
        (True, 256, 512, 16),   # auto default: 23.5ms @ 0.9903
        (True, 256, 768, 8),
        (False, 1024, 512, 1),
        (False, 512, 512, 8),
        (False, 256, 512, 16),  # auto default: 19.4ms @ 0.9826
    ]
    budget = vmem_budget()
    for rescore, q_block, L, fold in cases:
        kk = 2 * K if rescore else K
        if L < kk or vmem_estimate_first(q_block, E, L, fold) > budget:
            print(
                json.dumps(
                    {"skip": [rescore, q_block, L, fold]}
                ),
                flush=True,
            )
            continue
        fn = make_variant(kk, rescore, q_block, L, fold)
        dt = time_fn(fn, q, arrays, iters=args.iters)
        _, got = jax.jit(fn)(q, arrays)
        print(
            json.dumps(
                {
                    "rescore": rescore,
                    "q_block": q_block,
                    "L": L,
                    "fold": fold,
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
