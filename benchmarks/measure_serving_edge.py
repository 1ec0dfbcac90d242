"""Serving host-edge latency (verdict r4 #8): RetrievalService.query
end-to-end — host string->id encode, device retrieval, id->string
decode — on a 1M-item catalog, B in {1, 16, 128}.

The reference's deployment story is TF-Serving with on-graph string
lookup (ref: README.md:101-105, brute_force.py:108-114); this rebuild
moves the string edge to the host (serving/service.py). This benchmark
prices that edge next to the device-only latencies in BASELINE.md.

Through the relay tunnel every retrieve() pays a fixed ~25ms dispatch
round trip that attached hardware does not; the per-phase numbers
(encode / device / decode) are measured separately so the deployment-
relevant edge cost stands on its own, and the measured null round trip
is printed for the wall-clock rows.

Usage: timeout 1800 python benchmarks/measure_serving_edge.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from hm_retrieval_tpu.indices.quantized import QuantizedIndex
from hm_retrieval_tpu.models.tower import init_tower_params
from hm_retrieval_tpu.schema import (
    Feature,
    FeatureFamily,
    FeatureKind,
)

N = 1_048_576
E = 128
K = 100
N_CUSTOMERS = 200_000  # vocab entries on the query edge


def main():
    rng = np.random.default_rng(0)
    t0 = time.time()
    cust_vocab = np.array(
        [f"{w:032x}" for w in rng.integers(0, 1 << 62, N_CUSTOMERS)]
    )
    art_vocab = np.array([f"{100_000_000 + i}" for i in range(N)])
    print(
        f"vocabs built ({time.time() - t0:.1f}s)", flush=True
    )

    features = [
        Feature(
            "customer_id",
            FeatureKind.CATEGORICAL,
            FeatureFamily.QUERY,
            embedding_size=E,
            vocab=cust_vocab,
        ),
        Feature(
            "age",
            FeatureKind.NUMERIC,
            FeatureFamily.QUERY,
        ),
    ]
    article = Feature(
        "article_id",
        FeatureKind.CATEGORICAL,
        FeatureFamily.CANDIDATE,
        embedding_size=E,
        vocab=art_vocab,
    )

    params = init_tower_params(
        jax.random.PRNGKey(0), features, E, hidden_units=[256]
    )
    # synthesize the catalog ON DEVICE (uploading 512MB fp32 through
    # the relay tunnel at ~10-20 MB/s would take half an hour) and use
    # the product's device-resident construction path
    emb = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(7), (N, E), jnp.float32
        )
    )()
    jax.block_until_ready(emb)
    ids = np.arange(1, N + 1, dtype=np.int32)
    t0 = time.time()
    index = QuantizedIndex(K, ids, emb, oversample=2, rescore=True)
    # force placement now so setup is not billed to the first query
    jax.block_until_ready(index.codes)
    print(
        f"1M quantized index built on device "
        f"({time.time() - t0:.1f}s)",
        flush=True,
    )

    from hm_retrieval_tpu.models.tower import tower_forward

    embed = jax.jit(
        lambda p, b: tower_forward(p, features, b)
    )

    # null roundtrip for context (bench.py's canonical measurement)
    from bench import measure_null_roundtrip

    null_rt = measure_null_roundtrip() * 1e3
    print(f"null dispatch+fetch roundtrip: {null_rt:.1f} ms", flush=True)

    for B in (1, 16, 128):
        raw = {
            "customer_id": list(
                cust_vocab[rng.integers(0, N_CUSTOMERS, B)]
            ),
            "age": list(rng.uniform(18, 80, B)),
        }
        # --- phase: host encode ---
        reps = 200 if B <= 16 else 50
        # mimic service.encode_query
        def encode():
            return {
                "customer_id": features[0].encode(
                    np.asarray(raw["customer_id"])
                ),
                "age": features[1].transform_numeric(
                    np.asarray(raw["age"], np.float32)
                ),
            }

        encode()
        t0 = time.time()
        for _ in range(reps):
            batch = encode()
        enc_ms = (time.time() - t0) / reps * 1e3

        # --- phase: device retrieval (dispatch incl. tunnel) ---
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        q = embed(params, jb)
        _, int_ids = index.topk_from_embeddings(q)
        int_ids = np.asarray(int_ids)  # warm + sync
        t0 = time.time()
        for _ in range(20):
            q = embed(params, jb)
            _, ii = index.topk_from_embeddings(q)
            ii_host = np.asarray(ii)
        dev_ms = (time.time() - t0) / 20 * 1e3

        # --- phase: host decode ---
        t0 = time.time()
        for _ in range(reps):
            decoded = article.decode(ii_host)
        dec_ms = (time.time() - t0) / reps * 1e3

        # --- full end-to-end (encode + dispatch + fetch + decode) ---
        t0 = time.time()
        for _ in range(20):
            b2 = encode()
            jb2 = {k: jnp.asarray(v) for k, v in b2.items()}
            qq = embed(params, jb2)
            _, ii2 = index.topk_from_embeddings(qq)
            rows = article.decode(np.asarray(ii2))
            out = [list(r) for r in rows]
        e2e_ms = (time.time() - t0) / 20 * 1e3
        assert len(out) == B and len(out[0]) == K

        print(
            f"B={B:4d}: encode {enc_ms:7.3f} ms | device+tunnel "
            f"{dev_ms:7.2f} ms | decode {dec_ms:7.3f} ms | "
            f"e2e {e2e_ms:7.2f} ms "
            f"({e2e_ms / B:7.3f} ms/query)",
            flush=True,
        )


if __name__ == "__main__":
    main()
