"""Sequence-encoding throughput: vectorized vs per-token loop.

The serialization hot path must not starve chips (SURVEY §7 hard part
#6); at H&M scale the history column is ~31M rows x 25 tokens. This
measures Feature.encode_sequence (flatten -> one vectorized/native
encode -> scatter) against the per-row/per-token dict-lookup oracle it
replaced (`Feature._encode_sequence_loop`).

    python benchmarks/bench_sequence_encode.py [--rows 1000000] [--len 25]
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from hm_retrieval_tpu.schema.features import (
    Feature,
    FeatureFamily,
    FeatureKind,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--len", type=int, dest="seq_len", default=25)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument(
        "--oracle-rows",
        type=int,
        default=100_000,
        help="rows for the (slow) loop oracle; scaled up to --rows",
    )
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    vocab = np.array([f"art_{i:07d}" for i in range(args.vocab)])
    f = Feature(
        "history",
        FeatureKind.SEQUENCE,
        FeatureFamily.QUERY,
        embedding_size=32,
        max_len=args.seq_len,
        vocab=vocab,
    )
    print("generating synthetic histories...", flush=True)
    ids = rng.integers(0, args.vocab, (args.rows, args.seq_len))
    values = [
        [f"art_{i:07d}" for i in row] for row in ids
    ]

    t0 = time.time()
    out = f.encode_sequence(values)
    dt_vec = time.time() - t0
    print(
        f"vectorized: {args.rows} rows x {args.seq_len} in "
        f"{dt_vec:.2f}s = {args.rows / dt_vec:,.0f} rows/s"
    )

    n_or = min(args.oracle_rows, args.rows)
    t0 = time.time()
    ref = f._encode_sequence_loop(values[:n_or])
    dt_loop = (time.time() - t0) * (args.rows / n_or)
    print(
        f"loop oracle (extrapolated from {n_or} rows): {dt_loop:.2f}s "
        f"= {args.rows / dt_loop:,.0f} rows/s"
    )
    np.testing.assert_array_equal(out[:n_or], ref)
    print(f"parity OK; speedup: {dt_loop / dt_vec:.1f}x")


if __name__ == "__main__":
    main()
