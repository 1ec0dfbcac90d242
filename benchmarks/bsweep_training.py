"""Single-chip training saturation B-sweep (verdict r4 #6): where does
the sparse-Adagrad step stop scaling with batch size, and what is the
single-chip saturation throughput multi-chip DP projections stand on?

Sweeps B in {512, 2048, 8192} at two scales:
- H&M scale (1.37M x 128 customer + 105k x 128 article tables, hidden
  256 — the reference architecture, ref: main.py:32-111, B=512 at
  main.py:98);
- config[2] single-chip slice (5M users / 2M articles, E=64 — the
  largest {table + accumulator} pair that double-buffers in 16GB HBM,
  BASELINE.md "config[2] single-chip slice").

Reuses bench.py's hardened harness: 600-step on-device scans, 3
repeats on distinct device data, median + spread.

Usage: timeout 3600 python benchmarks/bsweep_training.py
"""

import json
import sys

sys.path.insert(0, ".")

from bench import BSWEEP_BATCHES, bench_training  # noqa: E402

SCALES = {
    "hm": dict(n_customers=1_371_980, n_articles=105_542, emb_dim=128),
    "config2": dict(n_customers=5_000_000, n_articles=2_000_000,
                    emb_dim=64),
}


def main():
    results = {}
    for scale, kw in SCALES.items():
        base = None
        for B in BSWEEP_BATCHES:
            r = bench_training(600, B, sparse=True, **kw)
            eps = r["train_examples_per_s_per_chip"]
            if base is None:
                base = (B, eps)
            lin = eps / (base[1] * B / base[0])
            row = {
                "step_ms": r["train_step_ms"],
                "examples_per_s": eps,
                "spread": r["train_examples_per_s_spread"],
                "vs_linear_from_b512": lin,
            }
            results[f"{scale}_B{B}"] = row
            print(
                f"{scale:8s} B={B:5d}: {r['train_step_ms']:7.3f} "
                f"ms/step  {eps:12,.0f} ex/s  "
                f"({lin * 100:5.1f}% of linear-from-B=512)",
                flush=True,
            )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
