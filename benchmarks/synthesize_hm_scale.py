"""Synthesize a full-scale H&M-shaped dataset ON DISK.

The Kaggle CSVs are absent in this environment (BASELINE.md standing
blockers), so the five-stage product is exercised at the reference's
own scale (ref: README.md:63-66 — ~31M transactions, 1.37M customers,
105k articles) on synthesized data with the same file names, column
sets, dtypes, and the learnable structure the recall trajectory needs:

- Zipf article popularity (logQ correction has something to correct,
  popularity baseline is meaningful);
- per-customer latent product-type preferences (a trained two-tower
  model can beat popularity);
- Zipf customer activity (realistic purchase-history length skew).

Usage:
    python benchmarks/synthesize_hm_scale.py --out /path/dir \
        [--transactions 31000000] [--customers 1371980] \
        [--articles 105542]

Writes transactions_train.csv / articles.csv / customers.csv exactly as
`examples/run_hm.py --data-dir <dir>` expects (ref: pkg/etl/runner.py:9-33),
with t_dat spanning the reference config's 2019-09-20..2020-09-21 window
(ref: main.py:11-30). Transactions are written in chunks so peak memory
stays O(chunk); the full draw arrays are O(n_transactions) int32/int64.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import pandas as pd

START = pd.Timestamp("2019-09-20")
END = pd.Timestamp("2020-09-21")

N_PRODUCT_TYPES = 131
N_PRODUCT_GROUPS = 19
N_COLOURS = 50
N_DEPARTMENTS = 250


def _hex_ids(rng: np.random.Generator, n: int) -> np.ndarray:
    """n 64-char hex customer ids (the H&M customer_id format)."""
    words = rng.integers(0, 1 << 62, size=(n, 4), dtype=np.int64)
    return np.array(
        [
            f"{a:016x}{b:016x}{c:016x}{d:016x}"
            for a, b, c, d in words
        ],
        dtype=object,
    )


def _zipf_probs(n: int, s: float) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    return p / p.sum()


def synthesize(
    out_dir: str,
    n_transactions: int,
    n_customers: int,
    n_articles: int,
    seed: int = 0,
    preference_rate: float = 0.6,
    chunk_rows: int = 4_000_000,
) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    t_start = time.time()

    # --- articles.csv ---
    art_ids = np.unique(
        rng.integers(
            100_000_000, 1_000_000_000, 2 * n_articles, dtype=np.int64
        )
    )
    art_ids = rng.permutation(art_ids)[:n_articles]
    assert len(art_ids) == n_articles
    art_type = rng.integers(0, N_PRODUCT_TYPES, n_articles)
    # product group is a deterministic coarsening of type (like H&M's
    # Garment Upper body <- T-shirt/Sweater/...)
    type_group = rng.integers(0, N_PRODUCT_GROUPS, N_PRODUCT_TYPES)
    articles = pd.DataFrame(
        {
            "article_id": art_ids,
            "product_type_name": [
                f"Product type {t}" for t in art_type
            ],
            "product_group_name": [
                f"Garment group {g}" for g in type_group[art_type]
            ],
            "colour_group_name": [
                f"Colour {c}"
                for c in rng.integers(0, N_COLOURS, n_articles)
            ],
            "department_name": [
                f"Department {d}"
                for d in rng.integers(0, N_DEPARTMENTS, n_articles)
            ],
        }
    )
    articles.to_csv(os.path.join(out_dir, "articles.csv"), index=False)
    print(
        f"articles.csv: {n_articles} rows "
        f"({time.time() - t_start:.0f}s)",
        flush=True,
    )

    # --- customers.csv ---
    cust_ids = _hex_ids(rng, n_customers)
    age = rng.integers(16, 100, n_customers).astype(np.float64)
    age[rng.random(n_customers) < 0.01] = np.nan  # H&M has missing ages
    fn = np.where(rng.random(n_customers) < 0.35, 1.0, np.nan)
    customers = pd.DataFrame(
        {"customer_id": cust_ids, "FN": fn, "age": age}
    )
    customers.to_csv(
        os.path.join(out_dir, "customers.csv"), index=False
    )
    print(
        f"customers.csv: {n_customers} rows "
        f"({time.time() - t_start:.0f}s)",
        flush=True,
    )

    # --- transactions_train.csv ---
    # Zipf customer activity + Zipf article popularity, with
    # preference_rate of purchases resampled from the customer's two
    # favourite product types (popularity-renormalized within type).
    cust_p = _zipf_probs(n_customers, 0.7)
    art_p = _zipf_probs(n_articles, 1.05)
    fav = rng.integers(0, N_PRODUCT_TYPES, size=(n_customers, 2))

    cust_idx = rng.choice(n_customers, n_transactions, p=cust_p)
    art_idx = rng.choice(n_articles, n_transactions, p=art_p)
    prefer = rng.random(n_transactions) < preference_rate
    fav_pick = rng.integers(0, 2, n_transactions)
    target_type = fav[cust_idx, fav_pick]
    # vectorized within-type resample: articles sorted by type once,
    # then an inverse-CDF draw inside the chosen type's slice
    order = np.argsort(art_type, kind="stable")
    type_of_sorted = art_type[order]
    bounds = np.searchsorted(
        type_of_sorted, np.arange(N_PRODUCT_TYPES + 1)
    )
    p_sorted = art_p[order]
    cum = np.concatenate(([0.0], np.cumsum(p_sorted)))
    rows = np.where(prefer)[0]
    lo, hi = bounds[target_type[rows]], bounds[target_type[rows] + 1]
    u = cum[lo] + rng.random(len(rows)) * (cum[hi] - cum[lo])
    pick_sorted = np.clip(
        np.searchsorted(cum, u, side="right") - 1, lo, hi - 1
    )
    art_idx[rows] = order[pick_sorted]

    n_days = (END - START).days + 1
    day = rng.integers(0, n_days, n_transactions)
    price = np.round(
        np.exp(rng.normal(-3.6, 0.7, n_transactions)), 6
    )
    channel = rng.integers(1, 3, n_transactions)

    date_strs = (
        (START + pd.to_timedelta(np.arange(n_days), unit="D"))
        .strftime("%Y-%m-%d")
        .to_numpy()
    )
    tx_path = os.path.join(out_dir, "transactions_train.csv")
    with open(tx_path, "w") as f:
        f.write("t_dat,customer_id,article_id,price,sales_channel_id\n")
    for lo_r in range(0, n_transactions, chunk_rows):
        hi_r = min(lo_r + chunk_rows, n_transactions)
        sl = slice(lo_r, hi_r)
        pd.DataFrame(
            {
                "t_dat": date_strs[day[sl]],
                "customer_id": cust_ids[cust_idx[sl]],
                "article_id": art_ids[art_idx[sl]],
                "price": price[sl],
                "sales_channel_id": channel[sl],
            }
        ).to_csv(tx_path, mode="a", header=False, index=False)
        print(
            f"transactions_train.csv: {hi_r}/{n_transactions} rows "
            f"({time.time() - t_start:.0f}s)",
            flush=True,
        )
    sizes = {
        f: os.path.getsize(os.path.join(out_dir, f)) / 1e9
        for f in (
            "transactions_train.csv",
            "articles.csv",
            "customers.csv",
        )
    }
    print(
        f"done in {time.time() - t_start:.0f}s; GB on disk: "
        + ", ".join(f"{k}={v:.2f}" for k, v in sizes.items()),
        flush=True,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--transactions", type=int, default=31_000_000)
    ap.add_argument("--customers", type=int, default=1_371_980)
    ap.add_argument("--articles", type=int, default=105_542)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    synthesize(
        args.out,
        args.transactions,
        args.customers,
        args.articles,
        seed=args.seed,
    )


if __name__ == "__main__":
    sys.exit(main())
