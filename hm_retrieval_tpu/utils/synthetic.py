"""Synthetic H&M-shaped data generation.

The build machine has no Kaggle dataset, so tests/benchmarks run on
synthetic data with the same shape as the H&M CSVs the reference consumes
(ref: pkg/etl/runner.py:9-33 expects transactions/articles/customers with
t_dat, customer_id, article_id, product_type_name, age, ...). Article
popularity is Zipf-distributed so logQ correction has something to correct
and popularity baselines are meaningful.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def generate_hm_like_csvs(
    dirpath: str,
    n_transactions: int = 50_000,
    n_customers: int = 2_000,
    n_articles: int = 1_000,
    n_days: int = 60,
    n_product_types: int = 20,
    seed: int = 0,
    preference_strength: float = 1.0,
) -> dict:
    """Writes transactions.csv / articles.csv / customers.csv; returns the
    filepaths plus the date covered range.

    Transactions have learnable structure: each customer has a latent
    affinity for a few product types, so a trained two-tower model can beat
    the popularity baseline.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(dirpath, exist_ok=True)

    articles = pd.DataFrame(
        {
            "article_id": [f"art_{i:06d}" for i in range(n_articles)],
            "product_type_name": [
                f"type_{i % n_product_types}" for i in range(n_articles)
            ],
            "colour_group_name": [
                f"colour_{i % 10}" for i in range(n_articles)
            ],
        }
    )
    customers = pd.DataFrame(
        {
            "customer_id": [f"cust_{i:07d}" for i in range(n_customers)],
            "age": rng.integers(16, 80, n_customers).astype(float),
        }
    )

    # Zipf article popularity.
    pop = 1.0 / np.arange(1, n_articles + 1) ** 1.1
    pop /= pop.sum()

    # Latent customer -> product-type preference (2 favourite types each).
    fav_types = rng.integers(
        0, n_product_types, size=(n_customers, 2)
    )
    art_type = np.arange(n_articles) % n_product_types

    cust_idx = rng.integers(0, n_customers, n_transactions)
    art_idx = rng.choice(n_articles, n_transactions, p=pop)
    # With probability tied to preference_strength, resample the article
    # from the customer's favourite types.
    prefer = rng.random(n_transactions) < (
        preference_strength / (1 + preference_strength)
    )
    for t in range(n_product_types):
        # articles of type t, with renormalized popularity
        arts_t = np.where(art_type == t)[0]
        p_t = pop[arts_t] / pop[arts_t].sum()
        rows = np.where(
            prefer
            & (
                (fav_types[cust_idx, 0] == t)
                | (fav_types[cust_idx, 1] == t)
            )
        )[0]
        if len(rows):
            art_idx[rows] = rng.choice(arts_t, len(rows), p=p_t)

    day = rng.integers(0, n_days, n_transactions)
    dates = (
        pd.Timestamp("2020-01-01") + pd.to_timedelta(day, unit="D")
    ).strftime("%Y-%m-%d")
    transactions = pd.DataFrame(
        {
            "t_dat": dates,
            "customer_id": customers["customer_id"].to_numpy()[cust_idx],
            "article_id": articles["article_id"].to_numpy()[art_idx],
        }
    ).sort_values("t_dat", kind="stable")

    paths = {
        "transactions": os.path.join(dirpath, "transactions.csv"),
        "articles": os.path.join(dirpath, "articles.csv"),
        "customers": os.path.join(dirpath, "customers.csv"),
    }
    transactions.to_csv(paths["transactions"], index=False)
    articles.to_csv(paths["articles"], index=False)
    customers.to_csv(paths["customers"], index=False)
    split_day = pd.Timestamp("2020-01-01") + pd.to_timedelta(
        int(n_days * 0.8), unit="D"
    )
    end_day = pd.Timestamp("2020-01-01") + pd.to_timedelta(
        n_days, unit="D"
    )
    paths.update(
        {
            "train_start": "2020-01-01",
            "train_end": (split_day - pd.Timedelta(days=1)).strftime(
                "%Y-%m-%d"
            ),
            "test_start": split_day.strftime("%Y-%m-%d"),
            "test_end": end_day.strftime("%Y-%m-%d"),
        }
    )
    return paths
