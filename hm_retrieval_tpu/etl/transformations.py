"""ETL primitives: date filtering + dataframe IO.

Analog of the reference transformations (ref: pkg/etl/transformations.py).
Adds parquet support (the rebuild's processed-data format, SURVEY §7) on top
of CSV.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


def date_filter(
    df: pd.DataFrame,
    date_column: str,
    start_date: str,
    end_date: str,
) -> pd.DataFrame:
    """Rows with start_date <= df[date_column] <= end_date, inclusive on
    both ends (ref: pkg/etl/transformations.py:9-41; boundary semantics
    verified by tests/test_transformations.py:22-36 in the reference)."""
    mask = (df[date_column] >= start_date) & (df[date_column] <= end_date)
    return df[mask]


def load_dataframe(
    filepath: str,
    columns: Optional[Sequence[str]] = None,
    dtype=None,
) -> pd.DataFrame:
    """CSV or parquet by extension (ref: transformations.py:44-64)."""
    logger.info("Loading dataframe from %s", filepath)
    if filepath.endswith(".parquet"):
        df = pd.read_parquet(filepath, columns=list(columns) if columns else None)
    else:
        df = pd.read_csv(filepath, usecols=columns, dtype=dtype)
    logger.info("Loaded %d rows from %s", len(df), filepath)
    return df


def add_history_column(
    df: pd.DataFrame,
    user_col: str,
    item_col: str,
    out_col: str,
    max_len: int,
    date_col: Optional[str] = None,
) -> pd.DataFrame:
    """Per row: the user's previous ``max_len`` item ids, oldest..newest,
    EXCLUDING the current row (no label leakage). Feeds the sequence-aware
    query tower (BASELINE config[3]); no reference analog.

    Rows are ordered by ``date_col`` (stable) within each user; the output
    column holds python lists (parquet-serializable).
    """
    work = df
    if date_col is not None:
        work = df.sort_values(date_col, kind="stable")
    histories = np.empty(len(df), dtype=object)
    pos = {c: i for i, c in enumerate(df.index)}
    for _, group in work.groupby(user_col, sort=False):
        items = group[item_col].astype(str).tolist()
        idxs = group.index
        for i, row_idx in enumerate(idxs):
            lo = max(0, i - max_len)
            histories[pos[row_idx]] = items[lo:i]
    out = df.copy()
    out[out_col] = histories
    return out


def save_dataframe(
    df: pd.DataFrame,
    filepath: str,
    date_column: Optional[str] = None,
) -> None:
    """mkdir + write + log the covered date range
    (ref: transformations.py:67-95)."""
    os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
    if date_column is not None and len(df):
        logger.info(
            "Saving %d rows covering %s..%s to %s",
            len(df),
            df[date_column].min(),
            df[date_column].max(),
            filepath,
        )
    if filepath.endswith(".parquet"):
        df.to_parquet(filepath, index=False)
    else:
        df.to_csv(filepath, index=False)
