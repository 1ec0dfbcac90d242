"""ETL primitives: date filtering + dataframe IO.

Analog of the reference transformations (ref: pkg/etl/transformations.py).
Adds parquet support (the rebuild's processed-data format, SURVEY §7) on top
of CSV.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

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
