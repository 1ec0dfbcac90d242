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
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            filepath, columns=list(columns) if columns else None
        )
        # drop the pandas schema metadata: it describes ALL stored
        # columns, and to_pandas re-parses dtype strings like
        # 'large_list<...>[pyarrow]' (unparseable) even for columns
        # excluded from this read; the types_mapper below supplies
        # everything the list columns need
        tbl = tbl.replace_schema_metadata(None)
        # keep list columns (purchase histories) arrow-backed instead
        # of exploding them into per-row python lists — the shard
        # writer's vectorized sequence encoder consumes the arrow
        # buffers directly; everything else converts as usual
        df = tbl.to_pandas(
            types_mapper=lambda t: (
                pd.ArrowDtype(t)
                if pa.types.is_list(t) or pa.types.is_large_list(t)
                else None
            )
        )
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

    Rows are ordered by ``date_col`` (stable) within each user.

    Fully vectorized (no per-row Python): one stable lexsort groups each
    user's rows in date order, cumulative group positions give every
    row's window into the sorted item sequence, and the windows gather
    into ONE flat index vector emitted directly in original row order.
    The output column is an arrow ``large_list<dictionary<string>>`` —
    item strings are stored once in the dictionary, so 31M rows cost
    O(rows * window) int32, not ~400M python strings (measured ~6x the
    per-row loop at 1M rows with the gap growing superlinearly — the
    loop's per-row dict/group bookkeeping is O(python objects) while
    this stays in numpy/arrow C; the loop survives as
    ``_add_history_column_rows``, the equivalence-test oracle)."""
    n = len(df)
    if n == 0:
        out = df.copy()
        out[out_col] = np.empty(0, dtype=object)
        return out
    user_codes, _ = pd.factorize(df[user_col], use_na_sentinel=False)
    item_codes, item_uniques = pd.factorize(
        df[item_col], use_na_sentinel=False
    )
    if date_col is not None:
        # few distinct dates -> cheap sortable int codes
        date_codes, date_uniques = pd.factorize(
            df[date_col], sort=True
        )
        # factorize marks missing dates -1, which would lexsort FIRST;
        # sort_values puts NaN last (na_position default), so remap to
        # a code above every real date to match the row-loop oracle
        date_codes = np.where(
            date_codes < 0, len(date_uniques), date_codes
        )
    else:
        date_codes = np.zeros(n, np.int64)
    state = build_history_state(
        user_codes, date_codes, item_codes, max_len
    )
    offsets, flat = history_flat_range(state, 0, n)
    list_arr = history_arrow_column(
        offsets, flat, np.asarray(item_uniques)
    )
    out = df.copy()
    out[out_col] = pd.Series(
        pd.arrays.ArrowExtensionArray(list_arr), index=df.index
    )
    return out


def build_history_state(
    user_codes: np.ndarray,
    date_codes: np.ndarray,
    item_codes: np.ndarray,
    max_len: int,
) -> dict:
    """Vectorized history-window core over pre-coded arrays (the
    chunked ETL path feeds this with globally-consistent codes built
    incrementally across CSV chunks). One stable lexsort groups each
    user's rows in date order; cumulative group positions give every
    row's window into the sorted item sequence. O(N) ints, no
    strings."""
    n = len(user_codes)
    # stable: primary user, secondary date, ties keep original order —
    # within each user this is exactly sort_values(date, stable) +
    # groupby(user) encounter order
    perm = np.lexsort((date_codes, user_codes))
    inv_perm = np.empty(n, np.int64)
    inv_perm[perm] = np.arange(n)

    user_sorted = user_codes[perm]
    items_sorted = np.asarray(item_codes, np.int64)[perm]
    idx = np.arange(n, dtype=np.int64)
    starts = np.empty(n, bool)
    starts[0] = True
    np.not_equal(user_sorted[1:], user_sorted[:-1], out=starts[1:])
    group_start = np.maximum.accumulate(np.where(starts, idx, 0))
    lens_sorted = np.minimum(idx - group_start, max_len).astype(
        np.int64
    )
    return {
        "inv_perm": inv_perm,
        "items_sorted": items_sorted,
        "lens": lens_sorted[inv_perm],  # original row order
    }


def history_flat_range(state: dict, lo: int, hi: int):
    """Flat window item-codes for original rows [lo, hi): returns
    (offsets (hi-lo+1,) int64 starting at 0, flat int32). Emits
    windows directly in ORIGINAL row order: original row r sits at
    sorted position inv_perm[r], whose window is
    items_sorted[sp-L .. sp-1]. Per-range cost is O(rows*window) — the
    chunked writer attaches histories one chunk at a time without ever
    materializing the global flat vector."""
    inv_perm = state["inv_perm"]
    items_sorted = state["items_sorted"]
    lens = state["lens"][lo:hi]
    m = hi - lo
    offsets = np.zeros(m + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    total = int(offsets[-1])
    row = np.repeat(np.arange(m, dtype=np.int64), lens)
    j = np.arange(total, dtype=np.int64) - offsets[:-1][row]
    src = inv_perm[lo + row] - lens[row] + j
    flat = items_sorted[src].astype(np.int32)
    return offsets, flat


def history_arrow_column(
    offsets: np.ndarray, flat: np.ndarray, item_uniques: np.ndarray
):
    """``large_list<dictionary<string>>`` arrow array from flat window
    codes — item strings stored once in the dictionary, so N rows cost
    O(N * window) int32, not O(N * window) python strings."""
    import pyarrow as pa

    tokens = pa.array(
        np.asarray(item_uniques).astype(str), type=pa.string()
    )
    return pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()),
        pa.DictionaryArray.from_arrays(
            pa.array(flat, type=pa.int32()), tokens
        ),
    )


def _add_history_column_rows(
    df: pd.DataFrame,
    user_col: str,
    item_col: str,
    out_col: str,
    max_len: int,
    date_col: Optional[str] = None,
) -> pd.DataFrame:
    """Reference per-row implementation of ``add_history_column`` —
    O(rows) python, kept only as the equivalence oracle for tests."""
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
