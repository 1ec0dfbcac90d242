"""ETL + schema-building pipeline stages.

Analog of the reference runners (ref: pkg/etl/runner.py:9-84):

- ``etl_runner``: load transactions/articles/customers, inner-join articles
  on article_id then customers on customer_id (ref: runner.py:31-33),
  date-split into train/test, save.
- ``build_schema_runner``: build categorical vocabs from the TRAIN split
  only (ref: runner.py:71-73), compute the candidate sampling-probability
  table for logQ from train frequencies (ref: runner.py:75-78), persist the
  schema artifact (JSON+npz instead of pickle).
"""

from __future__ import annotations

import logging
import os

import numpy as np
import pandas as pd

from hm_retrieval_tpu.etl.transformations import (
    add_history_column,
    date_filter,
    load_dataframe,
    save_dataframe,
)
from hm_retrieval_tpu.schema.schema import Schema
from hm_retrieval_tpu.utils.settings import Settings

logger = logging.getLogger(__name__)


def etl_runner(settings: Settings) -> None:
    """Join raw CSVs and produce train/test splits
    (ref: pkg/etl/runner.py:9-51). With ``settings.etl_chunk_rows``
    set, the transactions CSV streams through the join in chunks —
    identical outputs (tests assert frame equality incl. histories),
    peak memory O(chunk + N ints) instead of O(N columns)."""
    if settings.etl_chunk_rows:
        return _etl_runner_chunked(settings)
    transactions = load_dataframe(settings.transactions_filepath)
    articles = load_dataframe(settings.articles_filepath)
    customers = load_dataframe(settings.customers_filepath)

    merged = transactions.merge(
        articles, on=settings.article_id_column, how="inner"
    ).merge(customers, on=settings.customer_id_column, how="inner")
    logger.info("Merged frame has %d rows", len(merged))

    if settings.history_max_len:
        logger.info(
            "Adding %s (last %d items)",
            settings.history_column,
            settings.history_max_len,
        )
        merged = add_history_column(
            merged,
            settings.customer_id_column,
            settings.article_id_column,
            settings.history_column,
            settings.history_max_len,
            date_col=settings.date_column,
        )

    train = date_filter(
        merged,
        settings.date_column,
        settings.train_start_date,
        settings.train_end_date,
    )
    test = date_filter(
        merged,
        settings.date_column,
        settings.test_start_date,
        settings.test_end_date,
    )
    save_dataframe(
        train, settings.train_data_filepath, settings.date_column
    )
    save_dataframe(test, settings.test_data_filepath, settings.date_column)


def _grow_codes(values, index, dropna: bool = False):
    """Incremental factorize: integer codes for ``values`` against a
    growing global unique-Index (first-appearance order, matching
    ``pd.factorize`` run over the concatenated whole). ``dropna``
    leaves missing values coded -1 (factorize's default sentinel) for
    the caller to remap."""
    vals = np.asarray(values)
    na = pd.isna(vals) if dropna else None
    if index is None:
        index = pd.Index([], dtype=object)
    codes = index.get_indexer(vals)  # -1 = unseen (or NaN)
    fresh = codes < 0
    if dropna:
        fresh &= ~na
    if fresh.any():
        # assign fresh codes directly (old_len + position among the
        # chunk's new uniques) instead of re-probing the whole chunk
        # against the grown index — halves the dominant hashing cost
        new = pd.unique(vals[fresh])
        new_index = pd.Index(new)
        codes[fresh] = len(index) + new_index.get_indexer(
            vals[fresh]
        )
        index = index.append(new_index)
    if dropna:
        codes = np.where(na, -1, codes)
    return codes.astype(np.int64), index


def _etl_runner_chunked(settings: Settings) -> None:
    """Streaming variant of ``etl_runner``: transactions flow through
    the join ``etl_chunk_rows`` at a time; per-chunk frames append to
    the train/test parquet via ParquetWriter; the history windows come
    from globally-coded O(N)-int arrays (build_history_state) with the
    flat item vector materialized one chunk at a time. Removes the
    in-memory triple join's RAM ceiling (~5x reference scale on this
    host, BASELINE.md) while producing byte-equivalent loaded frames
    (asserted in tests/test_etl.py)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hm_retrieval_tpu.etl.transformations import (
        build_history_state,
        history_arrow_column,
        history_flat_range,
    )

    articles = load_dataframe(settings.articles_filepath)
    customers = load_dataframe(settings.customers_filepath)
    hist = settings.history_max_len
    date_col = settings.date_column
    tmp_dir = os.path.join(
        os.path.dirname(settings.train_data_filepath) or ".",
        "_etl_chunks",
    )
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)

    # Dtype pre-pass: per-chunk read_csv inference DIVERGES from the
    # whole-file inference of the in-memory path (a column whose first
    # chunk parses int64 but later holds a string becomes int64-then-
    # object across chunks — breaking the join/writer and the
    # identical-outputs contract). One cheap scan promotes every
    # column to the global dtype (any object chunk -> read as str,
    # matching whole-file mixed-token behavior; numeric chunks promote
    # via np.promote_types), then the real pass reads with explicit
    # dtypes.
    global_dtypes: dict = {}
    for chunk in pd.read_csv(
        settings.transactions_filepath,
        chunksize=settings.etl_chunk_rows,
    ):
        for col, dt in chunk.dtypes.items():
            prev = global_dtypes.get(col)
            if prev is None:
                global_dtypes[col] = dt
            elif prev != dt:
                if prev == object or dt == object:
                    global_dtypes[col] = np.dtype(object)
                else:
                    global_dtypes[col] = np.promote_types(prev, dt)
    read_dtypes = {
        col: (str if dt == object else dt)
        for col, dt in global_dtypes.items()
    }

    user_index = item_index = date_index = None
    user_parts, item_parts, date_parts = [], [], []
    chunk_files = []
    template = None
    total = 0
    for i, chunk in enumerate(
        pd.read_csv(
            settings.transactions_filepath,
            chunksize=settings.etl_chunk_rows,
            dtype=read_dtypes,
        )
    ):
        merged = chunk.merge(
            articles, on=settings.article_id_column, how="inner"
        ).merge(
            customers, on=settings.customer_id_column, how="inner"
        )
        if hist:
            codes, user_index = _grow_codes(
                merged[settings.customer_id_column], user_index
            )
            user_parts.append(codes)
            codes, item_index = _grow_codes(
                merged[settings.article_id_column], item_index
            )
            item_parts.append(codes)
            codes, date_index = _grow_codes(
                merged[date_col], date_index, dropna=True
            )
            date_parts.append(codes)
        path = os.path.join(tmp_dir, f"chunk_{i:05d}.parquet")
        merged.to_parquet(path, index=False)
        chunk_files.append((path, len(merged)))
        total += len(merged)
    logger.info(
        "Merged frame has %d rows (%d chunks)",
        total,
        len(chunk_files),
    )

    state = item_uniques = None
    if hist and total:
        # factorize(sort=True) semantics for dates: codes rank the
        # RAW unique values in sorted order, missing values above all
        # real ones (sort_values na_position='last')
        uniques = date_index.to_numpy() if date_index is not None \
            else np.empty(0, object)
        rank = np.empty(len(uniques), np.int64)
        rank[np.argsort(uniques)] = np.arange(len(uniques))
        raw = np.concatenate(date_parts)
        # guard the all-dates-missing case: rank is empty and raw is
        # all -1, so index through a clipped copy before masking
        safe = np.where(raw < 0, 0, raw)
        coded = (
            rank[safe] if len(rank) else np.zeros_like(raw)
        )
        date_codes = np.where(raw < 0, len(uniques), coded)
        state = build_history_state(
            np.concatenate(user_parts),
            date_codes,
            np.concatenate(item_parts),
            hist,
        )
        item_uniques = item_index.to_numpy()
        del user_parts, item_parts, date_parts, raw, date_codes

    splits = {
        "train": (
            settings.train_data_filepath,
            settings.train_start_date,
            settings.train_end_date,
        ),
        "test": (
            settings.test_data_filepath,
            settings.test_start_date,
            settings.test_end_date,
        ),
    }
    writers = {name: None for name in splits}
    counts = {name: 0 for name in splits}
    lo = 0
    for path, m in chunk_files:
        df = pd.read_parquet(path)
        template = df.head(0) if template is None else template
        if hist and m:
            offsets, flat = history_flat_range(state, lo, lo + m)
            arr = history_arrow_column(offsets, flat, item_uniques)
            df[settings.history_column] = pd.Series(
                pd.arrays.ArrowExtensionArray(arr), index=df.index
            )
        lo += m
        if len(template) == 0 and hist and m:
            # template keeps the full output schema incl. history
            template = df.head(0)
        for name, (out_path, start, end) in splits.items():
            part = date_filter(df, date_col, start, end)
            if not len(part):
                continue
            tbl = pa.Table.from_pandas(part, preserve_index=False)
            if writers[name] is None:
                os.makedirs(
                    os.path.dirname(out_path) or ".", exist_ok=True
                )
                writers[name] = pq.ParquetWriter(
                    out_path, tbl.schema
                )
            elif tbl.schema != writers[name].schema:
                tbl = tbl.cast(writers[name].schema)
            writers[name].write_table(tbl)
            counts[name] += len(part)
    if template is None:
        # zero chunks (empty transactions CSV): synthesize the output
        # schema from the headers so empty parquets stay loadable
        header = pd.read_csv(
            settings.transactions_filepath, nrows=0
        )
        template = header.merge(
            articles.head(0), on=settings.article_id_column
        ).merge(customers.head(0), on=settings.customer_id_column)
        if hist:
            template[settings.history_column] = np.empty(
                0, dtype=object
            )
    for name, (out_path, start, end) in splits.items():
        if writers[name] is not None:
            writers[name].close()
        else:
            # split got no rows: write an empty parquet WITH the full
            # column schema (the in-memory path does; a schema-less
            # file breaks column-selecting readers downstream)
            os.makedirs(
                os.path.dirname(out_path) or ".", exist_ok=True
            )
            pq.write_table(
                pa.Table.from_pandas(
                    template, preserve_index=False
                ),
                out_path,
            )
        logger.info(
            "Saved %d rows covering %s..%s to %s",
            counts[name],
            start,
            end,
            out_path,
        )
    shutil.rmtree(tmp_dir, ignore_errors=True)


class _StreamCounts:
    """Incremental value_counts: first-appearance-ordered uniques plus
    int counts, so the final stable descending sort reproduces
    ``Series.value_counts`` exactly — INCLUDING the tie order among
    equal counts (first appearance), which fixes the encode ids."""

    def __init__(self):
        self.index = None
        self.counts = np.zeros(0, np.int64)

    def update(self, values: np.ndarray) -> None:
        codes, index = _grow_codes(values, self.index)
        if len(index) != len(self.counts):
            grown = np.zeros(len(index), np.int64)
            grown[: len(self.counts)] = self.counts
            self.counts = grown
        self.index = index
        self.counts += np.bincount(
            codes, minlength=len(self.counts)
        )

    def value_counts(self) -> pd.Series:
        order = np.argsort(-self.counts, kind="stable")
        return pd.Series(
            self.counts[order],
            index=np.asarray(self.index)[order],
        )


def _build_schema_runner_streaming(
    settings: Settings, schema: Schema
) -> None:
    """Streaming vocab/stats/logQ build: one pass over the train
    parquet in ``schema_stream_rows`` batches, holding only count
    tables (O(uniques)) — never the split. Sequence columns with
    shared vocabs are not even read. Identical resulting schema
    artifact (vocab order incl. ties, logQ) — asserted in
    tests/test_etl.py."""
    from hm_retrieval_tpu.data.runner import iter_parquet_batches
    from hm_retrieval_tpu.schema.features import FeatureKind

    cat = [
        f
        for f in schema.features
        if f.kind == FeatureKind.CATEGORICAL and not f.has_vocab
    ]
    seq = [
        f
        for f in schema.features
        if f.kind == FeatureKind.SEQUENCE
        and not f.has_vocab
        and not f.shared_vocab_with
    ]
    num = [
        f
        for f in schema.features
        if f.kind == FeatureKind.NUMERIC and f.standardize
    ]
    need_logq = schema.training_config.use_logq_correction
    cols = {f.name for f in cat + seq + num}
    if need_logq:
        cols.add(schema.candidate_id_col)
    counters = {name: _StreamCounts() for name in cols - {
        f.name for f in num
    }}
    # nan-aware (n, mean, M2) with pairwise combine (Chan et al.) —
    # one-pass sum-of-squares cancels catastrophically on
    # large-mean/small-spread columns
    sums = {f.name: [0, 0.0, 0.0] for f in num}
    total_rows = 0
    for batch in iter_parquet_batches(
        settings.train_data_filepath,
        sorted(cols),
        settings.schema_stream_rows,
    ):
        total_rows += len(batch)
        for f in cat:
            counters[f.name].update(
                batch[f.name].astype(str).to_numpy()
            )
        for f in seq:
            counters[f.name].update(
                batch[f.name]
                .explode()
                .dropna()
                .astype(str)
                .to_numpy()
            )
        if need_logq and schema.candidate_id_col not in {
            f.name for f in cat
        }:
            counters[schema.candidate_id_col].update(
                batch[schema.candidate_id_col]
                .astype(str)
                .to_numpy()
            )
        for f in num:
            col = batch[f.name].to_numpy(dtype=np.float64)
            col = col[~np.isnan(col)]
            cn = len(col)
            if not cn:
                continue
            cmean = float(col.mean())
            c_m2 = float(((col - cmean) ** 2).sum())
            n, m, m2 = sums[f.name]
            tot = n + cn
            delta = cmean - m
            sums[f.name] = [
                tot,
                m + delta * cn / tot,
                m2 + c_m2 + delta * delta * n * cn / tot,
            ]

    for f in cat + seq:
        counts = counters[f.name].value_counts()
        if f.max_vocab_size is not None:
            counts = counts.iloc[: f.max_vocab_size]
        f.vocab = counts.index.to_numpy(dtype=str)
        f._token_to_id = None
        logger.info(
            "Feature %s vocab size %d (streamed)",
            f.name,
            len(f.vocab),
        )
    for f in num:
        n, m, m2 = sums[f.name]
        if n:
            f.mean = m
            f.std = float(np.sqrt(m2 / n)) or 1.0
        else:
            # mirror np.nanmean/np.nanstd over an all-NaN column
            f.mean = float("nan")
            f.std = float("nan")
    schema._wire_shared_vocabs()
    if need_logq:
        schema.build_logq_from_value_counts(
            counters[schema.candidate_id_col].value_counts(),
            total_rows,
        )
        logger.info(
            "Built logQ table with %d entries", len(schema.logq)
        )
    schema.save(settings.schema_dirpath)


def build_schema_runner(settings: Settings, schema: Schema) -> None:
    """Build vocabs + logQ from the train split, persist the schema
    (ref: pkg/etl/runner.py:54-84). ``settings.schema_stream_rows``
    streams the pass (identical artifact, O(uniques) memory)."""
    if settings.schema_stream_rows:
        return _build_schema_runner_streaming(settings, schema)
    feature_cols = [f.name for f in schema.features]
    train = load_dataframe(
        settings.train_data_filepath, columns=feature_cols
    )
    schema.build_features_from_dataframe(train)
    if schema.training_config.use_logq_correction:
        schema.build_logq_from_dataframe(train)
        logger.info(
            "Built logQ table with %d entries", len(schema.logq)
        )
    schema.save(settings.schema_dirpath)
