"""Serialization pipeline stage: CSV/parquet -> encoded columnar shards.

Analog of the reference's tfrecord_writer_runner
(ref: pkg/tfrecord_writer/runner.py:11-52). Writes three datasets:

1. unique candidates — dedup of candidate-feature columns over
   concat(train, test); assumes a candidate id never carries differing
   features (ref: runner.py:32-43)
2. train
3. test
"""

from __future__ import annotations

import logging

import pandas as pd

from hm_retrieval_tpu.data.shard_writer import ShardWriter
from hm_retrieval_tpu.etl.transformations import load_dataframe
from hm_retrieval_tpu.schema.schema import Schema
from hm_retrieval_tpu.utils.settings import Settings

logger = logging.getLogger(__name__)


def iter_parquet_batches(filepath: str, columns, batch_rows: int):
    """Stream a parquet file as pandas frames of ~batch_rows, keeping
    list columns (purchase histories) arrow-backed like
    load_dataframe does."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    mapper = lambda t: (  # noqa: E731
        pd.ArrowDtype(t)
        if pa.types.is_list(t) or pa.types.is_large_list(t)
        else None
    )
    # read whole row groups and slice (pf.iter_batches raises
    # ArrowNotImplementedError slicing nested list columns into
    # chunked outputs); combine_chunks gives each slice contiguous
    # buffers before pandas conversion
    pf = pq.ParquetFile(filepath)
    for g in range(pf.num_row_groups):
        tbl = pf.read_row_group(g, columns=list(columns))
        # drop the file's pandas schema metadata: it describes ALL
        # original columns, and to_pandas tries to re-parse dtype
        # strings like 'large_list<...>[pyarrow]' (unparseable) even
        # for columns excluded from this read; the types_mapper above
        # supplies everything the list columns need
        tbl = tbl.replace_schema_metadata(None)
        for off in range(0, len(tbl), batch_rows):
            yield tbl.slice(off, batch_rows).combine_chunks(
            ).to_pandas(types_mapper=mapper)


def _shard_writer_runner_streaming(
    settings: Settings, schema: Schema
) -> None:
    """Streaming variant: train/test parquet flow through encode+write
    ``shard_stream_rows`` at a time (peak memory one batch + one
    shard buffer); unique candidates are collected during the same
    pass (first occurrence across train-then-test, matching the
    monolithic concat+drop_duplicates). Outputs are identical to the
    in-memory path (asserted in tests/test_data.py)."""
    feature_cols = [f.name for f in schema.features]
    candidate_cols = [f.name for f in schema.candidate_features]
    cid = schema.candidate_id_col
    seen = pd.Index([])
    cand_parts = []
    writer = ShardWriter(schema.features, settings.max_shard_rows)
    for split_path, out_dir in (
        (settings.train_data_filepath, settings.train_shards_dirpath),
        (settings.test_data_filepath, settings.test_shards_dirpath),
    ):

        def frames():
            nonlocal seen
            for df in iter_parquet_batches(
                split_path, feature_cols, settings.shard_stream_rows
            ):
                cand = df[candidate_cols].drop_duplicates(
                    subset=[cid]
                )
                fresh = seen.get_indexer(cand[cid].to_numpy()) < 0
                if fresh.any():
                    cand = cand[fresh]
                    cand_parts.append(cand)
                    seen = seen.append(pd.Index(cand[cid]))
                yield df

        writer.write_shards_streaming(frames(), out_dir)
    candidates = (
        pd.concat(cand_parts).reset_index(drop=True)
        if cand_parts
        else pd.DataFrame(
            {c: pd.Series([], dtype=object) for c in candidate_cols}
        )
    )
    logger.info("Found %d unique candidates", len(candidates))
    ShardWriter(
        schema.candidate_features, settings.max_shard_rows
    ).write_shards(candidates, settings.candidate_shards_dirpath)


def shard_writer_runner(settings: Settings) -> None:
    schema = Schema.load(settings.schema_dirpath)
    if settings.shard_stream_rows:
        return _shard_writer_runner_streaming(settings, schema)
    feature_cols = [f.name for f in schema.features]
    train = load_dataframe(
        settings.train_data_filepath, columns=feature_cols
    )
    test = load_dataframe(
        settings.test_data_filepath, columns=feature_cols
    )

    candidate_cols = [f.name for f in schema.candidate_features]
    candidates = (
        pd.concat([train[candidate_cols], test[candidate_cols]])
        .drop_duplicates(subset=[schema.candidate_id_col])
        .reset_index(drop=True)
    )
    logger.info("Found %d unique candidates", len(candidates))

    ShardWriter(
        schema.candidate_features, settings.max_shard_rows
    ).write_shards(candidates, settings.candidate_shards_dirpath)
    writer = ShardWriter(schema.features, settings.max_shard_rows)
    writer.write_shards(train, settings.train_shards_dirpath)
    writer.write_shards(test, settings.test_shards_dirpath)
