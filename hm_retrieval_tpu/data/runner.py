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


def shard_writer_runner(settings: Settings) -> None:
    schema = Schema.load(settings.schema_dirpath)
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
