"""Popularity-baseline evaluation stage.

Analog of ref: baseline_modelling_runner (pkg/modelling/runner.py:111-152):
build a StaticIndex from raw-transaction popularity over the train date
range, evaluate the same test shards with the same streaming Recall@K, save
the index artifact.
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

from hm_retrieval_tpu.data.dataset import ShardDataset
from hm_retrieval_tpu.etl.transformations import (
    date_filter,
    load_dataframe,
)
from hm_retrieval_tpu.indices.static_index import StaticIndex
from hm_retrieval_tpu.metrics.index_recall import IndexRecall
from hm_retrieval_tpu.schema.schema import Schema
from hm_retrieval_tpu.utils.settings import Settings

logger = logging.getLogger(__name__)


def baseline_modelling_runner(settings: Settings) -> Dict[int, float]:
    schema = Schema.load(settings.schema_dirpath)
    tc, mc = schema.training_config, schema.model_config

    transactions = load_dataframe(
        settings.transactions_filepath,
        columns=[settings.date_column, settings.article_id_column],
    )
    train_range = date_filter(
        transactions,
        settings.date_column,
        settings.train_start_date,
        settings.train_end_date,
    )
    k = max(mc.ks)
    index = StaticIndex.build_popularity_index_from_series(
        train_range[settings.article_id_column], schema, k
    )

    usable_ks = [x for x in mc.ks if x <= index.k]
    if len(usable_ks) < len(mc.ks):
        logger.warning(
            "Dropping ks > popularity index size %d", index.k
        )
    metric = IndexRecall(usable_ks)
    test_ds = ShardDataset(settings.test_shards_dirpath)
    for batch in test_ds.iter_batches(tc.test_batch_size):
        true_ids = np.asarray(batch[schema.candidate_id_col])
        retrieved = index.query(len(true_ids), k=metric.max_k)
        metric.update(retrieved, true_ids)
    res = metric.log_metric(None, writer=None)
    index.save(settings.baseline_index_dirpath)
    return res
