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
    (ref: pkg/etl/runner.py:9-51)."""
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


def build_schema_runner(settings: Settings, schema: Schema) -> None:
    """Build vocabs + logQ from the train split, persist the schema
    (ref: pkg/etl/runner.py:54-84)."""
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
