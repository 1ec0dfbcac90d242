"""ETL tests: date-filter boundaries (mirrors the reference's
tests/test_transformations.py:22-36) + join/split runner behavior."""

import pandas as pd
import pytest

from hm_retrieval_tpu.etl.runner import build_schema_runner, etl_runner
from hm_retrieval_tpu.etl.transformations import (
    date_filter,
    load_dataframe,
    save_dataframe,
)
from hm_retrieval_tpu.schema import (
    Feature,
    FeatureFamily,
    FeatureKind,
    ModelConfig,
    Schema,
    TrainingConfig,
)
from hm_retrieval_tpu.utils.settings import Settings


@pytest.fixture
def frame():
    return pd.DataFrame(
        {
            "t_dat": [
                "2020-01-01",
                "2020-01-02",
                "2020-01-03",
                "2020-01-04",
                "2020-01-05",
            ],
            "v": [1, 2, 3, 4, 5],
        }
    )


class TestDateFilter:
    def test_inclusive_both_ends(self, frame):
        out = date_filter(frame, "t_dat", "2020-01-02", "2020-01-04")
        assert list(out["v"]) == [2, 3, 4]

    def test_empty_range(self, frame):
        out = date_filter(frame, "t_dat", "2021-01-01", "2021-02-01")
        assert len(out) == 0

    def test_full_range(self, frame):
        out = date_filter(frame, "t_dat", "2020-01-01", "2020-01-05")
        assert len(out) == 5


class TestIO:
    def test_csv_round_trip(self, frame, tmp_path):
        p = str(tmp_path / "x.csv")
        save_dataframe(frame, p, date_column="t_dat")
        loaded = load_dataframe(p)
        assert list(loaded["v"]) == [1, 2, 3, 4, 5]

    def test_parquet_round_trip(self, frame, tmp_path):
        p = str(tmp_path / "x.parquet")
        save_dataframe(frame, p)
        loaded = load_dataframe(p, columns=["v"])
        assert list(loaded.columns) == ["v"]


def write_raw_hm(tmp_path):
    """Tiny synthetic H&M-shaped raw CSVs."""
    tx = pd.DataFrame(
        {
            "t_dat": [
                "2020-01-01",
                "2020-01-02",
                "2020-02-01",
                "2020-02-02",
            ],
            "customer_id": ["u1", "u2", "u1", "u9"],
            "article_id": ["a1", "a2", "a1", "a3"],
        }
    )
    articles = pd.DataFrame(
        {
            "article_id": ["a1", "a2", "a3"],
            "product_type_name": ["shirt", "pants", "shirt"],
        }
    )
    customers = pd.DataFrame(
        {"customer_id": ["u1", "u2"], "age": [30.0, 40.0]}
    )
    tx.to_csv(tmp_path / "transactions.csv", index=False)
    articles.to_csv(tmp_path / "articles.csv", index=False)
    customers.to_csv(tmp_path / "customers.csv", index=False)


def make_settings(tmp_path) -> Settings:
    d = str(tmp_path)
    return Settings(
        transactions_filepath=f"{d}/transactions.csv",
        articles_filepath=f"{d}/articles.csv",
        customers_filepath=f"{d}/customers.csv",
        train_start_date="2020-01-01",
        train_end_date="2020-01-31",
        test_start_date="2020-02-01",
        test_end_date="2020-02-28",
        train_data_filepath=f"{d}/processed/train.parquet",
        test_data_filepath=f"{d}/processed/test.parquet",
        schema_dirpath=f"{d}/schema",
        train_shards_dirpath=f"{d}/shards/train",
        test_shards_dirpath=f"{d}/shards/test",
        candidate_shards_dirpath=f"{d}/shards/candidates",
    )


def make_hm_schema() -> Schema:
    return Schema(
        features=[
            Feature(
                "customer_id",
                FeatureKind.CATEGORICAL,
                FeatureFamily.QUERY,
                embedding_size=4,
            ),
            Feature("age", FeatureKind.NUMERIC, FeatureFamily.QUERY),
            Feature(
                "article_id",
                FeatureKind.CATEGORICAL,
                FeatureFamily.CANDIDATE,
                embedding_size=4,
            ),
            Feature(
                "product_type_name",
                FeatureKind.CATEGORICAL,
                FeatureFamily.CANDIDATE,
                embedding_size=2,
            ),
        ],
        model_config=ModelConfig(joint_embedding_size=8, ks=[1, 2]),
        training_config=TrainingConfig(),
        candidate_id_col="article_id",
    )


class TestEtlRunner:
    def test_join_and_split(self, tmp_path):
        write_raw_hm(tmp_path)
        settings = make_settings(tmp_path)
        etl_runner(settings)
        train = pd.read_parquet(settings.train_data_filepath)
        test = pd.read_parquet(settings.test_data_filepath)
        # u9 has no customer row -> inner join drops that transaction.
        assert len(train) == 2 and len(test) == 1
        assert set(train.columns) >= {
            "t_dat",
            "customer_id",
            "article_id",
            "product_type_name",
            "age",
        }

    def test_build_schema_runner(self, tmp_path):
        write_raw_hm(tmp_path)
        settings = make_settings(tmp_path)
        etl_runner(settings)
        schema = make_hm_schema()
        build_schema_runner(settings, schema)
        loaded = Schema.load(settings.schema_dirpath)
        # train has a1 twice (u1 2020-01-01, but wait: 2020-02-01 is test)
        assert loaded.feature("article_id").has_vocab
        assert loaded.logq is not None
        assert loaded.logq[0] == 0.0


class TestChunkedEtlRunner:
    """Streaming ETL (Settings.etl_chunk_rows) must produce loaded
    frames EQUAL to the in-memory path — join semantics, row order,
    date split, and history windows across chunk boundaries."""

    def _run_both(self, tmp_path, n_tx, history, chunk_rows):
        import dataclasses

        from hm_retrieval_tpu.utils.synthetic import (
            generate_hm_like_csvs,
        )

        raw = generate_hm_like_csvs(
            str(tmp_path / "raw"),
            n_transactions=n_tx,
            n_customers=40,
            n_articles=25,
            seed=7,
        )
        base = make_settings(tmp_path)
        common = dict(
            transactions_filepath=raw["transactions"],
            articles_filepath=raw["articles"],
            customers_filepath=raw["customers"],
            train_start_date=raw["train_start"],
            train_end_date=raw["train_end"],
            test_start_date=raw["test_start"],
            test_end_date=raw["test_end"],
            history_max_len=3 if history else None,
        )
        d = str(tmp_path)
        mem = dataclasses.replace(base, **common)
        chunked = dataclasses.replace(
            base,
            **common,
            train_data_filepath=f"{d}/processed_c/train.parquet",
            test_data_filepath=f"{d}/processed_c/test.parquet",
            etl_chunk_rows=chunk_rows,
        )
        etl_runner(mem)
        etl_runner(chunked)
        return mem, chunked

    @pytest.mark.parametrize("history", [False, True])
    def test_equals_in_memory(self, tmp_path, history):
        from hm_retrieval_tpu.etl.transformations import (
            load_dataframe,
        )

        mem, chunked = self._run_both(
            tmp_path, n_tx=900, history=history, chunk_rows=130
        )
        for split in ("train_data_filepath", "test_data_filepath"):
            a = load_dataframe(getattr(mem, split))
            b = load_dataframe(getattr(chunked, split))
            assert list(a.columns) == list(b.columns)
            assert len(a) == len(b)
            for col in a.columns:
                av, bv = a[col], b[col]
                if str(av.dtype).startswith(
                    "large_list"
                ) or str(av.dtype).startswith("list"):
                    assert [
                        list(x) for x in av
                    ] == [list(x) for x in bv], col
                else:
                    pd.testing.assert_series_equal(
                        av.reset_index(drop=True),
                        bv.reset_index(drop=True),
                        check_names=False,
                    )

    def test_nan_dates_cross_chunk(self, tmp_path):
        """Undated transactions (sorted last, round-5 fix) must get
        identical histories even when the NaN rows land in different
        chunks than the user's dated rows."""
        d = tmp_path
        (d / "raw").mkdir()
        tx = pd.DataFrame(
            {
                "t_dat": [
                    "2020-01-02", None, "2020-01-01",
                    "2020-01-03", None, "2020-01-04",
                ],
                "customer_id": ["u1"] * 6,
                "article_id": ["a1", "a2", "a3", "a4", "a5", "a1"],
                "price": [1.0] * 6,
            }
        )
        tx.to_csv(d / "raw" / "transactions.csv", index=False)
        pd.DataFrame(
            {
                "article_id": ["a1", "a2", "a3", "a4", "a5"],
                "product_type_name": ["t"] * 5,
            }
        ).to_csv(d / "raw" / "articles.csv", index=False)
        pd.DataFrame(
            {"customer_id": ["u1"], "age": [30.0]}
        ).to_csv(d / "raw" / "customers.csv", index=False)
        import dataclasses

        base = make_settings(d)
        common = dict(
            transactions_filepath=str(d / "raw/transactions.csv"),
            articles_filepath=str(d / "raw/articles.csv"),
            customers_filepath=str(d / "raw/customers.csv"),
            train_start_date="2020-01-01",
            train_end_date="2020-01-04",
            history_max_len=4,
        )
        mem = dataclasses.replace(base, **common)
        chunked = dataclasses.replace(
            base,
            **common,
            train_data_filepath=f"{d}/processed_c/train.parquet",
            test_data_filepath=f"{d}/processed_c/test.parquet",
            etl_chunk_rows=2,
        )
        etl_runner(mem)
        etl_runner(chunked)
        from hm_retrieval_tpu.etl.transformations import (
            load_dataframe,
        )

        a = load_dataframe(mem.train_data_filepath)
        b = load_dataframe(chunked.train_data_filepath)
        ha = [list(x) for x in a["purchase_history"]]
        hb = [list(x) for x in b["purchase_history"]]
        assert ha == hb
        # dated rows never see the undated items (a2, a5)
        assert ha[-1] == ["a3", "a1", "a4"]
        # the empty test split must stay loadable WITH column
        # selection (a schema-less empty parquet breaks downstream
        # column-selecting readers)
        empty = load_dataframe(
            chunked.test_data_filepath,
            columns=["customer_id", "article_id"],
        )
        assert len(empty) == 0

    def test_all_dates_missing_cross_chunk(self, tmp_path):
        """Every t_dat NaN: the column reads as float64, so
        date_filter raises the SAME TypeError in both paths (path
        parity on invalid input; the chunked history build's empty
        rank table is guarded and is not reached first)."""
        import dataclasses

        d = tmp_path
        (d / "raw").mkdir()
        pd.DataFrame(
            {
                "t_dat": [None] * 4,
                "customer_id": ["u1"] * 4,
                "article_id": ["a1", "a2", "a3", "a4"],
                "price": [1.0] * 4,
            }
        ).to_csv(d / "raw" / "transactions.csv", index=False)
        pd.DataFrame(
            {
                "article_id": ["a1", "a2", "a3", "a4"],
                "product_type_name": ["t"] * 4,
            }
        ).to_csv(d / "raw" / "articles.csv", index=False)
        pd.DataFrame(
            {"customer_id": ["u1"], "age": [30.0]}
        ).to_csv(d / "raw" / "customers.csv", index=False)
        base = make_settings(d)
        chunked = dataclasses.replace(
            base,
            transactions_filepath=str(d / "raw/transactions.csv"),
            articles_filepath=str(d / "raw/articles.csv"),
            customers_filepath=str(d / "raw/customers.csv"),
            history_max_len=4,
            etl_chunk_rows=2,
        )
        with pytest.raises(TypeError):
            etl_runner(chunked)
        mem = dataclasses.replace(
            chunked,
            etl_chunk_rows=None,
            train_data_filepath=str(d / "m_train.parquet"),
            test_data_filepath=str(d / "m_test.parquet"),
        )
        with pytest.raises(TypeError):
            etl_runner(mem)


class TestStreamingSchemaStage:
    """Settings.schema_stream_rows must produce the identical schema
    artifact: vocab arrays (incl. tie order among equal counts),
    numeric stats, and the logQ table."""

    def test_equals_in_memory(self, tmp_path):
        import dataclasses

        import numpy as np

        from hm_retrieval_tpu.schema import Schema
        from hm_retrieval_tpu.utils.synthetic import (
            generate_hm_like_csvs,
        )

        raw = generate_hm_like_csvs(
            str(tmp_path / "raw"),
            n_transactions=1500,
            n_customers=60,
            n_articles=35,
            seed=11,
        )
        base = make_settings(tmp_path)
        common = dict(
            transactions_filepath=raw["transactions"],
            articles_filepath=raw["articles"],
            customers_filepath=raw["customers"],
            train_start_date=raw["train_start"],
            train_end_date=raw["train_end"],
            test_start_date=raw["test_start"],
            test_end_date=raw["test_end"],
        )
        mem = dataclasses.replace(base, **common)
        etl_runner(mem)
        d = str(tmp_path)
        stream = dataclasses.replace(
            mem,
            schema_dirpath=f"{d}/schema_s",
            schema_stream_rows=137,
        )

        def schema_with_standardized_age():
            sch = make_hm_schema()
            for f in sch.features:
                if f.name == "age":
                    f.standardize = True
            return sch

        build_schema_runner(mem, schema_with_standardized_age())
        build_schema_runner(stream, schema_with_standardized_age())
        a = Schema.load(mem.schema_dirpath)
        b = Schema.load(stream.schema_dirpath)
        for fa, fb in zip(a.features, b.features):
            assert fa.name == fb.name
            if fa.has_vocab:
                np.testing.assert_array_equal(
                    fa.vocab, fb.vocab, err_msg=fa.name
                )
            if fa.mean is not None:
                # streaming stats use a pairwise (Chan) combine — not
                # bit-identical to one-shot nanstd, but stable
                np.testing.assert_allclose(
                    fb.mean, fa.mean, rtol=1e-12
                )
                np.testing.assert_allclose(
                    fb.std, fa.std, rtol=1e-12
                )
            else:
                assert fb.mean is None and fb.std is None
        np.testing.assert_array_equal(a.logq, b.logq)
