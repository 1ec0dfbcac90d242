"""Shard writer + streaming dataset tests (SURVEY §4 gap: the reference
never tested its TFRecord round-trip)."""

import numpy as np
import pandas as pd
import pytest

from hm_retrieval_tpu.data.dataset import ShardDataset
from hm_retrieval_tpu.data.runner import shard_writer_runner
from hm_retrieval_tpu.data.shard_writer import ShardWriter
from hm_retrieval_tpu.schema import Feature, FeatureFamily, FeatureKind

from tests.test_etl import (
    build_schema_runner,
    etl_runner,
    make_hm_schema,
    make_settings,
    write_raw_hm,
)


@pytest.fixture
def features():
    return [
        Feature(
            "uid",
            FeatureKind.CATEGORICAL,
            FeatureFamily.QUERY,
            embedding_size=2,
            vocab=np.array(["u1", "u2", "u3"]),
        ),
        Feature("age", FeatureKind.NUMERIC, FeatureFamily.QUERY),
    ]


def make_df(n):
    return pd.DataFrame(
        {
            "uid": [f"u{(i % 4) + 1}" for i in range(n)],  # u4 is OOV
            "age": np.arange(n, dtype=np.float64),
        }
    )


class TestShardWriter:
    def test_round_trip_and_dtypes(self, features, tmp_path):
        df = make_df(10)
        n = ShardWriter(features, max_rows=4).write_shards(
            df, str(tmp_path)
        )
        assert n == 3  # 4+4+2
        ds = ShardDataset(str(tmp_path))
        all_rows = ds.load_all()
        assert all_rows["uid"].dtype == np.int32
        assert all_rows["age"].dtype == np.float32
        # u1->1 u2->2 u3->3 u4->0(OOV), cycling
        np.testing.assert_array_equal(
            all_rows["uid"], [1, 2, 3, 0, 1, 2, 3, 0, 1, 2]
        )
        np.testing.assert_array_equal(all_rows["age"], np.arange(10))
        assert ds.num_rows == 10


class TestShardDataset:
    def test_iter_batches_no_shuffle_order(self, features, tmp_path):
        ShardWriter(features, max_rows=4).write_shards(
            make_df(10), str(tmp_path)
        )
        ds = ShardDataset(str(tmp_path))
        batches = list(ds.iter_batches(batch_size=3))
        sizes = [len(b["age"]) for b in batches]
        assert sizes == [3, 3, 3, 1]
        got = np.concatenate([b["age"] for b in batches])
        np.testing.assert_array_equal(got, np.arange(10))

    def test_drop_remainder(self, features, tmp_path):
        ShardWriter(features, max_rows=4).write_shards(
            make_df(10), str(tmp_path)
        )
        ds = ShardDataset(str(tmp_path))
        batches = list(
            ds.iter_batches(batch_size=3, drop_remainder=True)
        )
        assert [len(b["age"]) for b in batches] == [3, 3, 3]

    def test_shuffle_is_permutation_and_seeded(self, features, tmp_path):
        ShardWriter(features, max_rows=4).write_shards(
            make_df(10), str(tmp_path)
        )
        ds = ShardDataset(str(tmp_path))

        def run(seed):
            return np.concatenate(
                [
                    b["age"]
                    for b in ds.iter_batches(
                        batch_size=3,
                        shuffle_buffer_size=100,
                        seed=seed,
                    )
                ]
            )

        a, b = run(7), run(7)
        np.testing.assert_array_equal(a, b)  # deterministic
        c = run(8)
        assert sorted(a) == sorted(c) == list(range(10))  # permutation
        assert not np.array_equal(a, np.arange(10))  # actually shuffled

    def test_rows_aligned_across_columns_after_shuffle(
        self, features, tmp_path
    ):
        # age == index, uid cycles with period 4: row i has uid (i%4)+1
        # (0 for i%4==3). Check pairing survives the shuffle.
        ShardWriter(features, max_rows=4).write_shards(
            make_df(12), str(tmp_path)
        )
        ds = ShardDataset(str(tmp_path))
        for b in ds.iter_batches(
            batch_size=5, shuffle_buffer_size=6, seed=3
        ):
            idx = b["age"].astype(int)
            expect = np.where(idx % 4 == 3, 0, (idx % 4) + 1)
            np.testing.assert_array_equal(b["uid"], expect)


    def test_reader_threads_identical_stream(
        self, features, tmp_path
    ):
        """Parallel shard reading must not change the emitted batch
        stream (same order, same rows) for any thread count."""
        ShardWriter(features, max_rows=4).write_shards(
            make_df(22), str(tmp_path)
        )
        ds = ShardDataset(str(tmp_path))

        def stream(threads):
            return list(
                ds.iter_batches(
                    batch_size=5,
                    shuffle_buffer_size=8,
                    seed=3,
                    num_reader_threads=threads,
                )
            )

        want = stream(0)
        for threads in (1, 2, 4):
            got = stream(threads)
            assert len(got) == len(want)
            for a, b in zip(got, want):
                np.testing.assert_array_equal(a["age"], b["age"])
                np.testing.assert_array_equal(a["uid"], b["uid"])

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ShardDataset(str(tmp_path / "nope"))

    def test_process_sharding_partitions_shards(
        self, features, tmp_path
    ):
        ShardWriter(features, max_rows=3).write_shards(
            make_df(12), str(tmp_path)
        )  # 4 shards
        rows = []
        for p in range(2):
            ds = ShardDataset(
                str(tmp_path), process_index=p, process_count=2
            )
            assert len(ds.shard_paths) == 2
            rows.append(ds.load_all()["age"])
        combined = np.sort(np.concatenate(rows))
        np.testing.assert_array_equal(combined, np.arange(12))

    def test_process_with_no_shards_rejected(
        self, features, tmp_path
    ):
        ShardWriter(features, max_rows=100).write_shards(
            make_df(5), str(tmp_path)
        )  # 1 shard
        with pytest.raises(ValueError, match="no shards"):
            ShardDataset(
                str(tmp_path), process_index=1, process_count=2
            )


class TestShardWriterRunner:
    def test_end_to_end(self, tmp_path):
        write_raw_hm(tmp_path)
        settings = make_settings(tmp_path)
        etl_runner(settings)
        build_schema_runner(settings, make_hm_schema())
        shard_writer_runner(settings)
        cand = ShardDataset(settings.candidate_shards_dirpath).load_all()
        # unique article ids over train+test: a1, a2 (train), a1 (test)
        # -> a1, a2  (a3's transaction was dropped by the inner join)
        assert len(cand["article_id"]) == 2
        assert set(cand.keys()) == {"article_id", "product_type_name"}
        train = ShardDataset(settings.train_shards_dirpath).load_all()
        assert set(train.keys()) == {
            "customer_id",
            "age",
            "article_id",
            "product_type_name",
        }


class TestStreamingShardStage:
    """Settings.shard_stream_rows must yield shard files IDENTICAL to
    the in-memory stage — same boundaries, same encoded arrays, same
    candidate set/order, same manifests."""

    def _run_both(self, tmp_path, history):
        import dataclasses
        import json
        import os

        from hm_retrieval_tpu.utils.synthetic import (
            generate_hm_like_csvs,
        )
        from tests.test_etl import make_settings

        raw = generate_hm_like_csvs(
            str(tmp_path / "raw"),
            n_transactions=1200,
            n_customers=50,
            n_articles=30,
            seed=3,
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
            max_shard_rows=150,
        )
        mem = dataclasses.replace(base, **common)
        etl_runner(mem)
        schema = make_hm_schema()
        if history:
            from hm_retrieval_tpu.schema import (
                Feature,
                FeatureFamily,
                FeatureKind,
            )

            schema.features.append(
                Feature(
                    "purchase_history",
                    FeatureKind.SEQUENCE,
                    FeatureFamily.QUERY,
                    embedding_size=4,
                    max_len=3,
                    shared_vocab_with="article_id",
                )
            )
        build_schema_runner(mem, schema)
        shard_writer_runner(mem)
        d = str(tmp_path)
        stream = dataclasses.replace(
            mem,
            train_shards_dirpath=f"{d}/shards_s/train",
            test_shards_dirpath=f"{d}/shards_s/test",
            candidate_shards_dirpath=f"{d}/shards_s/candidates",
            shard_stream_rows=170,  # deliberately != max_shard_rows
        )
        shard_writer_runner(stream)
        return mem, stream

    @pytest.mark.parametrize("history", [False, True])
    def test_identical_shards(self, tmp_path, history):
        import json
        import os

        mem, stream = self._run_both(tmp_path, history)
        for attr in (
            "train_shards_dirpath",
            "test_shards_dirpath",
            "candidate_shards_dirpath",
        ):
            a_dir, b_dir = getattr(mem, attr), getattr(stream, attr)
            a_files = sorted(os.listdir(a_dir))
            assert a_files == sorted(os.listdir(b_dir)), attr
            for name in a_files:
                pa_, pb = (
                    os.path.join(a_dir, name),
                    os.path.join(b_dir, name),
                )
                if name.endswith(".json"):
                    assert json.load(open(pa_)) == json.load(
                        open(pb)
                    ), name
                    continue
                a = np.load(pa_)
                b = np.load(pb)
                assert sorted(a.files) == sorted(b.files)
                for key in a.files:
                    np.testing.assert_array_equal(
                        a[key], b[key], err_msg=f"{attr}/{name}/{key}"
                    )
