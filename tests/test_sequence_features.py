"""Sequence-feature tests (BASELINE config[3]): history construction,
encoding, pooled tower forward, end-to-end learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from hm_retrieval_tpu.etl.transformations import add_history_column
from hm_retrieval_tpu.models import (
    OptimizerFactory,
    TwoTowerModel,
    create_train_state,
    embedding_output_dim,
    make_train_step,
)
from hm_retrieval_tpu.schema import (
    Feature,
    FeatureFamily,
    FeatureKind,
    ModelConfig,
    Schema,
    TrainingConfig,
)


class TestAddHistoryColumn:
    def test_excludes_current_and_keeps_order(self):
        df = pd.DataFrame(
            {
                "t_dat": [
                    "2020-01-01",
                    "2020-01-02",
                    "2020-01-03",
                    "2020-01-02",
                ],
                "customer_id": ["u1", "u1", "u1", "u2"],
                "article_id": ["a", "b", "c", "z"],
            }
        )
        out = add_history_column(
            df,
            "customer_id",
            "article_id",
            "history",
            max_len=2,
            date_col="t_dat",
        )
        assert out["history"].tolist() == [
            [],
            ["a"],
            ["a", "b"],
            [],
        ]

    def test_window_truncates_oldest(self):
        df = pd.DataFrame(
            {
                "customer_id": ["u"] * 5,
                "article_id": list("abcde"),
            }
        )
        out = add_history_column(
            df, "customer_id", "article_id", "h", max_len=2
        )
        assert out["h"].tolist()[-1] == ["c", "d"]


class TestSequenceEncoding:
    def test_encode_pads_and_truncates(self):
        f = Feature(
            "history",
            FeatureKind.SEQUENCE,
            FeatureFamily.QUERY,
            embedding_size=4,
            max_len=3,
            vocab=np.array(["a", "b", "c"]),
        )
        out = f.encode_sequence(
            [["a"], [], ["a", "b", "c", "a"], ["zz", "b"]]
        )
        np.testing.assert_array_equal(
            out,
            [
                [1, 0, 0],
                [0, 0, 0],
                [2, 3, 1],  # truncated to last 3
                [0, 2, 0],  # OOV -> 0
            ],
        )

    def test_vectorized_matches_loop_oracle(self):
        """The vectorized encode_sequence must reproduce the per-token
        loop implementation exactly, including ragged rows, missing
        cells (None / NaN), OOV tokens, and non-string tokens."""
        rng = np.random.default_rng(3)
        f = Feature(
            "history",
            FeatureKind.SEQUENCE,
            FeatureFamily.QUERY,
            embedding_size=4,
            max_len=5,
            vocab=np.array([f"t{i}" for i in range(20)]),
        )
        values = []
        for _ in range(500):
            r = rng.random()
            if r < 0.05:
                values.append(None)
            elif r < 0.1:
                values.append(float("nan"))
            elif r < 0.15:
                values.append([])
            elif r < 0.2:
                values.append([123, 456])  # non-string tokens
            else:
                ln = int(rng.integers(1, 12))
                values.append(
                    [
                        f"t{rng.integers(0, 25)}"  # some OOV
                        for _ in range(ln)
                    ]
                )
        np.testing.assert_array_equal(
            f.encode_sequence(values),
            f._encode_sequence_loop(values),
        )

    def test_numpy_fallback_matches_native(self, monkeypatch):
        """The numpy fallback (native extension unavailable) must agree
        with the native path and the loop oracle."""
        from hm_retrieval_tpu import native_ext

        f = Feature(
            "history",
            FeatureKind.SEQUENCE,
            FeatureFamily.QUERY,
            embedding_size=4,
            max_len=4,
            vocab=np.array(["a", "b", "c"]),
        )
        values = [["a", "b"], None, ["c", "zz", "a", "b", "c"], []]
        native_out = f.encode_sequence(values)
        monkeypatch.setattr(native_ext, "seq_available", lambda: False)
        f2 = Feature(
            "history",
            FeatureKind.SEQUENCE,
            FeatureFamily.QUERY,
            embedding_size=4,
            max_len=4,
            vocab=np.array(["a", "b", "c"]),
        )
        fallback_out = f2.encode_sequence(values)
        np.testing.assert_array_equal(fallback_out, native_out)
        np.testing.assert_array_equal(
            fallback_out, f2._encode_sequence_loop(values)
        )

    def test_encode_sequence_empty_input(self):
        f = Feature(
            "history",
            FeatureKind.SEQUENCE,
            FeatureFamily.QUERY,
            embedding_size=4,
            max_len=3,
            vocab=np.array(["a"]),
        )
        assert f.encode_sequence([]).shape == (0, 3)

    def test_shared_vocab_wiring(self):
        schema = Schema(
            features=[
                Feature(
                    "history",
                    FeatureKind.SEQUENCE,
                    FeatureFamily.QUERY,
                    embedding_size=4,
                    max_len=2,
                    shared_vocab_with="article_id",
                ),
                Feature(
                    "article_id",
                    FeatureKind.CATEGORICAL,
                    FeatureFamily.CANDIDATE,
                    embedding_size=4,
                ),
            ],
            model_config=ModelConfig(joint_embedding_size=4, ks=[1]),
            training_config=TrainingConfig(),
        )
        df = pd.DataFrame({"article_id": ["y", "y", "x"]})
        schema.build_features_from_dataframe(df)
        hist = schema.feature("history")
        np.testing.assert_array_equal(hist.vocab, ["y", "x"])
        # ids consistent across the two features
        np.testing.assert_array_equal(
            hist.encode_sequence([["x", "y"]]), [[2, 1]]
        )

    def test_save_load_rewires(self, tmp_path):
        schema = Schema(
            features=[
                Feature(
                    "history",
                    FeatureKind.SEQUENCE,
                    FeatureFamily.QUERY,
                    embedding_size=4,
                    max_len=2,
                    shared_vocab_with="article_id",
                ),
                Feature(
                    "article_id",
                    FeatureKind.CATEGORICAL,
                    FeatureFamily.CANDIDATE,
                    embedding_size=4,
                ),
            ],
            model_config=ModelConfig(joint_embedding_size=4, ks=[1]),
            training_config=TrainingConfig(),
        )
        schema.build_features_from_dataframe(
            pd.DataFrame({"article_id": ["p", "q"]})
        )
        schema.save(str(tmp_path / "s"))
        loaded = Schema.load(str(tmp_path / "s"))
        assert loaded.feature("history").has_vocab
        np.testing.assert_array_equal(
            loaded.feature("history").vocab,
            loaded.feature("article_id").vocab,
        )


class TestSequenceTower:
    def make_model(self):
        vocab = np.array([f"a{i}" for i in range(20)])
        return TwoTowerModel(
            query_features=[
                Feature(
                    "history",
                    FeatureKind.SEQUENCE,
                    FeatureFamily.QUERY,
                    embedding_size=8,
                    max_len=4,
                    vocab=vocab,
                ),
                Feature(
                    "customer_id",
                    FeatureKind.CATEGORICAL,
                    FeatureFamily.QUERY,
                    embedding_size=8,
                    vocab=np.array([f"u{i}" for i in range(10)]),
                ),
            ],
            candidate_features=[
                Feature(
                    "article_id",
                    FeatureKind.CATEGORICAL,
                    FeatureFamily.CANDIDATE,
                    embedding_size=8,
                    vocab=vocab,
                ),
            ],
            candidate_id_col="article_id",
            joint_embedding_size=16,
        )

    def test_forward_shape_and_masking(self, rng):
        model = self.make_model()
        assert embedding_output_dim(model.query_features) == 16
        params = model.init_params(0)
        batch = {
            "history": np.array(
                [[1, 2, 0, 0], [0, 0, 0, 0]], np.int32
            ),
            "customer_id": np.array([1, 2], np.int32),
        }
        out = model.query_forward(params, batch)
        assert out.shape == (2, 16)
        # empty history must not produce NaNs (mask denominator >= 1)
        assert np.isfinite(np.asarray(out)).all()

    def test_empty_history_pools_to_zero(self):
        model = self.make_model()
        params = model.init_params(0)
        from hm_retrieval_tpu.models import apply_embeddings

        emb = apply_embeddings(
            params["query_tower"]["embeddings"],
            model.query_features,
            {
                "history": np.zeros((1, 4), np.int32),
                "customer_id": np.array([1], np.int32),
            },
        )
        np.testing.assert_allclose(np.asarray(emb)[0, :8], 0.0)

    def test_no_attention_subtree_without_attention_features(self):
        # default mean pooling must not change the params pytree
        # (checkpoint compatibility)
        model = self.make_model()
        params = model.init_params(0)
        assert "attention" not in params["query_tower"]
        assert "attention" not in params["candidate_tower"]

    def test_training_learns_from_history(self, rng):
        # queries identified ONLY by history (constant customer id);
        # target article == last history item's "next" pattern
        model = self.make_model()
        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": 0.1}
        )
        state = create_train_state(model, opt, 0)
        step = make_train_step(model, opt)
        B = 16
        arts = rng.integers(1, 21, B).astype(np.int32)
        batch = {
            "history": np.stack(
                [
                    np.array(
                        [a, a, 0, 0], np.int32
                    )  # history predicts same article
                    for a in arts
                ]
            ),
            "customer_id": np.ones(B, np.int32),
            "article_id": arts,
        }
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        losses = []
        for _ in range(150):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.5


class TestAttentionPooling:
    """pooling="attention": learned-query attention over history
    positions (the BASELINE config[3] "mean-pool/attention"
    alternative)."""

    def make_model(self, pooling):
        vocab = np.array([f"a{i}" for i in range(20)])
        return TwoTowerModel(
            query_features=[
                Feature(
                    "history",
                    FeatureKind.SEQUENCE,
                    FeatureFamily.QUERY,
                    embedding_size=8,
                    max_len=4,
                    vocab=vocab,
                    pooling=pooling,
                ),
            ],
            candidate_features=[
                Feature(
                    "article_id",
                    FeatureKind.CATEGORICAL,
                    FeatureFamily.CANDIDATE,
                    embedding_size=8,
                    vocab=vocab,
                ),
            ],
            candidate_id_col="article_id",
            joint_embedding_size=16,
        )

    def test_validation(self):
        with pytest.raises(ValueError, match="unknown pooling"):
            Feature(
                "h",
                FeatureKind.SEQUENCE,
                FeatureFamily.QUERY,
                embedding_size=4,
                max_len=2,
                pooling="max",
            )
        with pytest.raises(ValueError, match="only applies to"):
            Feature(
                "c",
                FeatureKind.CATEGORICAL,
                FeatureFamily.QUERY,
                embedding_size=4,
                pooling="attention",
            )

    def test_zero_init_equals_mean_pool(self, rng):
        # same seed -> identical tables; zero attention query gives
        # uniform weights over valid positions == masked mean
        m_attn = self.make_model("attention")
        m_mean = self.make_model("mean")
        p_attn = m_attn.init_params(0)
        p_mean = m_mean.init_params(0)
        assert "attention" in p_attn["query_tower"]
        batch = {
            "history": jnp.asarray(
                rng.integers(0, 21, (8, 4)).astype(np.int32)
            )
        }
        out_a = m_attn.query_forward(p_attn, batch)
        out_m = m_mean.query_forward(p_mean, batch)
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_m), rtol=1e-5,
            atol=1e-6,
        )

    def test_all_pad_row_pools_to_zero(self):
        from hm_retrieval_tpu.models import apply_embeddings

        model = self.make_model("attention")
        params = model.init_params(0)
        emb = apply_embeddings(
            params["query_tower"]["embeddings"],
            model.query_features,
            {"history": np.zeros((2, 4), np.int32)},
            attention=params["query_tower"]["attention"],
        )
        assert np.isfinite(np.asarray(emb)).all()
        np.testing.assert_allclose(np.asarray(emb), 0.0)

    def test_attention_params_train(self, rng):
        model = self.make_model("attention")
        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": 0.1}
        )
        state = create_train_state(model, opt, 0)
        step = make_train_step(model, opt)
        B = 16
        arts = rng.integers(1, 21, B).astype(np.int32)
        noise = rng.integers(1, 21, B).astype(np.int32)
        batch = {
            # signal in position 0, noise in position 1
            "history": jnp.asarray(
                np.stack(
                    [
                        np.array([a, n, 0, 0], np.int32)
                        for a, n in zip(arts, noise)
                    ]
                )
            ),
            "article_id": jnp.asarray(arts),
        }
        losses = []
        for _ in range(150):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.5
        # gradients reached the attention query vector
        w = np.asarray(
            state.params["query_tower"]["attention"]["history"]
        )
        assert np.abs(w).max() > 0.0

    def test_sparse_step_matches_dense_with_attention(self, rng):
        from hm_retrieval_tpu.models.sparse_optimizer import (
            create_sparse_train_state,
            make_sparse_train_step,
        )

        model = self.make_model("attention")
        lr = 0.05
        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": lr}
        )
        dense_state = create_train_state(model, opt, seed=0)
        dense_step = make_train_step(model, opt)
        sparse_state = create_sparse_train_state(model, opt, seed=0)
        sparse_step = make_sparse_train_step(model, opt, lr)
        for _ in range(4):
            batch = {
                "history": jnp.asarray(
                    rng.integers(0, 21, (8, 4)).astype(np.int32)
                ),
                "article_id": jnp.asarray(
                    rng.integers(0, 21, 8).astype(np.int32)
                ),
            }
            dense_state, md = dense_step(dense_state, batch)
            sparse_state, ms = sparse_step(sparse_state, batch)
            np.testing.assert_allclose(
                float(md["loss"]), float(ms["loss"]), rtol=1e-5
            )
        for a, b in zip(
            jax.tree.leaves(dense_state.params),
            jax.tree.leaves(sparse_state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_pooling_survives_schema_roundtrip(self, tmp_path):
        schema = Schema(
            features=[
                Feature(
                    "history",
                    FeatureKind.SEQUENCE,
                    FeatureFamily.QUERY,
                    embedding_size=4,
                    max_len=2,
                    shared_vocab_with="article_id",
                    pooling="attention",
                ),
                Feature(
                    "article_id",
                    FeatureKind.CATEGORICAL,
                    FeatureFamily.CANDIDATE,
                    embedding_size=4,
                ),
            ],
            model_config=ModelConfig(joint_embedding_size=4, ks=[1]),
            training_config=TrainingConfig(),
        )
        schema.build_features_from_dataframe(
            pd.DataFrame({"article_id": ["p", "q"]})
        )
        schema.save(str(tmp_path / "s"))
        loaded = Schema.load(str(tmp_path / "s"))
        assert loaded.feature("history").pooling == "attention"
        assert loaded.feature("article_id").pooling == "mean"


class TestVectorizedHistory:
    """add_history_column is fully vectorized (round-5); these pin its
    equivalence to the per-row loop oracle and the arrow fast path
    through parquet + ShardWriter."""

    def _random_frame(self, n, n_users, n_items, n_days, seed):
        rng = np.random.default_rng(seed)
        return pd.DataFrame(
            {
                "t_dat": [
                    f"2020-01-{d + 1:02d}"
                    for d in rng.integers(0, n_days, n)
                ],
                "customer_id": [
                    f"u{u}" for u in rng.integers(0, n_users, n)
                ],
                "article_id": [
                    f"a{i}" for i in rng.integers(0, n_items, n)
                ],
            }
        )

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_row_loop_oracle(self, seed):
        from hm_retrieval_tpu.etl.transformations import (
            _add_history_column_rows,
        )

        df = self._random_frame(400, 23, 17, 9, seed)
        got = add_history_column(
            df, "customer_id", "article_id", "h", 4, date_col="t_dat"
        )
        want = _add_history_column_rows(
            df, "customer_id", "article_id", "h", 4, date_col="t_dat"
        )
        assert got["h"].tolist() == want["h"].tolist()

    def test_nan_dates_order_last_like_oracle(self):
        """Missing dates must sort LAST (sort_values na_position
        default), not first: factorize's -1 sentinel would otherwise
        make an undated transaction the user's EARLIEST purchase and
        leak it into every dated row's history."""
        from hm_retrieval_tpu.etl.transformations import (
            _add_history_column_rows,
        )

        df = pd.DataFrame(
            {
                "t_dat": ["2020-01-02", None, "2020-01-01",
                          "2020-01-03", None],
                "customer_id": ["u"] * 5,
                "article_id": ["x1", "x2", "x3", "x4", "x5"],
            }
        )
        got = add_history_column(
            df, "customer_id", "article_id", "h", 8,
            date_col="t_dat",
        )
        want = _add_history_column_rows(
            df, "customer_id", "article_id", "h", 8,
            date_col="t_dat",
        )
        assert got["h"].tolist() == want["h"].tolist()
        # the dated rows never see the undated items
        assert got["h"].tolist()[3] == ["x3", "x1"]

    def test_matches_oracle_without_date(self):
        from hm_retrieval_tpu.etl.transformations import (
            _add_history_column_rows,
        )

        df = self._random_frame(200, 11, 9, 5, 2).drop(columns=["t_dat"])
        got = add_history_column(
            df, "customer_id", "article_id", "h", 3
        )
        want = _add_history_column_rows(
            df, "customer_id", "article_id", "h", 3
        )
        assert got["h"].tolist() == want["h"].tolist()

    def test_int_item_column(self):
        from hm_retrieval_tpu.etl.transformations import (
            _add_history_column_rows,
        )

        df = pd.DataFrame(
            {
                "customer_id": ["u"] * 4,
                "article_id": [108775015, 108775044, 110065001, 108775015],
            }
        )
        got = add_history_column(
            df, "customer_id", "article_id", "h", 8
        )
        want = _add_history_column_rows(
            df, "customer_id", "article_id", "h", 8
        )
        assert got["h"].tolist() == want["h"].tolist()
        assert got["h"].tolist()[-1] == [
            "108775015",
            "108775044",
            "110065001",
        ]

    def test_parquet_shard_fast_path_matches_list_path(self, tmp_path):
        """ETL parquet -> load_dataframe (arrow-backed list column) ->
        ShardWriter must produce the SAME encoded (B, max_len) ids as
        the object-column list path."""
        from hm_retrieval_tpu.data.shard_writer import (
            ShardWriter,
            _arrow_list_parts,
        )
        from hm_retrieval_tpu.etl.transformations import (
            load_dataframe,
            save_dataframe,
        )

        df = self._random_frame(300, 13, 11, 7, 5)
        out = add_history_column(
            df, "customer_id", "article_id", "h", 4, date_col="t_dat"
        )
        p = str(tmp_path / "train.parquet")
        save_dataframe(out, p)
        loaded = load_dataframe(p)
        assert _arrow_list_parts(loaded["h"]) is not None

        f = Feature(
            "h",
            FeatureKind.SEQUENCE,
            FeatureFamily.QUERY,
            embedding_size=4,
            max_len=4,
            vocab=np.array([f"a{i}" for i in range(8)]),  # some OOV
        )
        w = ShardWriter([f], max_rows=1000)
        fast = w.encode_dataframe(loaded)["h"]
        slow = f.encode_sequence(loaded["h"].tolist())
        np.testing.assert_array_equal(fast, slow)

    def test_encode_sequence_ids_matches_encode_sequence(self):
        rng = np.random.default_rng(9)
        vocab = np.array([f"t{i}" for i in range(12)])
        f = Feature(
            "h",
            FeatureKind.SEQUENCE,
            FeatureFamily.QUERY,
            embedding_size=4,
            max_len=3,
            vocab=vocab,
        )
        rows = [
            [f"t{j}" for j in rng.integers(0, 15, rng.integers(0, 7))]
            for _ in range(200)
        ]
        lens = np.array([len(r) for r in rows], np.int64)
        offsets = np.concatenate(([0], np.cumsum(lens)))
        flat = [t for r in rows for t in r]
        flat_ids = f.encode(np.array(flat, dtype=object)) if flat else (
            np.zeros(0, np.int32)
        )
        got = f.encode_sequence_ids(flat_ids, offsets)
        want = f.encode_sequence(rows)
        np.testing.assert_array_equal(got, want)
