"""Schema layer tests: vocab build order, encoding, logQ table, round-trip.

Covers what the reference left untested (SURVEY §4 gaps: vocab building,
save/load) plus the reference-verified behaviors: frequency-ordered truncated
vocabs (ref: pkg/schema/features.py:106-127) and OOV->0 encoding
(ref: input_layer.py:33-36, num_oov_indices=1).
"""

import numpy as np
import pandas as pd
import pytest

from hm_retrieval_tpu.schema import (
    Feature,
    FeatureFamily,
    FeatureKind,
    ModelConfig,
    Schema,
    TrainingConfig,
)


def make_feature(**kw):
    defaults = dict(
        name="article_id",
        kind=FeatureKind.CATEGORICAL,
        family=FeatureFamily.CANDIDATE,
        embedding_size=4,
    )
    defaults.update(kw)
    return Feature(**defaults)


def make_schema(features=None, **tc_kw):
    features = features or [
        make_feature(
            name="customer_id", family=FeatureFamily.QUERY
        ),
        make_feature(name="article_id"),
    ]
    return Schema(
        features=features,
        model_config=ModelConfig(joint_embedding_size=8, ks=[1, 2]),
        training_config=TrainingConfig(**tc_kw),
    )


class TestFeature:
    def test_vocab_is_frequency_ordered_and_truncated(self):
        df = pd.DataFrame(
            {"article_id": ["b"] * 5 + ["a"] * 3 + ["c"] * 1 + ["d"] * 2}
        )
        f = make_feature(max_vocab_size=3)
        f.build_vocab_from_dataframe(df)
        assert list(f.vocab) == ["b", "a", "d"]
        assert f.num_embeddings == 4  # +1 OOV row

    def test_encode_oov_is_zero(self):
        f = make_feature(vocab=np.array(["x", "y"]))
        ids = f.encode(np.array(["y", "nope", "x"]))
        np.testing.assert_array_equal(ids, [2, 0, 1])
        assert ids.dtype == np.int32

    def test_decode_round_trip(self):
        f = make_feature(vocab=np.array(["x", "y"]))
        toks = f.decode(np.array([2, 0, 1]))
        assert list(toks) == ["y", "<OOV>", "x"]

    def test_decode_table_cached_and_invalidated(self):
        """decode must not rebuild the OOV-padded vocab copy per call
        (21 ms/call on a 1M vocab — the serving-edge bottleneck), and
        must rebuild it when the vocab is replaced."""
        f = make_feature(vocab=np.array(["x", "y"]))
        f.decode(np.array([1]))
        table = f._decode_table
        f.decode(np.array([2]))
        assert f._decode_table is table
        f.vocab = np.array(["p", "q", "r"])
        assert list(f.decode(np.array([3, 1]))) == ["r", "p"]

    def test_numeric_rejects_embedding(self):
        with pytest.raises(ValueError):
            Feature(
                name="price",
                kind=FeatureKind.NUMERIC,
                family=FeatureFamily.QUERY,
                embedding_size=4,
            )

    def test_categorical_requires_embedding(self):
        with pytest.raises(ValueError):
            Feature(
                name="id",
                kind=FeatureKind.CATEGORICAL,
                family=FeatureFamily.QUERY,
            )


class TestSchema:
    def test_duplicate_feature_names_rejected(self):
        # The reference silently overwrites dupes (SURVEY C12 quirk).
        with pytest.raises(ValueError, match="duplicate"):
            make_schema(
                features=[
                    make_feature(name="a", family=FeatureFamily.QUERY),
                    make_feature(name="a"),
                    make_feature(name="article_id"),
                ]
            )

    def test_candidate_id_must_be_candidate_feature(self):
        with pytest.raises(ValueError, match="candidate_id_col"):
            Schema(
                features=[
                    make_feature(
                        name="article_id", family=FeatureFamily.QUERY
                    )
                ],
                model_config=ModelConfig(joint_embedding_size=8),
                training_config=TrainingConfig(),
            )

    def test_logq_table_matches_hand_computed(self):
        # probs: b=3/6, a=2/6, c=1/6 -> vocab order [b, a, c]
        df = pd.DataFrame({"article_id": ["b", "b", "b", "a", "a", "c"]})
        schema = make_schema()
        schema.build_features_from_dataframe(
            pd.DataFrame(
                {
                    "customer_id": ["u1"] * 6,
                    "article_id": df["article_id"],
                }
            )
        )
        schema.build_logq_from_dataframe(df)
        assert schema.logq[0] == 0.0  # OOV -> log(1)=0
        np.testing.assert_allclose(
            schema.logq[1:],
            np.log([3 / 6, 2 / 6, 1 / 6]).astype(np.float32),
            rtol=1e-6,
        )

    def test_save_load_round_trip(self, tmp_path):
        df = pd.DataFrame(
            {
                "customer_id": ["u1", "u2", "u1"],
                "article_id": ["b", "b", "a"],
            }
        )
        schema = make_schema()
        schema.build_features_from_dataframe(df)
        schema.build_logq_from_dataframe(df)
        schema.save(str(tmp_path / "schema"))
        loaded = Schema.load(str(tmp_path / "schema"))
        assert [f.name for f in loaded.features] == [
            f.name for f in schema.features
        ]
        np.testing.assert_array_equal(
            loaded.feature("article_id").vocab,
            schema.feature("article_id").vocab,
        )
        np.testing.assert_allclose(loaded.logq, schema.logq)
        assert loaded.model_config.ks == [1, 2]
        assert (
            loaded.training_config.train_batch_size
            == schema.training_config.train_batch_size
        )

    def test_numeric_standardization(self):
        f = Feature(
            "age",
            FeatureKind.NUMERIC,
            FeatureFamily.QUERY,
            standardize=True,
        )
        df = pd.DataFrame({"age": [10.0, 20.0, 30.0, 40.0]})
        f.build_stats_from_dataframe(df)
        assert f.mean == 25.0
        out = f.transform_numeric(np.array([25.0, 36.18, 13.82]))
        np.testing.assert_allclose(
            out, [0.0, 1.0, -1.0], atol=1e-3
        )

    def test_standardize_rejected_on_categorical(self):
        with pytest.raises(ValueError, match="standardize"):
            make_feature(standardize=True)

    def test_standardize_round_trip(self, tmp_path):
        schema = make_schema(
            features=[
                make_feature(
                    name="customer_id", family=FeatureFamily.QUERY
                ),
                Feature(
                    "age",
                    FeatureKind.NUMERIC,
                    FeatureFamily.QUERY,
                    standardize=True,
                ),
                make_feature(name="article_id"),
            ]
        )
        df = pd.DataFrame(
            {
                "customer_id": ["u1", "u2"],
                "age": [20.0, 40.0],
                "article_id": ["a", "b"],
            }
        )
        schema.build_features_from_dataframe(df)
        schema.save(str(tmp_path / "s"))
        loaded = Schema.load(str(tmp_path / "s"))
        age = loaded.feature("age")
        assert age.standardize and age.mean == 30.0

    def test_set_candidate_probs_explicit_dict(self):
        schema = make_schema()
        schema.feature("article_id").vocab = np.array(["a", "b"])
        schema.set_candidate_probs({"a": 0.25, "b": 0.75})
        np.testing.assert_allclose(
            schema.logq, [0.0, np.log(0.25), np.log(0.75)], rtol=1e-6
        )
