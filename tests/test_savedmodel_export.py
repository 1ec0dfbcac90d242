"""TF-Serving SavedModel export: the exported graph must reproduce the
reference's serving contract ((None,1) string tensors in, (B,k) string
ids out, ref: brute_force.py:108-114, abstract_keras_model.py:109-131)
and agree exactly with the in-process RetrievalService."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from hm_retrieval_tpu.serving import RetrievalService  # noqa: E402
from hm_retrieval_tpu.serving.savedmodel_export import (  # noqa: E402
    export_index_savedmodel,
)

from tests.test_runners import pipeline  # noqa: F401, E402


@pytest.fixture(scope="module")
def exported(pipeline, tmp_path_factory):  # noqa: F811
    settings, _, _ = pipeline
    service = RetrievalService.load(
        settings.schema_dirpath,
        settings.model_dirpath,
        settings.index_dirpath,
    )
    out = str(tmp_path_factory.mktemp("savedmodel"))
    export_index_savedmodel(
        service.schema, service.params, service.index, out
    )
    loaded = tf.saved_model.load(out)
    return service, loaded.signatures["serving_default"]


class TestSavedModelExport:
    def test_matches_retrieval_service(self, exported):
        service, serve = exported
        cust = service.schema.feature("customer_id").vocab[:4]
        want = service.retrieve({"customer_id": list(cust)})
        got = serve(
            customer_id=tf.constant(
                np.asarray(cust, dtype=str).reshape(-1, 1)
            )
        )["candidate_ids"].numpy()
        got = [[s.decode() for s in row] for row in got]
        assert got == want

    def test_oov_query_served(self, exported):
        service, serve = exported
        want = service.retrieve({"customer_id": ["never_seen"]})
        got = serve(
            customer_id=tf.constant([["never_seen"]])
        )["candidate_ids"].numpy()
        assert [[s.decode() for s in got[0]]] == want

    def test_signature_shape_contract(self, exported):
        service, serve = exported
        out = serve(customer_id=tf.constant([["a"], ["b"], ["c"]]))
        assert out["candidate_ids"].shape == (3, service.index.k)
        assert out["candidate_ids"].dtype == tf.string

    def test_numeric_feature_standardization(self, tmp_path):
        # Hand-built schema with a standardized numeric query feature:
        # the TF edge must reproduce Feature.transform_numeric,
        # including NaN -> 0 (at-the-mean) handling.
        import jax

        from hm_retrieval_tpu.indices.brute_force import (
            BruteForceIndex,
        )
        from hm_retrieval_tpu.models.tower import init_tower_params
        from hm_retrieval_tpu.schema import (
            Feature,
            FeatureFamily,
            FeatureKind,
            ModelConfig,
            Schema,
            TrainingConfig,
        )
        from hm_retrieval_tpu.serving.service import RetrievalService

        rng = np.random.default_rng(0)
        feats = [
            Feature(
                "customer_id",
                FeatureKind.CATEGORICAL,
                FeatureFamily.QUERY,
                embedding_size=8,
                vocab=np.array([f"c{i}" for i in range(20)]),
            ),
            Feature(
                "age",
                FeatureKind.NUMERIC,
                FeatureFamily.QUERY,
                standardize=True,
                mean=40.0,
                std=12.0,
            ),
            Feature(
                "article_id",
                FeatureKind.CATEGORICAL,
                FeatureFamily.CANDIDATE,
                embedding_size=8,
                vocab=np.array([f"a{i}" for i in range(30)]),
            ),
        ]
        schema = Schema(
            features=feats,
            model_config=ModelConfig(
                joint_embedding_size=8, ks=[5]
            ),
            training_config=TrainingConfig(),
            candidate_id_col="article_id",
        )
        params = init_tower_params(
            jax.random.PRNGKey(0), schema.query_features, 8
        )
        index = BruteForceIndex(
            5,
            np.arange(1, 31, dtype=np.int32),
            rng.normal(size=(30, 8)).astype(np.float32),
        )
        service = RetrievalService(schema, params, index)
        out = str(tmp_path / "sm_numeric")
        export_index_savedmodel(schema, params, index, out)
        serve = tf.saved_model.load(out).signatures[
            "serving_default"
        ]

        raw = {
            "customer_id": ["c1", "c5", "never", "c2", "c3"],
            "age": [
                25.0,
                float("nan"),
                63.0,
                # ADVICE: +/-inf must match np.nan_to_num's squash to
                # the float32 extremes, not flow through as inf
                float("inf"),
                float("-inf"),
            ],
        }
        want = service.retrieve(raw)
        got = serve(
            customer_id=tf.constant(
                [[v] for v in raw["customer_id"]]
            ),
            age=tf.constant([[v] for v in raw["age"]]),
        )["candidate_ids"].numpy()
        assert [[s.decode() for s in row] for row in got] == want

    def test_out_of_range_ids_decode_to_oov(self, pipeline, tmp_path):  # noqa: F811, E501
        # ADVICE: an index built from ids not encoded with this schema
        # (identifier > len(vocab)) must decode to '<OOV>' at serve
        # time, mirroring Feature.decode, instead of aborting the
        # SavedModel's gather.
        import numpy as np

        from hm_retrieval_tpu.indices.brute_force import (
            BruteForceIndex,
        )
        from hm_retrieval_tpu.serving import RetrievalService

        settings, _, _ = pipeline
        service = RetrievalService.load(
            settings.schema_dirpath,
            settings.model_dirpath,
            settings.index_dirpath,
        )
        vocab_len = len(
            service.schema.candidate_id_feature.vocab
        )
        n = service.index.num_candidates
        rogue_ids = np.arange(
            vocab_len + 1, vocab_len + 1 + n, dtype=np.int32
        )
        rogue = BruteForceIndex(
            service.index.k,
            rogue_ids,
            np.asarray(service.index.embeddings)[:n],
        )
        out = str(tmp_path / "sm_rogue")
        export_index_savedmodel(
            service.schema, service.params, rogue, out
        )
        serve = tf.saved_model.load(out).signatures[
            "serving_default"
        ]
        cust = service.schema.feature("customer_id").vocab[:2]
        got = serve(
            customer_id=tf.constant(
                np.asarray(cust, dtype=str).reshape(-1, 1)
            )
        )["candidate_ids"].numpy()
        assert all(
            s.decode() == "<OOV>" for row in got for s in row
        )

    def test_sequence_feature_export_matches_service(self, tmp_path):
        # SEQUENCE query features export with a (None, max_len) string
        # input: per-token hash-table lookup, "" pads -> id 0 (masked
        # by pooling), matching Feature.encode_sequence exactly.
        import jax

        from hm_retrieval_tpu.indices.brute_force import (
            BruteForceIndex,
        )
        from hm_retrieval_tpu.models.tower import init_tower_params
        from hm_retrieval_tpu.schema import (
            Feature,
            FeatureFamily,
            FeatureKind,
            ModelConfig,
            Schema,
            TrainingConfig,
        )
        from hm_retrieval_tpu.serving.service import RetrievalService

        rng = np.random.default_rng(3)
        max_len = 4
        articles = np.array([f"a{i}" for i in range(30)])
        feats = [
            Feature(
                "customer_id",
                FeatureKind.CATEGORICAL,
                FeatureFamily.QUERY,
                embedding_size=8,
                vocab=np.array([f"c{i}" for i in range(20)]),
            ),
            Feature(
                "purchase_history",
                FeatureKind.SEQUENCE,
                FeatureFamily.QUERY,
                embedding_size=8,
                max_len=max_len,
                vocab=articles,
            ),
            Feature(
                "article_id",
                FeatureKind.CATEGORICAL,
                FeatureFamily.CANDIDATE,
                embedding_size=8,
                vocab=articles,
            ),
        ]
        schema = Schema(
            features=feats,
            model_config=ModelConfig(
                joint_embedding_size=8, ks=[5]
            ),
            training_config=TrainingConfig(),
            candidate_id_col="article_id",
        )
        params = init_tower_params(
            jax.random.PRNGKey(1), schema.query_features, 8
        )
        index = BruteForceIndex(
            5,
            np.arange(1, 31, dtype=np.int32),
            rng.normal(size=(30, 8)).astype(np.float32),
        )
        service = RetrievalService(schema, params, index)
        out = str(tmp_path / "sm_seq")
        export_index_savedmodel(schema, params, index, out)
        serve = tf.saved_model.load(out).signatures[
            "serving_default"
        ]

        histories = [
            ["a1", "a5", "a5"],      # short: pads
            [],                       # empty: all-pad row
            ["a2", "never_seen", "a9", "a0"],  # full + OOV token
        ]
        raw = {
            "customer_id": ["c1", "c5", "never"],
            "purchase_history": histories,
        }
        want = service.retrieve(raw)
        padded = np.full((3, max_len), "", dtype=object)
        for r, h in enumerate(histories):
            padded[r, : len(h)] = h
        got = serve(
            customer_id=tf.constant(
                [[v] for v in raw["customer_id"]]
            ),
            purchase_history=tf.constant(
                padded.astype(str), dtype=tf.string
            ),
        )["candidate_ids"].numpy()
        assert [[s.decode() for s in row] for row in got] == want
