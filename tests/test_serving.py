"""Serving-path tests: artifacts -> loaded service -> string-in/string-out
retrieval (the reference's SavedModel serving contract,
ref: brute_force.py:108-114, re-expressed as host-edge encode/decode)."""

import numpy as np
import pytest

from hm_retrieval_tpu.serving import RetrievalService

from tests.test_runners import pipeline  # noqa: F401  (module fixture)


class TestRetrievalService:
    @pytest.fixture()
    def service(self, pipeline):  # noqa: F811
        settings, _, _ = pipeline
        return RetrievalService.load(
            settings.schema_dirpath,
            settings.model_dirpath,
            settings.index_dirpath,
        )

    def test_string_round_trip(self, service):
        cust = service.schema.feature("customer_id").vocab[:3]
        out = service.retrieve({"customer_id": list(cust)}, k=5)
        assert len(out) == 3
        art_vocab = set(
            service.schema.feature("article_id").vocab.tolist()
        )
        for row in out:
            assert len(row) == 5
            assert len(set(row)) == 5  # distinct results
            assert set(row) <= art_vocab  # real article ids

    def test_oov_customer_is_served(self, service):
        out = service.retrieve(
            {"customer_id": ["never_seen_customer"]}, k=3
        )
        assert len(out) == 1 and len(out[0]) == 3

    def test_missing_feature_rejected(self, service):
        with pytest.raises(KeyError, match="customer_id"):
            service.retrieve({"wrong": ["x"]})

    def test_k_exceeding_index_rejected(self, service):
        with pytest.raises(ValueError, match="exceeds"):
            service.retrieve(
                {"customer_id": ["a"]}, k=service.index.k + 1
            )

    def test_distributed_serving_matches_single_device(
        self, service, pipeline  # noqa: F811
    ):
        """Service with the catalog row-sharded over the 8-device mesh
        returns the same results as the single-device service (same
        artifacts, different placement)."""
        from hm_retrieval_tpu.parallel import make_mesh

        settings, _, _ = pipeline
        mesh = make_mesh(data=2, model=4)
        dist = RetrievalService.load(
            settings.schema_dirpath,
            settings.model_dirpath,
            settings.index_dirpath,
            mesh=mesh,
            distributed_index=True,
        )
        cust = service.schema.feature("customer_id").vocab[:3]
        query = {"customer_id": list(cust)}
        assert dist.retrieve(query, k=5) == service.retrieve(
            query, k=5
        )

    def test_distributed_load_requires_mesh(self, pipeline):  # noqa: F811
        settings, _, _ = pipeline
        with pytest.raises(ValueError, match="mesh"):
            RetrievalService.load(
                settings.schema_dirpath,
                settings.model_dirpath,
                settings.index_dirpath,
                distributed_index=True,
            )

    def test_results_are_model_ranked(self, service, pipeline):  # noqa: F811
        # service output must equal index top-k on the same query
        settings, _, _ = pipeline
        cust = service.schema.feature("customer_id").vocab[0]
        batch = service.encode_query({"customer_id": [cust]})
        q = service._embed(service.params, batch)
        _, ids = service.index.topk_from_embeddings(q)
        expect = service.schema.candidate_id_feature.decode(
            np.asarray(ids)[:, :4]
        )
        got = service.retrieve({"customer_id": [cust]}, k=4)
        assert got[0] == list(expect[0])
