"""Regression tests for the round-1 code-review findings."""

import jax.numpy as jnp
import numpy as np
import pytest

from hm_retrieval_tpu.data.dataset import ShardDataset
from hm_retrieval_tpu.data.shard_writer import ShardWriter
from hm_retrieval_tpu.ops.pallas_retrieval import (
    VMEM_BUDGET,
    pallas_exact_topk,
    pick_bins,
    vmem_estimate,
)
from hm_retrieval_tpu.runners.modelling import _pad_batch
from hm_retrieval_tpu.schema import Feature, FeatureFamily, FeatureKind


class TestPallasDefaults:
    def test_default_L_does_not_crash(self, rng):
        # finding 1: L was used before its None-default was applied
        q = rng.normal(size=(4, 16)).astype(np.float32)
        c = rng.normal(size=(600, 16)).astype(np.float32)
        for keep in (1, 2):
            v, i, _ = pallas_exact_topk(
                jnp.asarray(q),
                jnp.asarray(c),
                8,
                interpret=True,
                compute_dtype=jnp.float32,
                keep_per_bin=keep,
            )
            ref = np.sort(q @ c.T, axis=1)[:, -8:]
            np.testing.assert_allclose(
                np.sort(np.asarray(v), axis=1), ref, rtol=1e-5
            )

    def test_pick_bins_respects_k_and_vmem(self):
        # k=1000 needs L>=1024; small batch fits
        L = pick_bins(B=64, E=128, k=1000, keep_per_bin=2)
        assert L is not None and L >= 1000
        assert vmem_estimate(64, 128, L, 2) <= VMEM_BUDGET
        # huge batch + huge k: infeasible -> None (index falls back)
        assert pick_bins(B=4096, E=128, k=2000) is None

    def test_kernel_k_exceeding_explicit_bins_rejected(self, rng):
        with pytest.raises(ValueError, match="<= L"):
            pallas_exact_topk(
                jnp.zeros((2, 8)),
                jnp.zeros((2048, 8)),
                300,
                L=256,
                interpret=True,
                keep_per_bin=2,
            )

    def test_kernel_infeasible_default_rejected(self, rng):
        # k beyond the largest lane-aligned bin count: the dynamic
        # default (pick_bins) must refuse rather than crash in Mosaic
        with pytest.raises(ValueError, match="no feasible bin count"):
            pallas_exact_topk(
                jnp.zeros((2, 8)),
                jnp.zeros((4096, 8)),
                3000,
                interpret=True,
                keep_per_bin=2,
            )


class TestPadBatch2D:
    def test_sequence_column_keeps_width(self):
        # finding 5: np.pad over all axes widened (n, L) tails
        batch = {
            "article_id": np.arange(3, dtype=np.int32),
            "history": np.ones((3, 16), np.int32),
        }
        padded, n = _pad_batch(batch, 8)
        assert n == 3
        assert padded["article_id"].shape == (8,)
        assert padded["history"].shape == (8, 16)


class TestUnseededShuffle:
    def test_shuffle_without_seed_still_shuffles(self, tmp_path):
        # finding 8: missing seed silently disabled shuffling
        f = Feature(
            "uid",
            FeatureKind.CATEGORICAL,
            FeatureFamily.QUERY,
            embedding_size=2,
            vocab=np.array([f"u{i}" for i in range(200)]),
        )
        import pandas as pd

        df = pd.DataFrame(
            {"uid": [f"u{i % 200}" for i in range(200)]}
        )
        ShardWriter([f], max_rows=50).write_shards(
            df, str(tmp_path)
        )
        ds = ShardDataset(str(tmp_path))
        got = np.concatenate(
            [
                b["uid"]
                for b in ds.iter_batches(
                    50, shuffle_buffer_size=200
                )
            ]
        )
        assert not np.array_equal(
            got, np.arange(1, 201, dtype=np.int32) % 201
        )
        assert sorted(got) == sorted(
            f.encode(df["uid"].to_numpy())
        )


class TestSequenceNaN:
    def test_nan_history_cell_encodes_as_empty(self):
        # finding 7: pandas NaN list cells crashed encode_sequence
        f = Feature(
            "history",
            FeatureKind.SEQUENCE,
            FeatureFamily.QUERY,
            embedding_size=2,
            max_len=3,
            vocab=np.array(["a", "b"]),
        )
        out = f.encode_sequence([["a"], float("nan"), None, ["b"]])
        np.testing.assert_array_equal(
            out, [[1, 0, 0], [0, 0, 0], [0, 0, 0], [2, 0, 0]]
        )


class TestServingSequence:
    def test_sequence_query_feature_served(self):
        # finding 3: serving crashed on sequence features
        from hm_retrieval_tpu.indices.brute_force import (
            BruteForceIndex,
        )
        from hm_retrieval_tpu.models import TwoTowerModel
        from hm_retrieval_tpu.schema import (
            ModelConfig,
            Schema,
            TrainingConfig,
        )
        from hm_retrieval_tpu.serving import RetrievalService

        vocab = np.array([f"art_{i}" for i in range(20)])
        schema = Schema(
            features=[
                Feature(
                    "history",
                    FeatureKind.SEQUENCE,
                    FeatureFamily.QUERY,
                    embedding_size=4,
                    max_len=4,
                    vocab=vocab,
                ),
                Feature(
                    "article_id",
                    FeatureKind.CATEGORICAL,
                    FeatureFamily.CANDIDATE,
                    embedding_size=4,
                    vocab=vocab,
                ),
            ],
            model_config=ModelConfig(joint_embedding_size=4, ks=[2]),
            training_config=TrainingConfig(),
        )
        model = TwoTowerModel.create_from_schema(schema)
        params = model.init_params(0)
        idx = BruteForceIndex(
            3,
            np.arange(1, 21, dtype=np.int32),
            np.asarray(
                model.candidate_forward(
                    params,
                    {
                        "article_id": np.arange(
                            1, 21, dtype=np.int32
                        )
                    },
                )
            ),
        )
        svc = RetrievalService(schema, params["query_tower"], idx)
        out = svc.retrieve(
            {"history": [["art_1", "art_5"], []]}, k=3
        )
        assert len(out) == 2 and len(out[0]) == 3
        assert all(r.startswith("art_") for r in out[0])


class TestMixedNegativesNoLogq:
    def test_no_correction_when_logq_disabled(self, rng):
        # finding 6: uniform correction applied without in-batch term
        from hm_retrieval_tpu.models import TwoTowerModel
        from hm_retrieval_tpu.models.mixed_negatives import (
            CandidateCatalog,
            mixed_negatives_loss,
        )
        import jax

        vocab = np.array([f"a{i}" for i in range(10)])
        model = TwoTowerModel(
            query_features=[
                Feature(
                    "uid",
                    FeatureKind.CATEGORICAL,
                    FeatureFamily.QUERY,
                    embedding_size=4,
                    vocab=vocab,
                )
            ],
            candidate_features=[
                Feature(
                    "article_id",
                    FeatureKind.CATEGORICAL,
                    FeatureFamily.CANDIDATE,
                    embedding_size=4,
                    vocab=vocab,
                )
            ],
            candidate_id_col="article_id",
            joint_embedding_size=4,
            logq=None,
        )
        params = model.init_params(0)
        catalog = CandidateCatalog(
            {"article_id": np.arange(1, 11, dtype=np.int32)}
        )
        batch = {
            "uid": np.array([1, 2], np.int32),
            "article_id": np.array([3, 4], np.int32),
        }
        key = jax.random.PRNGKey(0)
        loss = mixed_negatives_loss(
            model, params, batch, catalog, key, 4
        )
        # manual: plain softmax over [in-batch | uniform], NO offsets
        q = np.asarray(model.query_forward(params, batch))
        c_in = np.asarray(model.candidate_forward(params, batch))
        c_neg = np.asarray(
            model.candidate_forward(
                params, catalog.sample(key, 4)
            )
        )
        logits = np.concatenate(
            [q @ c_in.T, q @ c_neg.T], axis=1
        )
        lse = np.log(np.exp(logits).sum(axis=1))
        manual = float(np.sum(lse - np.diag(q @ c_in.T)))
        np.testing.assert_allclose(float(loss), manual, rtol=1e-5)


class TestAdviceRound1Fixes:
    """Regression tests for the round-1 advisor findings (ADVICE.md)."""

    def test_approx_scores_only_real_rows(self, rng):
        # ADVICE: the approx path ran lax.approx_max_k over the padded
        # score axis, letting -inf pad rows occupy PartialReduce bins so
        # effective recall dropped below recall_target on pad-heavy
        # catalogs. Now the real-row slice is scored (n_real is static).
        from hm_retrieval_tpu.indices.brute_force import BruteForceIndex

        N, E, B, k = 1050, 16, 64, 50  # pads to 2048: ~half pad rows
        emb = rng.normal(size=(N, E)).astype(np.float32)
        ids = np.arange(1, N + 1, dtype=np.int32)
        q = rng.normal(size=(B, E)).astype(np.float32)
        exact = BruteForceIndex(k, ids, emb, method="full")
        approx = BruteForceIndex(
            k, ids, emb, method="approx", recall_target=0.95
        )
        _, i_exact = exact.topk_from_embeddings(jnp.asarray(q))
        _, i_approx = approx.topk_from_embeddings(jnp.asarray(q))
        i_exact, i_approx = np.asarray(i_exact), np.asarray(i_approx)
        # pad rows (id 0) must never be returned
        assert (i_approx >= 1).all() and (i_approx <= N).all()
        # aggregate recall must meet the target now that bins are not
        # wasted on pad rows (deterministic given the fixed seed)
        hits = sum(
            len(set(a) & set(b)) for a, b in zip(i_exact, i_approx)
        )
        assert hits / (B * k) >= 0.95

    def test_exact_method_survives_reload(self, tmp_path, rng):
        # ADVICE: load() silently remapped explicitly saved exact
        # methods to "auto", which can reorder tied candidates. The
        # saved method is now honored (pallas remaps only off-TPU).
        from hm_retrieval_tpu.indices.brute_force import BruteForceIndex

        emb = rng.normal(size=(2000, 8)).astype(np.float32)
        ids = np.arange(1, 2001, dtype=np.int32)
        for method in ("full", "partial_reduce"):
            idx = BruteForceIndex(5, ids, emb, method=method)
            idx.save(str(tmp_path / method))
            loaded = BruteForceIndex.load(str(tmp_path / method))
            assert loaded.method == method

    def test_pallas_method_falls_back_off_tpu(self, tmp_path, rng):
        import json
        import os

        from hm_retrieval_tpu.indices.brute_force import BruteForceIndex

        emb = rng.normal(size=(100, 8)).astype(np.float32)
        ids = np.arange(1, 101, dtype=np.int32)
        idx = BruteForceIndex(5, ids, emb, method="full")
        d = str(tmp_path / "pallas_idx")
        idx.save(d)
        meta_path = os.path.join(d, "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["method"] = "pallas"
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        loaded = BruteForceIndex.load(d)  # CPU backend in tests
        assert loaded.method == "partial_reduce"

    def test_runner_fails_fast_on_unexportable_schema(self, tmp_path):
        # ADVICE (medium): with savedmodel_dirpath set and an
        # unexportable schema, the runner used to train all epochs and
        # then crash at export time, losing the results. It must now
        # raise BEFORE any dataset/train work.
        import dataclasses

        from hm_retrieval_tpu.runners import modelling_runner
        from hm_retrieval_tpu.schema import (
            ModelConfig,
            Schema,
            TrainingConfig,
        )
        from tests.test_etl import make_settings

        schema = Schema(
            features=[
                Feature(
                    "customer_id",
                    FeatureKind.CATEGORICAL,
                    FeatureFamily.QUERY,
                    embedding_size=4,
                    # vocab never built: unexportable
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
            candidate_id_col="article_id",
        )
        settings = dataclasses.replace(
            make_settings(tmp_path),
            savedmodel_dirpath=str(tmp_path / "savedmodel"),
        )
        schema.save(settings.schema_dirpath)
        # note: no shards were written — the validation must trip
        # before the runner ever opens a dataset (a later failure
        # would surface as FileNotFoundError, not this ValueError)
        with pytest.raises(ValueError, match="vocab"):
            modelling_runner(settings)
