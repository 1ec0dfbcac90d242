"""Sparse embedding Adagrad must match the dense step exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hm_retrieval_tpu.models import (
    OptimizerFactory,
    TwoTowerModel,
    create_train_state,
    make_train_step,
)
from hm_retrieval_tpu.models.sparse_optimizer import (
    create_sparse_train_state,
    make_sparse_train_step,
)
from hm_retrieval_tpu.schema import Feature, FeatureFamily, FeatureKind


def cat(name, family, emb, V):
    return Feature(
        name,
        FeatureKind.CATEGORICAL,
        family,
        embedding_size=emb,
        vocab=np.array([f"{name}_{i}" for i in range(V)]),
    )


@pytest.fixture
def model():
    logq = np.zeros(31, np.float32)
    logq[1:] = np.log(np.linspace(0.3, 0.01, 30))
    return TwoTowerModel(
        query_features=[
            cat("uid", FeatureFamily.QUERY, 8, 40),
            Feature("age", FeatureKind.NUMERIC, FeatureFamily.QUERY),
        ],
        candidate_features=[
            cat("article_id", FeatureFamily.CANDIDATE, 8, 30),
        ],
        candidate_id_col="article_id",
        joint_embedding_size=16,
        query_tower_units=[32],
        logq=logq,
    )


def run_both(model, batches, lr=0.05, steps=5):
    opt = OptimizerFactory.get_optimizer(
        "adagrad", {"learning_rate": lr}
    )
    dense_state = create_train_state(model, opt, seed=0)
    dense_step = make_train_step(model, opt)
    sparse_state = create_sparse_train_state(model, opt, seed=0)
    sparse_step = make_sparse_train_step(model, opt, lr)
    d_losses, s_losses = [], []
    for b in batches[:steps]:
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        dense_state, md = dense_step(dense_state, jb)
        sparse_state, ms = sparse_step(sparse_state, jb)
        d_losses.append(float(md["loss"]))
        s_losses.append(float(ms["loss"]))
    return dense_state, sparse_state, d_losses, s_losses


class TestSparseMatchesDense:
    def test_params_match_after_steps(self, model, rng):
        batches = [
            {
                "uid": rng.integers(0, 41, 16).astype(np.int32),
                "age": rng.normal(0, 1, 16).astype(np.float32),
                "article_id": rng.integers(0, 31, 16).astype(
                    np.int32
                ),
            }
            for _ in range(5)
        ]
        dense_state, sparse_state, dl, sl = run_both(
            model, batches
        )
        np.testing.assert_allclose(dl, sl, rtol=1e-5)
        for tower in ("query_tower", "candidate_tower"):
            for name, table in dense_state.params[tower][
                "embeddings"
            ].items():
                np.testing.assert_allclose(
                    np.asarray(table),
                    np.asarray(
                        sparse_state.params[tower]["embeddings"][
                            name
                        ]
                    ),
                    rtol=1e-5,
                    atol=1e-7,
                    err_msg=f"{tower}/{name}",
                )
            for a, b in zip(
                jax.tree.leaves(dense_state.params[tower]["dense"]),
                jax.tree.leaves(
                    sparse_state.params[tower]["dense"]
                ),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5,
                    atol=1e-7,
                )

    def test_heavy_duplicate_ids(self, model, rng):
        # every row hits the same two ids: the duplicate-sum-then-square
        # semantics must still match dense
        batches = [
            {
                "uid": np.array([3, 3, 3, 7, 7, 3], np.int32),
                "age": rng.normal(0, 1, 6).astype(np.float32),
                "article_id": np.array(
                    [5, 5, 5, 5, 2, 2], np.int32
                ),
            }
        ]
        dense_state, sparse_state, dl, sl = run_both(
            model, batches, steps=1
        )
        np.testing.assert_allclose(dl, sl, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(
                dense_state.params["candidate_tower"][
                    "embeddings"
                ]["article_id"]
            ),
            np.asarray(
                sparse_state.params["candidate_tower"][
                    "embeddings"
                ]["article_id"]
            ),
            rtol=1e-5,
            atol=1e-7,
        )

    def test_untouched_rows_unchanged(self, model, rng):
        batches = [
            {
                "uid": np.array([1, 2], np.int32),
                "age": np.zeros(2, np.float32),
                "article_id": np.array([1, 2], np.int32),
            }
        ]
        _, sparse_state, _, _ = run_both(model, batches, steps=1)
        fresh = create_sparse_train_state(
            model,
            OptimizerFactory.get_optimizer(
                "adagrad", {"learning_rate": 0.05}
            ),
            seed=0,
        )
        before = np.asarray(
            fresh.params["query_tower"]["embeddings"]["uid"]
        )
        after = np.asarray(
            sparse_state.params["query_tower"]["embeddings"]["uid"]
        )
        np.testing.assert_array_equal(before[10:], after[10:])
        assert not np.array_equal(before[1], after[1])


class TestSparseSequence:
    def test_sequence_table_matches_dense(self, rng):
        vocab = np.array([f"a{i}" for i in range(20)])
        model = TwoTowerModel(
            query_features=[
                Feature(
                    "history",
                    FeatureKind.SEQUENCE,
                    FeatureFamily.QUERY,
                    embedding_size=8,
                    max_len=4,
                    vocab=vocab,
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
            joint_embedding_size=8,
        )
        batches = [
            {
                "history": rng.integers(0, 21, (8, 4)).astype(
                    np.int32
                ),
                "article_id": rng.integers(1, 21, 8).astype(
                    np.int32
                ),
            }
            for _ in range(3)
        ]
        dense_state, sparse_state, dl, sl = run_both(
            model, batches, steps=3
        )
        np.testing.assert_allclose(dl, sl, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(
                dense_state.params["query_tower"]["embeddings"][
                    "history"
                ]
            ),
            np.asarray(
                sparse_state.params["query_tower"]["embeddings"][
                    "history"
                ]
            ),
            rtol=1e-5,
            atol=1e-7,
        )
