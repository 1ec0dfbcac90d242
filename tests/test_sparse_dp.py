"""Data-parallel sparse Adagrad must match the single-device sparse step
(which itself has exact dense parity, tests/test_sparse_optimizer.py) on
the same GLOBAL batch — 8 fake CPU devices, no tolerance loosening."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hm_retrieval_tpu.models import OptimizerFactory, TwoTowerModel
from hm_retrieval_tpu.models.sparse_optimizer import (
    create_sparse_train_state,
    make_sparse_train_step,
)
from hm_retrieval_tpu.parallel import (
    make_dp_sparse_train_step,
    make_mesh,
    replicate_sparse_state,
    shard_batch,
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


def make_batches(rng, n, B):
    return [
        {
            "uid": rng.integers(0, 41, B).astype(np.int32),
            "age": rng.normal(0, 1, B).astype(np.float32),
            "article_id": rng.integers(0, 31, B).astype(np.int32),
        }
        for _ in range(n)
    ]


def run_single(model, batches, lr=0.05):
    opt = OptimizerFactory.get_optimizer(
        "adagrad", {"learning_rate": lr}
    )
    state = create_sparse_train_state(model, opt, seed=0)
    step = make_sparse_train_step(model, opt, lr)
    losses = []
    for b in batches:
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        state, m = step(state, jb)
        losses.append(float(m["loss"]))
    return state, losses


def run_dp(model, batches, lr=0.05):
    mesh = make_mesh()
    opt = OptimizerFactory.get_optimizer(
        "adagrad", {"learning_rate": lr}
    )
    state = replicate_sparse_state(
        create_sparse_train_state(model, opt, seed=0), mesh
    )
    step = make_dp_sparse_train_step(model, opt, lr, mesh)
    losses = []
    for b in batches:
        state, m = step(state, shard_batch(b, mesh))
        losses.append(float(m["loss"]))
    return state, losses


def assert_states_match(a, b):
    for tower in ("query_tower", "candidate_tower"):
        for name, table in a.params[tower]["embeddings"].items():
            np.testing.assert_allclose(
                np.asarray(table),
                np.asarray(b.params[tower]["embeddings"][name]),
                rtol=1e-5,
                atol=1e-7,
                err_msg=f"{tower}/{name}",
            )
        for x, y in zip(
            jax.tree.leaves(a.params[tower]["dense"]),
            jax.tree.leaves(b.params[tower]["dense"]),
        ):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7
            )
        for name, acc in a.sparse_state.accumulators[tower].items():
            np.testing.assert_allclose(
                np.asarray(acc),
                np.asarray(
                    b.sparse_state.accumulators[tower][name]
                ),
                rtol=1e-5,
                atol=1e-7,
                err_msg=f"acc {tower}/{name}",
            )


class TestDpSparseMatchesSingle:
    def test_multi_step_parity(self, model, rng):
        batches = make_batches(rng, 4, 32)
        s_state, s_losses = run_single(model, batches)
        d_state, d_losses = run_dp(model, batches)
        np.testing.assert_allclose(s_losses, d_losses, rtol=1e-5)
        assert_states_match(s_state, d_state)

    def test_cross_shard_duplicate_ids(self, model):
        # the same id appears on MULTIPLE shards (B=32 over 8 devices
        # => shard size 4; id 5 spans every shard): the sum-then-square
        # Adagrad semantics must still match the single-device step
        B = 32
        batch = {
            "uid": np.full(B, 3, np.int32),
            "age": np.linspace(-1, 1, B).astype(np.float32),
            "article_id": np.where(
                np.arange(B) % 2 == 0, 5, 2
            ).astype(np.int32),
        }
        s_state, s_losses = run_single(model, [batch])
        d_state, d_losses = run_dp(model, [batch])
        np.testing.assert_allclose(s_losses, d_losses, rtol=1e-6)
        assert_states_match(s_state, d_state)

    def test_sequence_feature_parity(self, rng):
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
                "history": rng.integers(0, 21, (16, 4)).astype(
                    np.int32
                ),
                "article_id": rng.integers(1, 21, 16).astype(
                    np.int32
                ),
            }
            for _ in range(3)
        ]
        s_state, s_losses = run_single(model, batches)
        d_state, d_losses = run_dp(model, batches)
        np.testing.assert_allclose(s_losses, d_losses, rtol=1e-5)
        assert_states_match(s_state, d_state)
