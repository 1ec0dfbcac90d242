"""Row-sharded sparse Adagrad (data x model mesh) must match the
single-device sparse step (which itself has exact dense parity) on the
same GLOBAL batch — fake 8-device CPU mesh, no tolerance loosening."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hm_retrieval_tpu.models import OptimizerFactory, TwoTowerModel
from hm_retrieval_tpu.models.sparse_optimizer import (
    create_sparse_train_state,
    make_sparse_train_step,
)
from hm_retrieval_tpu.parallel import make_mesh, shard_batch
from hm_retrieval_tpu.parallel.sharded_sparse_training import (
    create_sharded_sparse_state,
    make_sharded_sparse_train_step,
    unpad_params,
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
            # 41 rows: NOT divisible by 4 or 8 -> exercises row padding
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


def run_sharded(
    model, batches, sharded_features, data, model_axis, lr=0.05
):
    mesh = make_mesh(data=data, model=model_axis)
    opt = OptimizerFactory.get_optimizer(
        "adagrad", {"learning_rate": lr}
    )
    state = create_sharded_sparse_state(
        model, opt, mesh, sharded_features, seed=0
    )
    step = make_sharded_sparse_train_step(
        model, opt, lr, mesh, sharded_features
    )
    losses = []
    for b in batches:
        state, m = step(state, shard_batch(b, mesh))
        losses.append(float(m["loss"]))
    return state, losses


def assert_matches_single(model, s_state, sh_state, sharded):
    sh_params = unpad_params(sh_state.params, model)
    for tower in ("query_tower", "candidate_tower"):
        for name, table in s_state.params[tower][
            "embeddings"
        ].items():
            np.testing.assert_allclose(
                np.asarray(table),
                np.asarray(sh_params[tower]["embeddings"][name]),
                rtol=1e-5,
                atol=1e-7,
                err_msg=f"{tower}/{name}",
            )
        for x, y in zip(
            jax.tree.leaves(s_state.params[tower]["dense"]),
            jax.tree.leaves(sh_state.params[tower]["dense"]),
        ):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7
            )
        for name, acc in s_state.sparse_state.accumulators[
            tower
        ].items():
            got = np.asarray(
                sh_state.sparse_state.accumulators[tower][name]
            )[: acc.shape[0]]
            np.testing.assert_allclose(
                np.asarray(acc),
                got,
                rtol=1e-5,
                atol=1e-7,
                err_msg=f"acc {tower}/{name}",
            )


class TestShardedSparseMatchesSingle:
    @pytest.mark.parametrize(
        "data,model_axis", [(2, 4), (1, 8), (4, 2)]
    )
    def test_multi_step_parity(self, model, rng, data, model_axis):
        sharded = ["uid", "article_id"]
        batches = make_batches(rng, 3, 32)
        s_state, s_losses = run_single(model, batches)
        sh_state, sh_losses = run_sharded(
            model, batches, sharded, data, model_axis
        )
        np.testing.assert_allclose(s_losses, sh_losses, rtol=1e-5)
        assert_matches_single(model, s_state, sh_state, sharded)

    def test_mixed_sharded_and_replicated_tables(self, model, rng):
        # only the big table sharded; the other stays replicated
        sharded = ["uid"]
        batches = make_batches(rng, 2, 32)
        s_state, _ = run_single(model, batches)
        sh_state, _ = run_sharded(model, batches, sharded, 2, 4)
        assert_matches_single(model, s_state, sh_state, sharded)
        # layout check: uid table padded + sharded, article replicated
        uid = sh_state.params["query_tower"]["embeddings"]["uid"]
        assert uid.shape[0] % 4 == 0 and uid.shape[0] >= 41
        art = sh_state.params["candidate_tower"]["embeddings"][
            "article_id"
        ]
        assert art.shape[0] == 31

    def test_cross_shard_duplicate_ids(self, model):
        # the same id appears on MULTIPLE data shards AND its row lives
        # on one model shard: sum-before-square must still hold
        B = 32
        batch = {
            "uid": np.full(B, 3, np.int32),
            "age": np.linspace(-1, 1, B).astype(np.float32),
            "article_id": np.where(
                np.arange(B) % 2 == 0, 5, 2
            ).astype(np.int32),
        }
        s_state, s_losses = run_single(model, [batch])
        sh_state, sh_losses = run_sharded(
            model, [batch], ["uid", "article_id"], 2, 4
        )
        np.testing.assert_allclose(s_losses, sh_losses, rtol=1e-6)
        assert_matches_single(
            model, s_state, sh_state, ["uid", "article_id"]
        )

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
        sh_state, sh_losses = run_sharded(
            model, batches, ["history", "article_id"], 2, 4
        )
        np.testing.assert_allclose(s_losses, sh_losses, rtol=1e-5)
        assert_matches_single(
            model, s_state, sh_state, ["history", "article_id"]
        )

    def test_unknown_feature_rejected(self, model):
        mesh = make_mesh(data=2, model=4)
        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": 0.05}
        )
        with pytest.raises(ValueError, match="embedding-table"):
            make_sharded_sparse_train_step(
                model, opt, 0.05, mesh, ["nope"]
            )
