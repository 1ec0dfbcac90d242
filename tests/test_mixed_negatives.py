"""Mixed-negative training tests (BASELINE config[4])."""

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
from hm_retrieval_tpu.models.mixed_negatives import (
    CandidateCatalog,
    mixed_negatives_loss,
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
        query_features=[cat("uid", FeatureFamily.QUERY, 8, 50)],
        candidate_features=[
            cat("article_id", FeatureFamily.CANDIDATE, 8, 30),
            cat("ptype", FeatureFamily.CANDIDATE, 4, 5),
        ],
        candidate_id_col="article_id",
        joint_embedding_size=16,
        logq=logq,
    )


@pytest.fixture
def catalog(rng):
    return CandidateCatalog(
        {
            "article_id": np.arange(1, 31, dtype=np.int32),
            "ptype": rng.integers(0, 6, 30).astype(np.int32),
        }
    )


def make_batch(rng, B=16):
    return {
        "uid": rng.integers(0, 51, B).astype(np.int32),
        "article_id": rng.integers(1, 31, B).astype(np.int32),
        "ptype": rng.integers(0, 6, B).astype(np.int32),
    }


class TestCandidateCatalog:
    def test_sample_shapes_and_range(self, catalog):
        s = catalog.sample(jax.random.PRNGKey(0), 7)
        assert s["article_id"].shape == (7,)
        assert s["ptype"].shape == (7,)
        assert (np.asarray(s["article_id"]) >= 1).all()
        assert (np.asarray(s["article_id"]) <= 30).all()

    def test_rows_stay_aligned(self, rng):
        cols = {
            "article_id": np.arange(100, dtype=np.int32),
            "ptype": np.arange(100, dtype=np.int32) * 2,
        }
        c = CandidateCatalog(cols)
        s = c.sample(jax.random.PRNGKey(1), 50)
        np.testing.assert_array_equal(
            np.asarray(s["ptype"]),
            np.asarray(s["article_id"]) * 2,
        )

    def test_mismatched_columns_rejected(self):
        with pytest.raises(ValueError, match="share length"):
            CandidateCatalog(
                {
                    "a": np.zeros(3, np.int32),
                    "b": np.zeros(4, np.int32),
                }
            )


class TestMixedNegativesLoss:
    def test_matches_manual_computation(self, model, catalog, rng):
        B, M = 8, 12
        params = model.init_params(0)
        batch = make_batch(rng, B)
        key = jax.random.PRNGKey(42)
        loss = mixed_negatives_loss(
            model, params, batch, catalog, key, M
        )
        # manual
        q = np.asarray(model.query_forward(params, batch))
        c_in = np.asarray(model.candidate_forward(params, batch))
        neg = catalog.sample(key, M)
        c_neg = np.asarray(model.candidate_forward(params, neg))
        li = q @ c_in.T - (
            np.asarray(model.logq)[batch["article_id"]] + np.log(B)
        )
        ln = q @ c_neg.T - np.log(M / 30)
        logits = np.concatenate([li, ln], axis=1)
        lse = np.log(np.exp(logits).sum(axis=1))
        manual = float(np.sum(lse - np.diag(li)))
        np.testing.assert_allclose(float(loss), manual, rtol=1e-4)

    def test_train_step_learns(self, model, catalog, rng):
        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": 0.1}
        )
        state = create_train_state(model, opt, 0)
        step = make_train_step(
            model, opt, catalog=catalog, num_uniform_negatives=8
        )
        batch = {
            k: jnp.asarray(v) for k, v in make_batch(rng).items()
        }
        losses = []
        for _ in range(100):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7

    def test_negatives_change_the_loss(self, model, catalog, rng):
        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": 0.1}
        )
        state = create_train_state(model, opt, 0)
        plain = make_train_step(model, opt)
        mixed = make_train_step(
            model, opt, catalog=catalog, num_uniform_negatives=8
        )
        batch = {
            k: jnp.asarray(v) for k, v in make_batch(rng).items()
        }
        _, m1 = plain(state, batch)
        state2 = create_train_state(model, opt, 0)
        _, m2 = mixed(state2, batch)
        assert float(m1["loss"]) != pytest.approx(
            float(m2["loss"])
        )

    def test_requires_catalog(self, model):
        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": 0.1}
        )
        with pytest.raises(ValueError, match="CandidateCatalog"):
            make_train_step(model, opt, num_uniform_negatives=4)
