"""Model-core tests: logQ golden values (mirrors the reference's
tests/test_layers.py:26-39), tower shapes, loss math, and train-step
convergence (SURVEY §4 gap: the reference never tested train_step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hm_retrieval_tpu.models import (
    OptimizerFactory,
    TwoTowerModel,
    apply_logq_correction,
    create_train_state,
    embedding_output_dim,
    init_tower_params,
    make_train_step,
    tower_forward,
)
from hm_retrieval_tpu.schema import Feature, FeatureFamily, FeatureKind


def cat(name, family, emb, vocab_size):
    return Feature(
        name,
        FeatureKind.CATEGORICAL,
        family,
        embedding_size=emb,
        vocab=np.array([f"{name}_{i}" for i in range(vocab_size)]),
    )


@pytest.fixture
def model():
    return TwoTowerModel(
        query_features=[
            cat("customer_id", FeatureFamily.QUERY, 8, 20),
            Feature("age", FeatureKind.NUMERIC, FeatureFamily.QUERY),
        ],
        candidate_features=[
            cat("article_id", FeatureFamily.CANDIDATE, 8, 10),
            cat("product_type", FeatureFamily.CANDIDATE, 4, 5),
        ],
        candidate_id_col="article_id",
        joint_embedding_size=16,
        query_tower_units=[32],
        candidate_tower_units=None,
    )


def make_batch(rng, B, model):
    # Numeric features standardized — raw-scale numerics (e.g. age 18..70)
    # saturate the final-ReLU towers and collapse training to uniform
    # logits; see docs note in models/tower.py.
    return {
        "customer_id": rng.integers(0, 21, B).astype(np.int32),
        "age": rng.normal(0, 1, B).astype(np.float32),
        "article_id": rng.integers(0, 11, B).astype(np.int32),
        "product_type": rng.integers(0, 6, B).astype(np.int32),
    }


class TestLogQCorrection:
    def test_golden_values(self):
        # Mirrors the reference fixture: 3x3 logits, probs per column
        # candidate, expected = logits - log(prob) broadcast over rows
        # (ref: tests/test_layers.py:7-39).
        logits = jnp.arange(9.0).reshape(3, 3)
        logq = jnp.log(jnp.array([1.0, 0.5, 0.25, 0.125]))
        logq = logq.at[0].set(0.0)
        ids = jnp.array([1, 2, 3], dtype=jnp.int32)
        out = apply_logq_correction(logits, ids, logq)
        expected = np.arange(9.0).reshape(3, 3) - np.log(
            [0.5, 0.25, 0.125]
        )
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_oov_id_subtracts_nothing(self):
        logits = jnp.ones((2, 2))
        logq = jnp.array([0.0, np.log(0.5)])
        out = apply_logq_correction(
            logits, jnp.array([0, 1], jnp.int32), logq
        )
        np.testing.assert_allclose(out[:, 0], 1.0)
        np.testing.assert_allclose(out[:, 1], 1.0 - np.log(0.5))


class TestTower:
    def test_output_shape_and_concat_dim(self, model, rng):
        feats = model.query_features
        assert embedding_output_dim(feats) == 8 + 1
        params = init_tower_params(
            jax.random.PRNGKey(0), feats, 16, [32]
        )
        batch = make_batch(rng, 6, model)
        out = tower_forward(params, feats, batch)
        assert out.shape == (6, 16)
        assert bool(jnp.all(out >= 0))  # final ReLU (ref: tower.py:44-49)

    def test_no_hidden_units(self, model, rng):
        feats = model.candidate_features
        params = init_tower_params(jax.random.PRNGKey(0), feats, 16)
        out = tower_forward(params, feats, make_batch(rng, 3, model))
        assert out.shape == (3, 16)


class TestTwoTowerModel:
    def test_rejects_bad_candidate_id_col(self, model):
        with pytest.raises(ValueError, match="candidate_id_col"):
            TwoTowerModel(
                query_features=model.query_features,
                candidate_features=model.candidate_features,
                candidate_id_col="nope",
                joint_embedding_size=8,
            )

    def test_scores_shape(self, model, rng):
        params = model.init_params(0)
        s = model.scores(params, make_batch(rng, 5, model))
        assert s.shape == (5, 5)

    def test_loss_matches_manual_softmax_ce(self, model, rng):
        params = model.init_params(0)
        batch = make_batch(rng, 4, model)
        loss = model.loss(params, batch)
        logits = np.asarray(model.scores(params, batch))
        logits = logits - np.asarray(model.logq)[
            batch["article_id"]
        ][None, :] if model.logq is not None else logits
        # manual sum-reduced CE with identity labels
        row_lse = np.log(np.exp(logits).sum(axis=1))
        manual = float(np.sum(row_lse - np.diag(logits)))
        np.testing.assert_allclose(float(loss), manual, rtol=1e-5)

    def test_logq_shifts_loss(self, rng):
        base = TwoTowerModel(
            query_features=[cat("uid", FeatureFamily.QUERY, 4, 10)],
            candidate_features=[
                cat("article_id", FeatureFamily.CANDIDATE, 4, 10)
            ],
            candidate_id_col="article_id",
            joint_embedding_size=8,
        )
        logq = np.zeros(11, np.float32)
        logq[1:] = np.log(np.linspace(0.5, 0.05, 10))
        with_logq = TwoTowerModel(
            query_features=base.query_features,
            candidate_features=base.candidate_features,
            candidate_id_col="article_id",
            joint_embedding_size=8,
            logq=logq,
        )
        params = base.init_params(0)
        batch = {
            "uid": rng.integers(0, 11, 4).astype(np.int32),
            "article_id": rng.integers(1, 11, 4).astype(np.int32),
        }
        assert float(base.loss(params, batch)) != pytest.approx(
            float(with_logq.loss(params, batch))
        )


class TestTrainStep:
    def test_loss_decreases(self, model, rng):
        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": 0.05}
        )
        state = create_train_state(model, opt, seed=0)
        step = make_train_step(model, opt)
        batch = {
            k: jnp.asarray(v)
            for k, v in make_batch(rng, 32, model).items()
        }
        losses = []
        for _ in range(200):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.5
        assert int(state.step) == 200

    def test_optimizer_factory_validation(self):
        with pytest.raises(ValueError, match="unknown optimizer"):
            OptimizerFactory.get_optimizer("sgd", {"learning_rate": 1.0})
        with pytest.raises(ValueError, match="learning_rate"):
            OptimizerFactory.get_optimizer("adam", {})
