"""Numerical parity against the ACTUAL TensorFlow reference math.

The strongest parity evidence available without the Kaggle dataset: build
the reference's model in TF with the reference's exact train-step
semantics (ref: pkg/modelling/models/two_tower_model.py:94-124 — in-batch
negatives, identity labels, SUM-reduced softmax CE; logQ correction per
ref: pkg/modelling/layers/logq_correction.py:44-71; Adagrad compile per
ref: pkg/modelling/runner.py:71-83), copy ONE set of initial weights into
both frameworks, drive both with IDENTICAL int-id batches, and assert
per-step loss, gradients, and updated parameters agree to fp32 tolerance
— then that end-to-end Recall@K over the trained towers matches
(ref: pkg/modelling/metrics/index_recall.py:52-59).

Skipped when TensorFlow is not installed.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hm_retrieval_tpu.models import (  # noqa: E402
    OptimizerFactory,
    TwoTowerModel,
    create_train_state,
    make_train_step,
)
from hm_retrieval_tpu.schema import (  # noqa: E402
    Feature,
    FeatureFamily,
    FeatureKind,
)

# Small reference-shaped problem: categorical + numeric query features,
# two categorical candidate features, one hidden layer per tower.
V_CUST, V_ART, V_PTYPE = 50, 30, 10
E_CUST, E_ART, E_PTYPE = 8, 8, 4
HIDDEN, JOINT = 32, 16
B, STEPS, LR = 32, 6, 0.05


def _cat(name, family, emb, V):
    return Feature(
        name,
        FeatureKind.CATEGORICAL,
        family,
        embedding_size=emb,
        vocab=np.array([f"{name}_{i}" for i in range(V)]),
    )


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    logq = np.zeros(V_ART + 1, np.float32)
    # Zipf-ish sampling probs; logq[0] = 0 (OOV subtracts log(1),
    # ref: logq_correction.py:32-42 default_value=1.0)
    p = 1.0 / np.arange(1, V_ART + 1) ** 1.1
    logq[1:] = np.log(p / p.sum()).astype(np.float32)

    model = TwoTowerModel(
        query_features=[
            _cat("customer_id", FeatureFamily.QUERY, E_CUST, V_CUST),
            Feature("age", FeatureKind.NUMERIC, FeatureFamily.QUERY),
        ],
        candidate_features=[
            _cat("article_id", FeatureFamily.CANDIDATE, E_ART, V_ART),
            _cat(
                "product_type_name",
                FeatureFamily.CANDIDATE,
                E_PTYPE,
                V_PTYPE,
            ),
        ],
        candidate_id_col="article_id",
        joint_embedding_size=JOINT,
        query_tower_units=[HIDDEN],
        candidate_tower_units=[HIDDEN],
        logq=logq,
    )
    # host copies: the donated train step consumes device buffers, and
    # this fixture is shared across tests
    params = jax.tree.map(np.asarray, model.init_params(seed=0))

    batches = [
        {
            "customer_id": rng.integers(0, V_CUST + 1, B).astype(
                np.int32
            ),
            "age": rng.normal(0, 1, B).astype(np.float32),
            "article_id": rng.integers(0, V_ART + 1, B).astype(
                np.int32
            ),
            "product_type_name": rng.integers(0, V_PTYPE + 1, B).astype(
                np.int32
            ),
        }
        for _ in range(STEPS)
    ]
    return model, params, logq, batches


class TFReference:
    """The reference model rebuilt in TF from its published semantics
    (NOT a Keras subclass — raw variables keep the weight mapping to the
    JAX pytree explicit). Same math as ref: two_tower_model.py:65-124 +
    tower.py:36-49 (all-ReLU stack) + input_layer.py:61-69 (concat,
    numeric passthrough)."""

    def __init__(self, params, logq):
        def v(x):
            return tf.Variable(np.asarray(x, np.float32))

        qt, ct = params["query_tower"], params["candidate_tower"]
        self.emb_cust = v(qt["embeddings"]["customer_id"])
        self.emb_art = v(ct["embeddings"]["article_id"])
        self.emb_ptype = v(ct["embeddings"]["product_type_name"])
        self.q_dense = [
            (v(l["w"]), v(l["b"])) for l in qt["dense"]
        ]
        self.c_dense = [
            (v(l["w"]), v(l["b"])) for l in ct["dense"]
        ]
        self.logq = tf.constant(logq)
        # ref compile: legacy Adagrad lr=0.05 (runner.py:71-83);
        # Keras Adagrad defaults initial_accumulator_value=0.1 eps=1e-7
        self.opt = tf.keras.optimizers.Adagrad(
            learning_rate=LR,
            initial_accumulator_value=0.1,
            epsilon=1e-7,
        )

    @property
    def trainables(self):
        out = [self.emb_cust, self.emb_art, self.emb_ptype]
        for w, b in self.q_dense + self.c_dense:
            out += [w, b]
        return out

    def query_tower(self, cust, age):
        x = tf.concat(
            [
                tf.nn.embedding_lookup(self.emb_cust, cust),
                age[:, None],
            ],
            axis=1,
        )
        for w, b in self.q_dense:
            x = tf.nn.relu(x @ w + b)
        return x

    def candidate_tower(self, art, ptype):
        x = tf.concat(
            [
                tf.nn.embedding_lookup(self.emb_art, art),
                tf.nn.embedding_lookup(self.emb_ptype, ptype),
            ],
            axis=1,
        )
        for w, b in self.c_dense:
            x = tf.nn.relu(x @ w + b)
        return x

    def loss(self, batch):
        q = self.query_tower(batch["customer_id"], batch["age"])
        c = self.candidate_tower(
            batch["article_id"], batch["product_type_name"]
        )
        logits = tf.matmul(q, c, transpose_b=True)
        # logQ: ids transposed to the column axis, broadcast over rows
        # (ref: logq_correction.py:65-71)
        logits -= tf.gather(self.logq, batch["article_id"])[None, :]
        labels = tf.eye(tf.shape(logits)[0])
        return tf.reduce_sum(
            tf.nn.softmax_cross_entropy_with_logits(
                labels=labels, logits=logits
            )
        )

    def loss_and_grads(self, batch):
        batch = {
            k: tf.constant(v) for k, v in batch.items()
        }
        with tf.GradientTape() as tape:
            loss = self.loss(batch)
        grads = tape.gradient(loss, self.trainables)
        return loss, [tf.convert_to_tensor(g) for g in grads]

    def step(self, batch):
        loss, grads = self.loss_and_grads(batch)
        self.opt.apply_gradients(zip(grads, self.trainables))
        return loss


def _grad_leaves(grads):
    """JAX grad pytree -> list ordered like TFReference.trainables."""
    qt, ct = grads["query_tower"], grads["candidate_tower"]
    out = [
        qt["embeddings"]["customer_id"],
        ct["embeddings"]["article_id"],
        ct["embeddings"]["product_type_name"],
    ]
    for l in qt["dense"] + ct["dense"]:
        out += [l["w"], l["b"]]
    return out


class TestTrainStepParity:
    def test_loss_gradients_and_updates_match(self, setup):
        """>= 5 coupled optimization steps: loss, every gradient leaf,
        and the updated parameters agree with the TF reference to fp32
        tolerance at every step (logQ on)."""
        model, params, logq, batches = setup
        ref = TFReference(params, logq)

        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": LR}
        )
        state = create_train_state(model, opt, seed=0)
        state = state._replace(params=jax.device_put(params))
        step_fn = make_train_step(model, opt)
        grad_fn = jax.jit(jax.value_and_grad(model.loss))

        for step, batch in enumerate(batches):
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            loss_j, grads_j = grad_fn(state.params, jb)
            loss_t, grads_t = ref.loss_and_grads(batch)
            np.testing.assert_allclose(
                float(loss_j),
                float(loss_t),
                rtol=1e-5,
                err_msg=f"loss diverged at step {step}",
            )
            for gj, gt in zip(_grad_leaves(grads_j), grads_t):
                np.testing.assert_allclose(
                    np.asarray(gj),
                    gt.numpy(),
                    rtol=1e-4,
                    atol=1e-5,
                    err_msg=f"gradient diverged at step {step}",
                )
            # advance BOTH optimizers and keep comparing on the
            # updated weights — catches optimizer-formula drift too
            state, _ = step_fn(state, jb)
            ref.step(batch)

        for pj, pt in zip(
            _grad_leaves(state.params), ref.trainables
        ):
            np.testing.assert_allclose(
                np.asarray(pj),
                pt.numpy(),
                rtol=1e-4,
                atol=1e-6,
                err_msg=f"params diverged after {STEPS} steps",
            )

    def test_recall_at_k_matches_end_to_end(self, setup):
        """After coupled training, Recall@K computed by our
        BruteForceIndex + IndexRecall equals the recall computed from
        the TF reference's top_k over the TF towers
        (ref: brute_force.py:75-83 + index_recall.py:52-59)."""
        from hm_retrieval_tpu.indices import BruteForceIndex
        from hm_retrieval_tpu.metrics.index_recall import IndexRecall

        model, params, logq, batches = setup
        ref = TFReference(params, logq)
        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": LR}
        )
        state = create_train_state(model, opt, seed=0)
        state = state._replace(params=jax.device_put(params))
        step_fn = make_train_step(model, opt)
        for batch in batches:
            state, _ = step_fn(
                state, {k: jnp.asarray(v) for k, v in batch.items()}
            )
            ref.step(batch)

        # catalog: every article id with a deterministic product type
        art = np.arange(1, V_ART + 1, dtype=np.int32)
        ptype = (art % V_PTYPE + 1).astype(np.int32)
        ks = (5, 10)

        # --- ours ---
        cand = model.candidate_forward(
            state.params,
            {
                "article_id": jnp.asarray(art),
                "product_type_name": jnp.asarray(ptype),
            },
        )
        index = BruteForceIndex(
            max(ks), art, np.asarray(cand), method="full"
        )
        metric = IndexRecall(list(ks))
        test_batch = batches[-1]
        q = model.query_forward(
            state.params,
            {
                "customer_id": jnp.asarray(test_batch["customer_id"]),
                "age": jnp.asarray(test_batch["age"]),
            },
        )
        _, got_ids = index.topk_from_embeddings(q)
        metric.update(got_ids, jnp.asarray(test_batch["article_id"]))
        ours = metric.results()

        # --- TF reference ---
        c_t = ref.candidate_tower(
            tf.constant(art), tf.constant(ptype)
        )
        q_t = ref.query_tower(
            tf.constant(test_batch["customer_id"]),
            tf.constant(test_batch["age"]),
        )
        scores = tf.matmul(q_t, c_t, transpose_b=True)
        _, idx = tf.math.top_k(scores, max(ks))
        retrieved = tf.gather(tf.constant(art), idx).numpy()
        true_ids = test_batch["article_id"][:, None]
        for k in ks:
            hits = (
                (retrieved[:, :k] == true_ids).any(axis=1).sum()
            )
            tf_recall = hits / B
            assert ours[k] == pytest.approx(tf_recall, abs=1e-9), k