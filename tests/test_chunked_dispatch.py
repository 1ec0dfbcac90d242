"""Chunked dispatch (steps_per_dispatch): K train steps per device
round trip must be numerically IDENTICAL to the per-step loop on the
same batches in the same order (data/device_feed.py::chunk_batches +
make_chunked_train_step; the lever for slow dispatch paths,
BASELINE.md pipeline-fed section)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hm_retrieval_tpu.data.device_feed import (
    chunk_batches,
    device_feed,
    device_feed_chunked,
    make_chunked_train_step,
)
from hm_retrieval_tpu.models import OptimizerFactory
from hm_retrieval_tpu.models.sparse_optimizer import (
    create_sparse_train_state,
    make_sparse_train_step,
)
from hm_retrieval_tpu.models.two_tower import TwoTowerModel
from hm_retrieval_tpu.parallel import make_mesh
from hm_retrieval_tpu.schema import (
    Feature,
    FeatureFamily,
    FeatureKind,
)


@pytest.fixture
def model():
    return TwoTowerModel(
        query_features=[
            Feature(
                "customer_id",
                FeatureKind.CATEGORICAL,
                FeatureFamily.QUERY,
                embedding_size=8,
                vocab=np.array([f"c{i}" for i in range(50)]),
            )
        ],
        candidate_features=[
            Feature(
                "article_id",
                FeatureKind.CATEGORICAL,
                FeatureFamily.CANDIDATE,
                embedding_size=8,
                vocab=np.array([f"a{i}" for i in range(30)]),
            )
        ],
        candidate_id_col="article_id",
        joint_embedding_size=8,
        query_tower_units=[16],
        candidate_tower_units=[16],
    )


def _batches(rng, n, b):
    return [
        {
            "customer_id": rng.integers(0, 51, b).astype(np.int32),
            "article_id": rng.integers(0, 31, b).astype(np.int32),
        }
        for _ in range(n)
    ]


def test_chunk_batches_stacks_and_drops_tail(rng):
    bs = _batches(rng, 7, 4)
    chunks = list(chunk_batches(iter(bs), 3))
    assert len(chunks) == 2  # 7 batches -> 2 full chunks, tail dropped
    assert chunks[0]["customer_id"].shape == (3, 4)
    np.testing.assert_array_equal(
        chunks[1]["article_id"][2], bs[5]["article_id"]
    )


def test_chunked_step_matches_per_step(model, rng):
    opt = OptimizerFactory.get_optimizer(
        "adagrad", {"learning_rate": 0.05}
    )
    step = make_sparse_train_step(model, opt, 0.05)
    bs = _batches(rng, 6, 8)

    s_ref = create_sparse_train_state(model, opt, seed=0)
    ref_losses = []
    for b in bs:
        s_ref, m = step(
            s_ref, {k: jnp.asarray(v) for k, v in b.items()}
        )
        ref_losses.append(float(m["loss"]))

    chunk_fn = make_chunked_train_step(step)
    s_chk = create_sparse_train_state(model, opt, seed=0)
    losses = []
    for chunk in chunk_batches(iter(bs), 3):
        s_chk, m = chunk_fn(
            s_chk, {k: jnp.asarray(v) for k, v in chunk.items()}
        )
        losses.extend(float(x) for x in np.asarray(m["losses"]))
        assert float(m["loss"]) == losses[-1]

    np.testing.assert_allclose(losses, ref_losses, rtol=1e-6)
    for a, b in zip(
        jax.tree.leaves(s_ref.params), jax.tree.leaves(s_chk.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )


def test_chunked_matches_per_step_on_mesh(model, rng):
    """DP mesh path: stacked super-batches sharded P(None, 'data')
    through the shard_map step inside the scan == per-step feeding."""
    from hm_retrieval_tpu.parallel import (
        make_dp_sparse_train_step,
        replicate_sparse_state,
    )

    mesh = make_mesh()  # 8 fake devices, data axis
    opt = OptimizerFactory.get_optimizer(
        "adagrad", {"learning_rate": 0.05}
    )
    step = make_dp_sparse_train_step(model, opt, 0.05, mesh)
    bs = _batches(rng, 4, 16)

    s_ref = replicate_sparse_state(
        create_sparse_train_state(model, opt, seed=0), mesh
    )
    ref_losses = []
    for db in device_feed(iter(bs), mesh=mesh):
        s_ref, m = step(s_ref, db)
        ref_losses.append(float(m["loss"]))

    chunk_fn = make_chunked_train_step(step)
    s_chk = replicate_sparse_state(
        create_sparse_train_state(model, opt, seed=0), mesh
    )
    losses = []
    for chunk in device_feed_chunked(iter(bs), 2, mesh=mesh):
        assert chunk["customer_id"].shape == (2, 16)
        s_chk, m = chunk_fn(s_chk, chunk)
        losses.extend(float(x) for x in np.asarray(m["losses"]))

    np.testing.assert_allclose(losses, ref_losses, rtol=1e-5)
    for a, b in zip(
        jax.tree.leaves(s_ref.params), jax.tree.leaves(s_chk.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_runner_chunked_dispatch_end_to_end(tmp_path, rng):
    """modelling_runner with steps_per_dispatch > 1 trains and reaches
    the same recall trajectory class as the per-step loop (identical
    numerics are covered above; this drives the wiring)."""
    import dataclasses

    from tests.test_runners import pipeline  # noqa: F401

    # build a tiny self-contained pipeline rather than reusing the
    # module fixture (we need a different TrainingConfig)
    from hm_retrieval_tpu.etl.runner import (
        build_schema_runner,
        etl_runner,
    )
    from hm_retrieval_tpu.data.runner import shard_writer_runner
    from hm_retrieval_tpu.runners import modelling_runner
    from hm_retrieval_tpu.schema import (
        ModelConfig,
        Schema,
        TrainingConfig,
    )
    from hm_retrieval_tpu.utils.settings import Settings
    from hm_retrieval_tpu.utils.synthetic import (
        generate_hm_like_csvs,
    )

    d = str(tmp_path)
    raw = generate_hm_like_csvs(
        f"{d}/raw",
        n_transactions=3000,
        n_customers=150,
        n_articles=60,
        seed=3,
    )
    settings = Settings(
        transactions_filepath=raw["transactions"],
        articles_filepath=raw["articles"],
        customers_filepath=raw["customers"],
        train_start_date=raw["train_start"],
        train_end_date=raw["train_end"],
        test_start_date=raw["test_start"],
        test_end_date=raw["test_end"],
        train_data_filepath=f"{d}/p/train.parquet",
        test_data_filepath=f"{d}/p/test.parquet",
        schema_dirpath=f"{d}/schema",
        train_shards_dirpath=f"{d}/shards/train",
        test_shards_dirpath=f"{d}/shards/test",
        candidate_shards_dirpath=f"{d}/shards/candidates",
        model_dirpath=f"{d}/artifacts/model",
        index_dirpath=f"{d}/artifacts/index",
        baseline_index_dirpath=f"{d}/artifacts/baseline",
        checkpoint_dirpath=f"{d}/artifacts/ckpt",
        tensorboard_logs_dir=None,
        profile_steps=None,
    )
    schema = Schema(
        features=[
            Feature(
                "customer_id",
                FeatureKind.CATEGORICAL,
                FeatureFamily.QUERY,
                embedding_size=8,
            ),
            Feature(
                "article_id",
                FeatureKind.CATEGORICAL,
                FeatureFamily.CANDIDATE,
                embedding_size=8,
            ),
        ],
        model_config=ModelConfig(
            joint_embedding_size=8, ks=[10]
        ),
        training_config=TrainingConfig(
            train_batch_size=32,
            test_batch_size=64,
            candidate_batch_size=32,
            epochs=2,
            steps_per_dispatch=4,
            optimizer_kwargs={"learning_rate": 0.05},
        ),
        candidate_id_col="article_id",
    )
    etl_runner(settings)
    build_schema_runner(settings, schema)
    shard_writer_runner(settings)
    results = modelling_runner(settings)
    assert results["final"][10] > results["initial"][10]


def test_training_config_roundtrip_steps_per_dispatch():
    from hm_retrieval_tpu.schema import TrainingConfig

    tc = TrainingConfig(
        steps_per_dispatch=8,
        optimizer_kwargs={"learning_rate": 0.05},
    )
    assert (
        TrainingConfig.from_dict(tc.to_dict()).steps_per_dispatch
        == 8
    )
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        TrainingConfig(
            steps_per_dispatch=0,
            optimizer_kwargs={"learning_rate": 0.05},
        )
