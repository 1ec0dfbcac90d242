"""End-to-end runner tests: the five-stage pipeline on tiny synthetic data,
checkpoint/resume, and export round-trip (SURVEY §4 gap: the reference never
tested its runners)."""

import os

import jax
import numpy as np
import pytest

from hm_retrieval_tpu.models import (
    OptimizerFactory,
    TwoTowerModel,
    create_train_state,
    make_train_step,
)
from hm_retrieval_tpu.runners import (
    CheckpointManager,
    baseline_modelling_runner,
    build_schema_runner,
    etl_runner,
    export_model,
    modelling_runner,
    shard_writer_runner,
)
from hm_retrieval_tpu.schema import (
    Feature,
    FeatureFamily,
    FeatureKind,
    ModelConfig,
    Schema,
    TrainingConfig,
)
from hm_retrieval_tpu.utils.pytree_io import (
    load_pytree_npz,
    save_pytree_npz,
)
from hm_retrieval_tpu.utils.settings import Settings
from hm_retrieval_tpu.utils.synthetic import generate_hm_like_csvs

from tests.test_etl import make_settings


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Run the full five-stage pipeline once for this module."""
    d = str(tmp_path_factory.mktemp("pipeline"))
    raw = generate_hm_like_csvs(
        os.path.join(d, "raw"),
        n_transactions=6000,
        n_customers=300,
        n_articles=120,
        seed=1,
    )
    settings = Settings(
        transactions_filepath=raw["transactions"],
        articles_filepath=raw["articles"],
        customers_filepath=raw["customers"],
        train_start_date=raw["train_start"],
        train_end_date=raw["train_end"],
        test_start_date=raw["test_start"],
        test_end_date=raw["test_end"],
        train_data_filepath=f"{d}/processed/train.parquet",
        test_data_filepath=f"{d}/processed/test.parquet",
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
        # several shards per split so multi-process readers
        # (tests/test_multihost.py, up to 4 ranks) can partition them
        max_shard_rows=200,
    )
    schema = Schema(
        features=[
            Feature(
                "customer_id",
                FeatureKind.CATEGORICAL,
                FeatureFamily.QUERY,
                embedding_size=16,
            ),
            Feature(
                "article_id",
                FeatureKind.CATEGORICAL,
                FeatureFamily.CANDIDATE,
                embedding_size=16,
            ),
            Feature(
                "product_type_name",
                FeatureKind.CATEGORICAL,
                FeatureFamily.CANDIDATE,
                embedding_size=4,
            ),
        ],
        model_config=ModelConfig(
            joint_embedding_size=16, ks=[10, 50]
        ),
        training_config=TrainingConfig(
            train_batch_size=128,
            test_batch_size=256,
            candidate_batch_size=64,
            epochs=2,
            shuffle_buffer_size=4096,
            optimizer_kwargs={"learning_rate": 0.05},
        ),
        candidate_id_col="article_id",
    )
    etl_runner(settings)
    build_schema_runner(settings, schema)
    shard_writer_runner(settings)
    results = modelling_runner(settings)
    baseline = baseline_modelling_runner(settings)
    return settings, results, baseline


class TestPipeline:
    def test_training_improves_recall(self, pipeline):
        _, results, _ = pipeline
        assert (
            results["final"][50] > results["initial"][50]
        ), results

    def test_model_beats_random(self, pipeline):
        # random recall@10 over 120 articles ~ 0.083
        _, results, _ = pipeline
        assert results["final"][10] > 0.15

    def test_baseline_computed(self, pipeline):
        _, _, baseline = pipeline
        assert 0.0 < baseline[50] <= 1.0

    def test_artifacts_exist(self, pipeline):
        settings, _, _ = pipeline
        for p in [
            f"{settings.model_dirpath}/two_tower/params.npz",
            f"{settings.model_dirpath}/query_tower/params.npz",
            f"{settings.model_dirpath}/candidate_tower/params.npz",
            f"{settings.index_dirpath}/index.npz",
            f"{settings.baseline_index_dirpath}/identifiers.npy",
        ]:
            assert os.path.exists(p), p

    def test_exported_params_match_live(self, pipeline):
        settings, _, _ = pipeline
        loaded = load_pytree_npz(
            f"{settings.model_dirpath}/two_tower/params.npz"
        )
        assert set(loaded.keys()) == {
            "query_tower",
            "candidate_tower",
        }
        assert isinstance(loaded["query_tower"]["dense"], list)


class TestHistoryPipeline:
    def test_sequence_and_mixed_negative_pipeline(self, tmp_path):
        """configs[3]+[4]: history ETL -> sequence shards -> mixed-
        negative training -> eval, end to end."""
        import dataclasses

        raw = generate_hm_like_csvs(
            os.path.join(str(tmp_path), "raw"),
            n_transactions=4000,
            n_customers=150,
            n_articles=80,
            seed=2,
        )
        settings = dataclasses.replace(
            make_settings(tmp_path),
            transactions_filepath=raw["transactions"],
            articles_filepath=raw["articles"],
            customers_filepath=raw["customers"],
            train_start_date=raw["train_start"],
            train_end_date=raw["train_end"],
            test_start_date=raw["test_start"],
            test_end_date=raw["test_end"],
            history_max_len=8,
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
                    "purchase_history",
                    FeatureKind.SEQUENCE,
                    FeatureFamily.QUERY,
                    embedding_size=8,
                    max_len=8,
                    shared_vocab_with="article_id",
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
                train_batch_size=64,
                test_batch_size=128,
                candidate_batch_size=64,
                epochs=2,
                num_uniform_negatives=32,
                optimizer_kwargs={"learning_rate": 0.05},
            ),
        )
        etl_runner(settings)
        build_schema_runner(settings, schema)
        shard_writer_runner(settings)
        results = modelling_runner(settings)
        assert results["final"][10] > results["initial"][10]


class TestMeshPipeline:
    def test_modelling_runner_on_8_device_mesh(self, pipeline):
        """Re-run the train+eval stage data-parallel over the fake
        8-device mesh against the same shards; recall must improve just
        like the single-device run."""
        from hm_retrieval_tpu.parallel import make_mesh
        import dataclasses

        settings, single_results, _ = pipeline
        settings8 = dataclasses.replace(
            settings,
            checkpoint_dirpath=settings.checkpoint_dirpath + "_m8",
            model_dirpath=settings.model_dirpath + "_m8",
            index_dirpath=settings.index_dirpath + "_m8",
        )
        results = modelling_runner(settings8, mesh=make_mesh())
        assert results["final"][50] > results["initial"][50]
        # same data + same seed: comparable quality to single-device
        assert (
            abs(results["final"][50] - single_results["final"][50])
            < 0.15
        )

    def test_distributed_index_eval_bit_identical(self, pipeline):
        """Eval-only stage with the catalog row-sharded over a 2x4
        mesh: identical params -> recall BIT-IDENTICAL to the
        single-device index (the distributed layer as a product
        feature, not just a library)."""
        import dataclasses

        from hm_retrieval_tpu.parallel import make_mesh
        from hm_retrieval_tpu.runners import evaluation_runner

        settings, _, _ = pipeline
        settings_d = dataclasses.replace(
            settings,
            index_dirpath=settings.index_dirpath + "_dist",
        )
        res_single = evaluation_runner(settings)
        mesh = make_mesh(data=2, model=4)
        res_dist = evaluation_runner(
            settings_d, mesh=mesh, distributed_index=True
        )
        assert res_dist == res_single
        # the refreshed artifact is single-device-compatible
        from hm_retrieval_tpu.indices import load_index

        idx = load_index(settings_d.index_dirpath)
        assert idx.num_candidates > 0

    def test_modelling_runner_distributed_index(self, pipeline):
        """Full train+eval with --distributed-index semantics: every
        eval runs through the mesh-sharded index."""
        import dataclasses

        from hm_retrieval_tpu.parallel import make_mesh

        settings, single_results, _ = pipeline
        settings_di = dataclasses.replace(
            settings,
            checkpoint_dirpath=settings.checkpoint_dirpath + "_di",
            model_dirpath=settings.model_dirpath + "_di",
            index_dirpath=settings.index_dirpath + "_di",
        )
        mesh = make_mesh(data=2, model=4)
        results = modelling_runner(
            settings_di, mesh=mesh, distributed_index=True
        )
        assert results["final"][50] > results["initial"][50]
        assert (
            abs(results["final"][50] - single_results["final"][50])
            < 0.15
        )

    def test_modelling_runner_row_sharded_tables(self, pipeline):
        """Train+eval with the big id tables row-sharded over a 2x4
        data x model mesh (sharded_embedding_features config knob) —
        the sparse row-sharded path end-to-end through the runner."""
        import dataclasses

        from hm_retrieval_tpu.parallel import make_mesh
        from hm_retrieval_tpu.schema.schema import Schema

        settings, single_results, _ = pipeline
        d = os.path.dirname(settings.schema_dirpath)
        settings_sh = dataclasses.replace(
            settings,
            schema_dirpath=f"{d}/schema_sharded",
            checkpoint_dirpath=settings.checkpoint_dirpath + "_sh",
            model_dirpath=settings.model_dirpath + "_sh",
            index_dirpath=settings.index_dirpath + "_sh",
        )
        schema = Schema.load(settings.schema_dirpath)
        schema.training_config.sharded_embedding_features = [
            "customer_id",
            "article_id",
        ]
        schema.save(settings_sh.schema_dirpath)

        mesh = make_mesh(data=2, model=4)
        results = modelling_runner(settings_sh, mesh=mesh)
        assert results["final"][50] > results["initial"][50]
        assert (
            abs(results["final"][50] - single_results["final"][50])
            < 0.15
        )
        # exports keep the unsharded contract (true vocab row counts)
        exported = np.load(
            f"{settings_sh.model_dirpath}/query_tower/params.npz"
        )
        live = np.load(
            f"{settings.model_dirpath}/query_tower/params.npz"
        )
        for key in live.files:
            assert exported[key].shape == live[key].shape, key


class TestCheckpointResume:
    def _tiny_model(self):
        feats_q = [
            Feature(
                "uid",
                FeatureKind.CATEGORICAL,
                FeatureFamily.QUERY,
                embedding_size=4,
                vocab=np.array(["a", "b"]),
            )
        ]
        feats_c = [
            Feature(
                "article_id",
                FeatureKind.CATEGORICAL,
                FeatureFamily.CANDIDATE,
                embedding_size=4,
                vocab=np.array(["x", "y"]),
            )
        ]
        return TwoTowerModel(
            query_features=feats_q,
            candidate_features=feats_c,
            candidate_id_col="article_id",
            joint_embedding_size=4,
        )

    def test_save_restore_round_trip(self, tmp_path):
        model = self._tiny_model()
        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": 0.1}
        )
        state = create_train_state(model, opt, seed=0)
        step = make_train_step(model, opt)
        batch = {
            "uid": np.array([1, 2], np.int32),
            "article_id": np.array([1, 2], np.int32),
        }
        for _ in range(3):
            state, _ = step(state, batch)

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(int(state.step), state)
        mgr.close()

        mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr2.latest_step() == 3
        fresh = create_train_state(model, opt, seed=0)
        restored = mgr2.restore(fresh)
        mgr2.close()
        assert int(restored.step) == 3
        for a, b in zip(
            jax.tree.leaves(restored.params),
            jax.tree.leaves(state.params),
        ):
            np.testing.assert_allclose(a, b)
        # resumed training continues identically
        s1, m1 = step(restored, batch)
        assert np.isfinite(float(m1["loss"]))

    def test_async_save_then_restore_barriers(self, tmp_path):
        """save() is async (no per-save wait); restore() on the same
        manager barriers on the in-flight write and round-trips."""
        model = self._tiny_model()
        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": 0.1}
        )
        state = create_train_state(model, opt, seed=0)
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(7, state._replace(step=state.step + 7))
        # no explicit wait: restore must block on the async write
        restored = mgr.restore(create_train_state(model, opt, seed=1))
        mgr.close()
        assert int(restored.step) == 7
        for a, b in zip(
            jax.tree.leaves(restored.params),
            jax.tree.leaves(state.params),
        ):
            np.testing.assert_allclose(a, b)

    def test_cross_mesh_restore_row_sharded_sparse(self, tmp_path):
        """Save a row-sharded SparseTrainState on a 2x4 data x model
        mesh and restore it into the 1x8 layout: values identical,
        shardings follow the target mesh (SURVEY §5.4 multi-host-shaped
        checkpointing)."""
        from jax.sharding import PartitionSpec as P

        from hm_retrieval_tpu.parallel import (
            create_sharded_sparse_state,
            make_mesh,
            make_sharded_sparse_train_step,
        )

        # 16-row tables (vocab 15 + OOV): divisible by BOTH model-axis
        # sizes, so the padded shapes agree across the two meshes
        model = TwoTowerModel(
            query_features=[
                Feature(
                    "uid",
                    FeatureKind.CATEGORICAL,
                    FeatureFamily.QUERY,
                    embedding_size=4,
                    vocab=np.array([f"u{i}" for i in range(15)]),
                )
            ],
            candidate_features=[
                Feature(
                    "article_id",
                    FeatureKind.CATEGORICAL,
                    FeatureFamily.CANDIDATE,
                    embedding_size=4,
                    vocab=np.array([f"a{i}" for i in range(15)]),
                )
            ],
            candidate_id_col="article_id",
            joint_embedding_size=4,
        )
        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": 0.1}
        )
        mesh_a = make_mesh(data=2, model=4)
        feats = ["uid", "article_id"]
        state = create_sharded_sparse_state(
            model, opt, mesh_a, feats, seed=0
        )
        step = make_sharded_sparse_train_step(
            model, opt, 0.1, mesh_a, feats
        )
        rng = np.random.default_rng(0)
        batch = {
            "uid": rng.integers(0, 16, 8).astype(np.int32),
            "article_id": rng.integers(0, 16, 8).astype(np.int32),
        }
        from hm_retrieval_tpu.parallel import shard_batch

        state, _ = step(state, shard_batch(batch, mesh_a))
        saved_leaves = [
            np.asarray(x) for x in jax.tree.leaves(state)
        ]

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(int(state.step), state)
        mgr.close()

        mesh_b = make_mesh(data=1, model=8)
        fresh = create_sharded_sparse_state(
            model, opt, mesh_b, feats, seed=3
        )
        mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
        restored = mgr2.restore(fresh)
        mgr2.close()
        for a, b in zip(
            jax.tree.leaves(restored), saved_leaves
        ):
            np.testing.assert_allclose(np.asarray(a), b)
        uid_table = restored.params["query_tower"]["embeddings"]["uid"]
        assert uid_table.sharding.spec == P("model", None)
        assert uid_table.sharding.mesh.shape["model"] == 8
        # restored state trains on the new mesh
        step_b = make_sharded_sparse_train_step(
            model, opt, 0.1, mesh_b, feats
        )
        _, m = step_b(restored, shard_batch(batch, mesh_b))
        assert np.isfinite(float(m["loss"]))


class TestPytreeIO:
    def test_nested_round_trip(self, tmp_path):
        tree = {
            "a": {"b": np.arange(3), "c": [np.ones(2), np.zeros(1)]},
            "d": np.float32(2.5) * np.ones((2, 2)),
        }
        p = str(tmp_path / "t.npz")
        save_pytree_npz(tree, p)
        loaded = load_pytree_npz(p)
        np.testing.assert_array_equal(loaded["a"]["b"], np.arange(3))
        assert isinstance(loaded["a"]["c"], list)
        np.testing.assert_array_equal(loaded["a"]["c"][0], np.ones(2))
        np.testing.assert_array_equal(
            loaded["d"], 2.5 * np.ones((2, 2))
        )


class TestEvaluationRunner:
    def test_eval_only_matches_final_recall(self, pipeline):
        from hm_retrieval_tpu.runners import evaluation_runner

        settings, results, _ = pipeline
        res = evaluation_runner(settings)
        # same checkpoint + same data => same recall as the final eval
        assert res[50] == pytest.approx(
            results["final"][50], abs=1e-9
        )


class TestTrainingOverrides:
    """Stage-sliced reruns must be able to change run-shape knobs
    without rebuilding the schema (the snapshot the reference shares
    across stages, ref: schema.py:57-84): a `--stages model --epochs N`
    invocation previously trained the schema-time epoch count
    silently."""

    def test_epochs_override_and_unknown_field(self, pipeline):
        import dataclasses

        settings, _, _ = pipeline
        s1 = dataclasses.replace(
            settings,
            checkpoint_dirpath=settings.checkpoint_dirpath + "_ov",
            model_dirpath=settings.model_dirpath + "_ov",
            index_dirpath=settings.index_dirpath + "_ov",
        )
        from hm_retrieval_tpu.runners import modelling_runner

        with pytest.raises(ValueError, match="unknown TrainingConfig"):
            modelling_runner(
                s1, training_overrides={"not_a_field": 3}
            )
        modelling_runner(s1, training_overrides={"epochs": 1})

        def latest(d):
            return max(
                int(p) for p in os.listdir(d) if p.isdigit()
            )

        # fixture ran the schema-time epochs=2; the override ran 1 —
        # identical shards, so exactly half the optimizer steps
        assert latest(s1.checkpoint_dirpath) * 2 == latest(
            settings.checkpoint_dirpath
        )
