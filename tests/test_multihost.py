"""Multi-host bring-up: per-process shard selection, lockstep global
eval, cross-process metric aggregation (SURVEY §2.9/§5.8 — the rebuild's
own obligation; the single-device reference has no analog).

Unit tests run on the in-process fake mesh; the integration test spawns
a REAL 2-process jax.distributed group on CPU (4 fake devices per rank)
and asserts both ranks compute the identical global recall, equal to the
single-process oracle.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from hm_retrieval_tpu.data.dataset import ShardDataset
from hm_retrieval_tpu.metrics.index_recall import IndexRecall

from tests.test_runners import pipeline  # noqa: F401  (module fixture)


class TestProcessShardSelection:
    def test_local_rows_partition_the_dataset(self, pipeline):  # noqa: F811
        settings, _, _ = pipeline
        full = ShardDataset(settings.test_shards_dirpath)
        parts = [
            ShardDataset(
                settings.test_shards_dirpath,
                process_index=i,
                process_count=2,
            )
            for i in range(2)
        ]
        assert (
            sum(p.local_num_rows for p in parts) == full.num_rows
        )
        assert full.local_num_rows == full.num_rows
        # the shard files are disjoint and cover everything
        assert set(parts[0].shard_paths).isdisjoint(
            parts[1].shard_paths
        )
        assert (
            sorted(parts[0].shard_paths + parts[1].shard_paths)
            == full.shard_paths
        )
        # local_num_rows matches the actual streamed row count
        for p in parts:
            streamed = sum(
                len(next(iter(b.values())))
                for b in p.iter_batches(37)
            )
            assert streamed == p.local_num_rows


class TestValidMask:
    def test_mask_equals_num_valid(self):
        rng = np.random.default_rng(0)
        retrieved = rng.integers(0, 50, (8, 5)).astype(np.int32)
        true_ids = rng.integers(0, 50, 8).astype(np.int32)
        m1 = IndexRecall([1, 5])
        m1.update(retrieved, true_ids, num_valid=6)
        m2 = IndexRecall([1, 5])
        m2.update(
            retrieved, true_ids, valid_mask=np.arange(8) < 6
        )
        assert m1.results() == m2.results()
        assert m1.seen == m2.seen == 6

    def test_interleaved_mask(self):
        """Padding in the middle of the batch (the multi-host assembled
        layout) is excluded exactly."""
        retrieved = np.array(
            [[1, 2], [3, 4], [5, 6], [7, 8]], np.int32
        )
        true_ids = np.array([1, 3, 5, 7], np.int32)
        mask = np.array([True, False, True, False])
        m = IndexRecall([1])
        m.update(retrieved, true_ids, valid_mask=mask)
        assert m.seen == 2
        assert m.results()[1] == 1.0

    def test_both_rejected(self):
        m = IndexRecall([1])
        with pytest.raises(ValueError, match="not both"):
            m.update(
                np.zeros((2, 1), np.int32),
                np.zeros(2, np.int32),
                num_valid=1,
                valid_mask=np.array([True, False]),
            )

    def test_cross_process_identity_single_process(self):
        """cross_process=True is exact at P=1 (the aggregation is a
        no-op sum over one process)."""
        rng = np.random.default_rng(0)
        retrieved = rng.integers(0, 9, (6, 4)).astype(np.int32)
        true_ids = rng.integers(0, 9, 6).astype(np.int32)
        a = IndexRecall([2, 4])
        b = IndexRecall([2, 4], cross_process=True)
        a.update(retrieved, true_ids)
        b.update(retrieved, true_ids)
        assert a.results() == b.results()


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _tp_oracle(settings, n_groups: int, steps: int = 3):
    """Single-process sparse-Adagrad oracle over the SAME global
    batches the cross-host sharded-sparse section assembles (data chunk
    g = group g's shard-subset rows, 16 per group per step). Returns
    (losses, params_digest)."""
    import jax
    import jax.numpy as jnp

    from hm_retrieval_tpu.models import OptimizerFactory
    from hm_retrieval_tpu.models.sparse_optimizer import (
        create_sparse_train_state,
        make_sparse_train_step,
    )
    from hm_retrieval_tpu.models.two_tower import TwoTowerModel
    from hm_retrieval_tpu.schema.schema import Schema

    schema = Schema.load(settings.schema_dirpath)
    model = TwoTowerModel.create_from_schema(schema)
    tc = schema.training_config
    opt = OptimizerFactory.get_optimizer(
        tc.optimizer_name, tc.optimizer_kwargs
    )
    state = create_sparse_train_state(model, opt, seed=0)
    step = make_sparse_train_step(
        model, opt, tc.optimizer_kwargs.get("learning_rate", 0.05)
    )
    its = [
        ShardDataset(
            settings.train_shards_dirpath,
            process_index=g,
            process_count=n_groups,
        ).iter_batches(16, drop_remainder=True)
        for g in range(n_groups)
    ]
    losses = []
    for _ in range(steps):
        parts = [next(it) for it in its]
        gb = {
            k: jnp.asarray(
                np.concatenate([np.asarray(p[k]) for p in parts])
            )
            for k in parts[0]
        }
        state, m = step(state, gb)
        losses.append(float(m["loss"]))
    digest = float(
        sum(
            np.float64(np.asarray(leaf, np.float64).sum())
            for leaf in jax.tree.leaves(state.params)
        )
    )
    return losses, digest


class TestProcessGroupBringup:
    @pytest.mark.parametrize("nprocs", [2, 4])
    def test_distributed_run_matches_single_process(
        self, pipeline, tmp_path, nprocs  # noqa: F811
    ):
        """Spawn a real nprocs-rank jax.distributed group (CPU, 8 fake
        devices total): every rank must report the identical GLOBAL
        recall — via lockstep mesh eval AND via per-host independent
        eval with cross-process metric aggregation — equal to the
        single-process oracle; and the cross-host sharded-sparse train
        step (model axis spanning processes) must reproduce the
        single-process sparse-Adagrad oracle exactly."""
        import dataclasses

        from hm_retrieval_tpu.runners import evaluation_runner

        settings, _, _ = pipeline
        oracle = evaluation_runner(
            dataclasses.replace(
                settings,
                index_dirpath=str(tmp_path / "oracle_index"),
            )
        )
        tp_losses_oracle, tp_digest_oracle = _tp_oracle(
            settings, max(1, nprocs // 2)
        )

        cfg = dataclasses.asdict(
            dataclasses.replace(
                settings,
                index_dirpath=str(tmp_path / "mh_index"),
            )
        )
        settings_path = str(tmp_path / "settings.json")
        with open(settings_path, "w") as f:
            json.dump(cfg, f)

        port = _free_port()
        driver = os.path.join(
            os.path.dirname(__file__), "multihost_driver.py"
        )
        env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
        }
        procs, outs = [], []
        for rank in range(nprocs):
            outfile = str(tmp_path / f"out_{rank}.json")
            outs.append(outfile)
            procs.append(
                subprocess.Popen(
                    [
                        sys.executable,
                        driver,
                        str(rank),
                        str(nprocs),
                        str(port),
                        settings_path,
                        outfile,
                    ],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
            )
        logs = []
        failed = False
        for p in procs:
            try:
                out, _ = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.skip(
                    f"{nprocs}-process jax.distributed group timed "
                    "out in this harness"
                )
            logs.append(out)
            failed |= p.returncode != 0
        if failed:
            joined = "\n".join(logs)
            if "DRIVER_INIT_OK" not in joined:
                # the group never formed: environment limitation, not
                # a code bug
                pytest.skip(
                    f"jax.distributed unavailable here:\n{joined[-2000:]}"
                )
            raise AssertionError(
                f"multihost driver failed:\n{joined[-4000:]}"
            )

        results = []
        for outfile in outs:
            with open(outfile) as f:
                results.append(json.load(f))
        r0 = results[0]
        # every rank computed the identical GLOBAL metrics/losses
        for r in results[1:]:
            assert r["recalls"] == r0["recalls"]
            assert r["local_recalls"] == r0["local_recalls"]
            assert r["dist_recalls"] == r0["dist_recalls"]
            assert r["tp_losses"] == r0["tp_losses"]
            assert r["tp_param_digest"] == r0["tp_param_digest"]
            assert r["chunked_losses"] == r0["chunked_losses"]
            # streamed-sharded-build -> to_local() (the SavedModel
            # export path) assembled the identical catalog everywhere
            assert (
                r["local_export_digest"] == r0["local_export_digest"]
            )
        # each rank saw only part of the test set; together, all of it
        full_rows = ShardDataset(
            settings.test_shards_dirpath
        ).num_rows
        assert all(
            r["local_test_rows"] < full_rows for r in results
        )
        assert (
            sum(r["local_test_rows"] for r in results) == full_rows
        )
        # and the global metric equals the single-process oracle
        oracle_s = {str(k): v for k, v in oracle.items()}
        assert r0["recalls"] == oracle_s
        assert r0["local_recalls"] == oracle_s
        # catalog row-sharded over the cross-host mesh: same recall
        assert r0["dist_recalls"] == oracle_s
        assert all(np.isfinite(r0["train_losses"]))
        assert len(r0["train_losses"]) == 3
        # chunked dispatch over the real process group: 2 dispatches
        # of K=2 steps each, per-step loss trace finite + identical
        assert len(r0["chunked_losses"]) == 4
        assert all(np.isfinite(r0["chunked_losses"]))
        # cross-host sharded-sparse == single-process sparse Adagrad
        assert r0["tp_mesh"][0] == max(1, nprocs // 2)
        np.testing.assert_allclose(
            r0["tp_losses"], tp_losses_oracle, rtol=1e-5
        )
        np.testing.assert_allclose(
            r0["tp_param_digest"], tp_digest_oracle, rtol=1e-6
        )