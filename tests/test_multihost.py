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


class TestTwoProcessBringup:
    def test_distributed_eval_matches_single_process(
        self, pipeline, tmp_path  # noqa: F811
    ):
        """Spawn a real 2-process jax.distributed group (CPU, 4 fake
        devices each): both ranks must report the identical GLOBAL
        recall — via lockstep mesh eval AND via per-host independent
        eval with cross-process metric aggregation — equal to the
        single-process oracle."""
        import dataclasses

        from hm_retrieval_tpu.runners import evaluation_runner

        settings, _, _ = pipeline
        oracle = evaluation_runner(
            dataclasses.replace(
                settings,
                index_dirpath=str(tmp_path / "oracle_index"),
            )
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
        for rank in range(2):
            outfile = str(tmp_path / f"out_{rank}.json")
            outs.append(outfile)
            procs.append(
                subprocess.Popen(
                    [
                        sys.executable,
                        driver,
                        str(rank),
                        "2",
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
                    "2-process jax.distributed group timed out in "
                    "this harness"
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
        r0, r1 = results
        # both ranks computed the identical GLOBAL metric
        assert r0["recalls"] == r1["recalls"]
        assert r0["local_recalls"] == r1["local_recalls"]
        assert r0["dist_recalls"] == r1["dist_recalls"]
        # each saw only part of the test set
        full_rows = ShardDataset(
            settings.test_shards_dirpath
        ).num_rows
        assert r0["local_test_rows"] < full_rows
        assert (
            r0["local_test_rows"] + r1["local_test_rows"]
            == full_rows
        )
        # and the global metric equals the single-process oracle
        oracle_s = {str(k): v for k, v in oracle.items()}
        assert r0["recalls"] == oracle_s
        assert r0["local_recalls"] == oracle_s
        # catalog row-sharded over the 2-host mesh: same global recall
        assert r0["dist_recalls"] == oracle_s
        assert all(np.isfinite(r0["train_losses"]))
        assert len(r0["train_losses"]) == 3