"""Mesh-sharded index classes (indices/distributed.py): parity with the
single-device indices, artifact interchangeability, and real sharding —
the product surface of SURVEY §2.9's "distributed top-k retrieval"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from hm_retrieval_tpu.indices import (
    BruteForceIndex,
    DistributedBruteForceIndex,
    DistributedQuantizedIndex,
    QuantizedIndex,
    load_distributed_index,
    load_index,
)
from hm_retrieval_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def catalog():
    rng = np.random.default_rng(7)
    N, E = 1500, 16  # N not divisible by 8 -> shard padding in play
    emb = rng.normal(size=(N, E)).astype(np.float32)
    ids = np.arange(1, N + 1, dtype=np.int32)
    q = rng.normal(size=(8, E)).astype(np.float32)
    return ids, emb, q


class TestDistributedBruteForce:
    @pytest.mark.parametrize(
        "mesh_shape", [(1, 8), (2, 4), (8, 1)]
    )
    def test_matches_single_device(self, catalog, mesh_shape):
        ids, emb, q = catalog
        k = 20
        ref = BruteForceIndex(k, ids, emb, method="full")
        s_ref, i_ref = ref.topk_from_embeddings(jnp.asarray(q))

        mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
        dist = DistributedBruteForceIndex(
            k, ids, emb, mesh=mesh, method="xla"
        )
        s, i = dist.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(s_ref), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(i), np.asarray(i_ref)
        )

    def test_pallas_method_matches(self, catalog):
        ids, emb, q = catalog
        k = 10
        mesh = make_mesh(data=2, model=4)
        ref = BruteForceIndex(k, ids, emb, method="full")
        s_ref, i_ref = ref.topk_from_embeddings(jnp.asarray(q))
        dist = DistributedBruteForceIndex(
            k,
            ids,
            emb,
            mesh=mesh,
            method="pallas",
            interpret=True,
            compute_dtype=jnp.float32,
        )
        s, i = dist.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(s_ref), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(i), np.asarray(i_ref)
        )

    def test_query_batch_not_divisible_by_data_axis(self, catalog):
        """B=5 on a data=4 axis: the index pads queries internally and
        slices the results back."""
        ids, emb, q = catalog
        k = 7
        mesh = make_mesh(data=4, model=2)
        dist = DistributedBruteForceIndex(k, ids, emb, mesh=mesh)
        ref = BruteForceIndex(k, ids, emb, method="full")
        s, i = dist.topk_from_embeddings(jnp.asarray(q[:5]))
        s_ref, i_ref = ref.topk_from_embeddings(jnp.asarray(q[:5]))
        assert s.shape == (5, k)
        np.testing.assert_array_equal(
            np.asarray(i), np.asarray(i_ref)
        )

    def test_catalog_actually_sharded(self, catalog):
        ids, emb, q = catalog
        mesh = make_mesh(data=1, model=8)
        dist = DistributedBruteForceIndex(10, ids, emb, mesh=mesh)
        assert dist._emb.sharding.spec == P("model", None)
        shard_rows = {
            s.data.shape[0] for s in dist._emb.addressable_shards
        }
        # 1500 rows pad to 1504 = 8 * 188: every device holds 188 rows
        assert shard_rows == {188}

    def test_save_load_interchangeable(self, catalog, tmp_path):
        """distributed save -> single-device load AND single-device
        save -> distributed load both reproduce the same results."""
        ids, emb, q = catalog
        k = 10
        mesh = make_mesh(data=2, model=4)
        dist = DistributedBruteForceIndex(k, ids, emb, mesh=mesh)
        _, i_ref = dist.topk_from_embeddings(jnp.asarray(q))

        d1 = str(tmp_path / "dist_saved")
        dist.save(d1)
        local = load_index(d1)
        assert isinstance(local, BruteForceIndex)
        _, i_local = local.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(
            np.asarray(i_local), np.asarray(i_ref)
        )

        d2 = str(tmp_path / "local_saved")
        local.save(d2)
        dist2 = load_distributed_index(d2, mesh)
        assert isinstance(dist2, DistributedBruteForceIndex)
        _, i2 = dist2.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(
            np.asarray(i2), np.asarray(i_ref)
        )

    def test_validation(self, catalog):
        ids, emb, _ = catalog
        mesh = make_mesh(data=1, model=8)
        with pytest.raises(ValueError, match="mesh"):
            DistributedBruteForceIndex(10, ids, emb, mesh=None)
        with pytest.raises(ValueError, match="method"):
            DistributedBruteForceIndex(
                10, ids, emb, mesh=mesh, method="nope"
            )
        with pytest.raises(ValueError, match="exceeds"):
            DistributedBruteForceIndex(
                len(ids) + 1, ids, emb, mesh=mesh
            )


class TestDistributedQuantized:
    def test_recall_vs_exact_oracle(self, catalog):
        ids, emb, q = catalog
        k = 20
        mesh = make_mesh(data=2, model=4)
        ref = BruteForceIndex(k, ids, emb, method="full")
        _, i_ref = ref.topk_from_embeddings(jnp.asarray(q))
        dist = DistributedQuantizedIndex(
            k, ids, emb, mesh=mesh, method="scan"
        )
        _, i_q = dist.topk_from_embeddings(jnp.asarray(q))
        ref_sets = [set(r) for r in np.asarray(i_ref)]
        got_sets = [set(r) for r in np.asarray(i_q)]
        recall = np.mean(
            [len(a & b) / k for a, b in zip(ref_sets, got_sets)]
        )
        assert recall >= 0.99

    def test_rescore_false_drops_fp32(self, catalog):
        ids, emb, q = catalog
        mesh = make_mesh(data=1, model=8)
        dist = DistributedQuantizedIndex(
            10, ids, emb, mesh=mesh, rescore=False, method="scan"
        )
        assert dist._placed[2] is None  # no fp32 shards
        s, i = dist.topk_from_embeddings(jnp.asarray(q))
        assert np.isfinite(np.asarray(s)).all()

    def test_save_load_interchangeable(self, catalog, tmp_path):
        ids, emb, q = catalog
        k = 10
        mesh = make_mesh(data=2, model=4)
        dist = DistributedQuantizedIndex(
            k, ids, emb, mesh=mesh, method="scan"
        )
        _, i_ref = dist.topk_from_embeddings(jnp.asarray(q))

        d1 = str(tmp_path / "dq_saved")
        dist.save(d1)
        local = load_index(d1)
        assert isinstance(local, QuantizedIndex)
        _, i_local = local.topk_from_embeddings(jnp.asarray(q))
        # both rescore survivors in fp32; survivor sets may differ at
        # the margin -> compare as sets with near-total overlap
        overlap = np.mean(
            [
                len(set(a) & set(b)) / k
                for a, b in zip(
                    np.asarray(i_ref), np.asarray(i_local)
                )
            ]
        )
        assert overlap >= 0.99

        dist2 = load_distributed_index(d1, mesh, method="scan")
        assert isinstance(dist2, DistributedQuantizedIndex)
        _, i2 = dist2.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(
            np.asarray(i2), np.asarray(i_ref)
        )

    def test_save_load_no_rescore(self, catalog, tmp_path):
        """rescore=False artifacts store no fp32 table; reload
        reconstructs the catalog from the codes losslessly."""
        ids, emb, q = catalog
        mesh = make_mesh(data=1, model=8)
        dist = DistributedQuantizedIndex(
            10, ids, emb, mesh=mesh, rescore=False, method="scan"
        )
        d = str(tmp_path / "dq_norescore")
        dist.save(d)
        with np.load(f"{d}/index.npz") as z:
            assert "embeddings" not in z.files
        dist2 = load_distributed_index(d, mesh, method="scan")
        assert dist2.rescore is False
        _, i1 = dist.topk_from_embeddings(jnp.asarray(q))
        _, i2 = dist2.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(
            np.asarray(i1), np.asarray(i2)
        )


def _batches_of(ids, batch_size):
    for s in range(0, len(ids), batch_size):
        yield {"article_id": ids[s : s + batch_size]}


def _embed_fn_for(ids_all, emb):
    """Positional lookup 'tower': ids are 1..N, row i embeds to
    emb[i-1]; pad rows (id 0) embed to garbage that must never leak
    (the builder trims them before placement)."""
    table = np.concatenate(
        [np.full((1, emb.shape[1]), 999.0, np.float32), emb]
    )

    def embed(batch):
        return table[np.asarray(batch["article_id"])]

    return embed


class TestShardedStreamingBuild:
    """indices/builder.py::collect_catalog_sharded — the O(N*E/S)
    streaming build the replicated collect_catalog cannot provide."""

    def test_quantized_matches_host_build(self, catalog):
        ids, emb, q = catalog
        k = 10
        mesh = make_mesh(data=2, model=4)
        host = DistributedQuantizedIndex(
            k, ids, emb, mesh=mesh, method="scan"
        )
        stats = {}
        built = DistributedQuantizedIndex.build_from_batches(
            k,
            "article_id",
            _embed_fn_for(ids, emb),
            _batches_of(ids, 128),
            128,
            mesh=mesh,
            num_candidates=len(ids),
            dim=emb.shape[1],
            build_stats=stats,
            method="scan",
        )
        s_h, i_h = host.topk_from_embeddings(jnp.asarray(q))
        s_b, i_b = built.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_h))
        np.testing.assert_allclose(
            np.asarray(s_b), np.asarray(s_h), rtol=1e-6
        )
        # identical device placement too
        np.testing.assert_array_equal(
            np.asarray(built._placed[0]), np.asarray(host._placed[0])
        )
        assert stats["embedded_blocks"] == -(-len(ids) // 128)

    def test_brute_force_matches_host_build(self, catalog):
        ids, emb, q = catalog
        k = 10
        mesh = make_mesh(data=1, model=8)
        host = DistributedBruteForceIndex(
            k, ids, emb, mesh=mesh, method="xla"
        )
        built = DistributedBruteForceIndex.build_from_batches(
            k,
            "article_id",
            _embed_fn_for(ids, emb),
            _batches_of(ids, 256),
            256,
            mesh=mesh,
            num_candidates=len(ids),
            dim=emb.shape[1],
            method="xla",
        )
        s_h, i_h = host.topk_from_embeddings(jnp.asarray(q))
        s_b, i_b = built.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_h))
        np.testing.assert_allclose(
            np.asarray(s_b), np.asarray(s_h), rtol=1e-6
        )

    def test_peak_host_memory_is_per_shard(self, catalog):
        """The build must never hold the (N, E) fp32 catalog on the
        host: peak accounted bytes stay well under the full catalog
        and scale with ceil(N/S) * E."""
        ids, emb, _ = catalog
        mesh = make_mesh(data=1, model=8)
        stats = {}
        DistributedQuantizedIndex.build_from_batches(
            10,
            "article_id",
            _embed_fn_for(ids, emb),
            _batches_of(ids, 128),
            128,
            mesh=mesh,
            num_candidates=len(ids),
            dim=emb.shape[1],
            build_stats=stats,
            method="scan",
        )
        per = stats["rows_per_shard"]
        assert per == -(-len(ids) // 8)
        full_catalog = emb.nbytes
        # shard buffer + its finalize-time copies + the small id/bias
        # vectors; nowhere near the full fp32 catalog
        assert stats["peak_host_bytes"] < full_catalog // 2
        assert stats["peak_host_bytes"] < 8 * per * emb.shape[1] * 4

    def test_tiny_catalog_with_empty_trailing_shards(self):
        """N small enough that ceil rounding leaves trailing model
        shards with ZERO rows (N=10, S=8 -> per=2, shards 5..7 empty):
        the build must still finalize every shard's device arrays, the
        index must never surface pad rows, and the sharded artifact
        must round-trip — including onto a mesh with more shards than
        the catalog fills."""
        rng = np.random.default_rng(3)
        N, E, k = 10, 16, 4
        emb = rng.normal(size=(N, E)).astype(np.float32)
        ids = np.arange(1, N + 1, dtype=np.int32)
        q = rng.normal(size=(4, E)).astype(np.float32)
        mesh = make_mesh(data=1, model=8)
        built = DistributedQuantizedIndex.build_from_batches(
            k,
            "article_id",
            _embed_fn_for(ids, emb),
            _batches_of(ids, 4),
            4,
            mesh=mesh,
            num_candidates=N,
            dim=E,
            method="scan",
        )
        ref = QuantizedIndex(k, ids, emb, method="scan")
        _, i_b = built.topk_from_embeddings(jnp.asarray(q))
        _, i_r = ref.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_r))
        assert np.asarray(i_b).max() <= N  # ids 1..N only

    def test_sharded_artifact_load_onto_wider_mesh(
        self, tmp_path
    ):
        """A 12-row sharded artifact (written on model=4) loads onto a
        model=8 mesh whose trailing shards are pure padding."""
        rng = np.random.default_rng(4)
        N, E, k = 12, 8, 3
        emb = rng.normal(size=(N, E)).astype(np.float32)
        ids = np.arange(1, N + 1, dtype=np.int32)
        q = rng.normal(size=(4, E)).astype(np.float32)
        mesh4 = make_mesh(data=2, model=4)
        built = DistributedQuantizedIndex.build_from_batches(
            k,
            "article_id",
            _embed_fn_for(ids, emb),
            _batches_of(ids, 4),
            4,
            mesh=mesh4,
            num_candidates=N,
            dim=E,
            method="scan",
        )
        d = str(tmp_path / "tiny")
        built.save(d)
        _, i_ref = built.topk_from_embeddings(jnp.asarray(q))
        mesh8 = make_mesh(data=1, model=8)
        wide = load_distributed_index(d, mesh8, method="scan")
        _, i_w = wide.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(np.asarray(i_w), np.asarray(i_ref))

    def test_counts_rows_when_num_candidates_absent(self, catalog):
        ids, emb, q = catalog
        mesh = make_mesh(data=2, model=4)
        built = DistributedQuantizedIndex.build_from_batches(
            10,
            "article_id",
            _embed_fn_for(ids, emb),
            _batches_of(ids, 128),
            128,
            mesh=mesh,
            method="scan",
        )
        assert built.num_candidates == len(ids)

    def test_sharded_save_and_loads(self, catalog, tmp_path):
        """Streamed builds persist per-shard files; both the
        distributed loader (streamed back into placement) and the
        single-device loader (concatenated) reproduce the results."""
        import os

        ids, emb, q = catalog
        k = 10
        mesh = make_mesh(data=2, model=4)
        built = DistributedQuantizedIndex.build_from_batches(
            k,
            "article_id",
            _embed_fn_for(ids, emb),
            _batches_of(ids, 128),
            128,
            mesh=mesh,
            num_candidates=len(ids),
            dim=emb.shape[1],
            method="scan",
        )
        assert built.collective_save
        d = str(tmp_path / "sharded")
        built.save(d)
        assert not os.path.exists(f"{d}/index.npz")
        shard_files = sorted(
            f for f in os.listdir(d) if f.startswith("index_shard_")
        )
        assert len(shard_files) == 4  # one per model shard
        _, i_ref = built.topk_from_embeddings(jnp.asarray(q))

        dist2 = load_distributed_index(d, mesh, method="scan")
        _, i2 = dist2.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(i_ref))

        local = load_index(d)
        assert isinstance(local, QuantizedIndex)
        assert local.num_candidates == len(ids)
        _, i_l = local.topk_from_embeddings(jnp.asarray(q))
        overlap = np.mean(
            [
                len(set(a) & set(b)) / k
                for a, b in zip(np.asarray(i_ref), np.asarray(i_l))
            ]
        )
        assert overlap >= 0.99

    def test_sharded_save_brute_force_roundtrip(
        self, catalog, tmp_path
    ):
        import os

        ids, emb, q = catalog
        k = 10
        mesh = make_mesh(data=1, model=8)
        built = DistributedBruteForceIndex.build_from_batches(
            k,
            "article_id",
            _embed_fn_for(ids, emb),
            _batches_of(ids, 256),
            256,
            mesh=mesh,
            num_candidates=len(ids),
            dim=emb.shape[1],
            method="xla",
        )
        d = str(tmp_path / "bf_sharded")
        built.save(d)
        assert not os.path.exists(f"{d}/index.npz")
        _, i_ref = built.topk_from_embeddings(jnp.asarray(q))
        # different mesh layout on reload: artifact is mesh-independent
        mesh2 = make_mesh(data=4, model=2)
        dist2 = load_distributed_index(d, mesh2, method="xla")
        _, i2 = dist2.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(i_ref))
        local = load_index(d)
        assert isinstance(local, BruteForceIndex)
        _, i_l = local.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(
            np.asarray(i_l), np.asarray(i_ref)
        )

    def test_resave_clears_stale_layouts(self, catalog, tmp_path):
        """Re-saving into a directory that held a DIFFERENT artifact
        layout must not leave stale files that loaders would read:
        sharded-after-single must drop index.npz; a narrower re-shard
        must drop high-numbered shard files; single-after-sharded must
        drop every shard file."""
        import os

        ids, emb, q = catalog
        k = 10
        d = str(tmp_path / "swap")

        # 1) single-file save first
        host = DistributedQuantizedIndex(
            k,
            ids,
            emb,
            mesh=make_mesh(data=2, model=4),
            method="scan",
        )
        host.save(d)
        assert os.path.exists(f"{d}/index.npz")

        # 2) sharded save (8 shards) into the same dir
        mesh8 = make_mesh(data=1, model=8)
        built8 = DistributedQuantizedIndex.build_from_batches(
            k,
            "article_id",
            _embed_fn_for(ids, emb),
            _batches_of(ids, 128),
            128,
            mesh=mesh8,
            num_candidates=len(ids),
            dim=emb.shape[1],
            method="scan",
        )
        built8.save(d)
        assert not os.path.exists(f"{d}/index.npz")  # stale removed
        n8 = len(
            [f for f in os.listdir(d) if f.startswith("index_shard_")]
        )
        assert n8 == 8
        _, i_ref = built8.topk_from_embeddings(jnp.asarray(q))
        local = load_index(d)
        assert local.num_candidates == len(ids)

        # 3) narrower re-shard (4 shards): shards 4..7 must vanish
        mesh4 = make_mesh(data=2, model=4)
        built4 = DistributedQuantizedIndex.build_from_batches(
            k,
            "article_id",
            _embed_fn_for(ids, emb),
            _batches_of(ids, 128),
            128,
            mesh=mesh4,
            num_candidates=len(ids),
            dim=emb.shape[1],
            method="scan",
        )
        built4.save(d)
        n4 = len(
            [f for f in os.listdir(d) if f.startswith("index_shard_")]
        )
        assert n4 == 4
        local4 = load_index(d)
        assert local4.num_candidates == len(ids)  # no concat of stale
        _, i_l = local4.topk_from_embeddings(jnp.asarray(q))
        overlap = np.mean(
            [
                len(set(a) & set(b)) / k
                for a, b in zip(np.asarray(i_ref), np.asarray(i_l))
            ]
        )
        assert overlap >= 0.99

        # 4) single-file save again: every shard file must vanish
        host.save(d)
        assert os.path.exists(f"{d}/index.npz")
        assert not [
            f for f in os.listdir(d) if f.startswith("index_shard_")
        ]

    def test_rescore_false_never_materializes_fp32(
        self, catalog, tmp_path
    ):
        import os

        ids, emb, q = catalog
        mesh = make_mesh(data=1, model=8)
        built = DistributedQuantizedIndex.build_from_batches(
            10,
            "article_id",
            _embed_fn_for(ids, emb),
            _batches_of(ids, 128),
            128,
            mesh=mesh,
            num_candidates=len(ids),
            dim=emb.shape[1],
            rescore=False,
            method="scan",
        )
        assert built._placed[2] is None  # no fp32 shards on device
        d = str(tmp_path / "nofp32")
        built.save(d)
        for f in os.listdir(d):
            if f.startswith("index_shard_"):
                with np.load(os.path.join(d, f)) as z:
                    assert "embeddings" not in z.files
        dist2 = load_distributed_index(d, mesh, method="scan")
        _, i1 = built.topk_from_embeddings(jnp.asarray(q))
        _, i2 = dist2.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    @pytest.mark.parametrize("rescore", [True, False])
    def test_large_k_oversample_shrinks_per_shard(self, rescore):
        """PER-SHARD k x oversample beyond every feasible bin layout
        must shrink the survivor set (rescore bounds recall; without
        rescore the output is truncated to k anyway), not crash the
        pallas engine at dispatch (reference serving k=1000 with the
        default oversample=4 hit exactly this). N is sized so the
        per-shard k_over (min(4k, N/S) = 2400) really exceeds
        L_max=2048 — a smaller catalog clamps k_over to the shard size
        and never enters the shrink path."""
        from hm_retrieval_tpu.indices.quantized import (
            shrink_survivors,
        )

        rng = np.random.default_rng(9)
        N, E, k = 40_000, 16, 600  # per-shard n_local=5000, k'=2400
        assert shrink_survivors(k, 4 * k, E) < 4 * k  # shrink engages
        emb = rng.normal(size=(N, E)).astype(np.float32)
        ids = np.arange(1, N + 1, dtype=np.int32)
        q = rng.normal(size=(4, E)).astype(np.float32)
        mesh = make_mesh(data=1, model=8)
        dist = DistributedQuantizedIndex(
            k,
            ids,
            emb,
            mesh=mesh,
            oversample=4,
            rescore=rescore,
            method="pallas",
            interpret=True,
        )
        s, i = dist.topk_from_embeddings(jnp.asarray(q))
        assert s.shape == (4, k)
        ref = BruteForceIndex(k, ids, emb, method="full")
        _, want = ref.topk_from_embeddings(jnp.asarray(q))
        overlap = np.mean(
            [
                len(set(a) & set(b)) / k
                for a, b in zip(np.asarray(i), np.asarray(want))
            ]
        )
        assert overlap >= 0.9

    def test_to_local_of_streamed_build(self, catalog):
        ids, emb, q = catalog
        mesh = make_mesh(data=2, model=4)
        built = DistributedQuantizedIndex.build_from_batches(
            10,
            "article_id",
            _embed_fn_for(ids, emb),
            _batches_of(ids, 128),
            128,
            mesh=mesh,
            num_candidates=len(ids),
            dim=emb.shape[1],
            method="scan",
        )
        local = built.to_local(method="scan")
        host = QuantizedIndex(10, ids, emb, method="scan")
        _, i_l = local.topk_from_embeddings(jnp.asarray(q))
        _, i_h = host.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(np.asarray(i_l), np.asarray(i_h))


class TestLazyShardedLoad:
    """_shard_arrays_to_blocks must defer the embedding decode to the
    thunk (advisor r4): a multi-host load skips IO + dequantization for
    unowned shards, so reading the ids alone must not touch the
    embedding payloads."""

    def _sharded_artifact(self, catalog, tmp_path):
        ids, emb, _ = catalog
        mesh = make_mesh(data=2, model=4)
        built = DistributedQuantizedIndex.build_from_batches(
            10,
            "article_id",
            _embed_fn_for(ids, emb),
            _batches_of(ids, 128),
            128,
            mesh=mesh,
            num_candidates=len(ids),
            dim=emb.shape[1],
            method="scan",
            rescore=False,  # int8-only artifact: thunk must dequantize
        )
        d = str(tmp_path / "lazy")
        built.save(d)
        return d

    def test_embedding_decode_is_deferred(self, catalog, tmp_path):
        import os

        from hm_retrieval_tpu.indices.distributed import (
            _shard_arrays_to_blocks,
        )

        d = self._sharded_artifact(catalog, tmp_path)
        blocks = list(_shard_arrays_to_blocks(d))
        assert len(blocks) == 4
        # ids were read eagerly; embeddings must decode correctly...
        ids, emb, _ = catalog
        got_ids = np.concatenate([b[0] for b in blocks])
        np.testing.assert_array_equal(got_ids[: len(ids)], ids)
        first = blocks[0][1]()
        assert first.dtype == np.float32
        assert first.shape[1] == emb.shape[1]
        # ...but only when the thunk runs: with the files gone, a
        # fresh iteration's ids are already in hand while an unowned
        # block's thunk was never charged for IO — invoking it now
        # fails, proving the decode had not happened eagerly
        blocks2 = list(_shard_arrays_to_blocks(d))
        for f in os.listdir(d):
            if f.startswith("index_shard_"):
                os.unlink(os.path.join(d, f))
        with pytest.raises(FileNotFoundError):
            blocks2[1][1]()
