"""Distributed-layer tests on the 8-fake-device CPU mesh (SURVEY §4: the
rebuild's multi-device tests without a real pod): DP-vs-single-device
numerical equivalence, shard_map global-negatives loss == global loss,
sharded embedding lookup == dense gather (fwd + grad), distributed top-k ==
single-device top-k."""

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
from hm_retrieval_tpu.ops.topk import topk_dot
from hm_retrieval_tpu.parallel import (
    make_distributed_topk,
    make_dp_train_step,
    make_global_negatives_loss,
    make_mesh,
    make_sharded_lookup,
    replicate_state,
    shard_batch,
    shard_candidates,
    shard_table,
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


@pytest.fixture(scope="module")
def model():
    logq = np.zeros(41, np.float32)
    logq[1:] = np.log(
        np.linspace(0.3, 0.001, 40).astype(np.float32)
    )
    return TwoTowerModel(
        query_features=[cat("uid", FeatureFamily.QUERY, 8, 100)],
        candidate_features=[
            cat("article_id", FeatureFamily.CANDIDATE, 8, 40)
        ],
        candidate_id_col="article_id",
        joint_embedding_size=16,
        query_tower_units=[32],
        logq=logq,
    )


def global_batch(rng, B=64):
    return {
        "uid": rng.integers(0, 101, B).astype(np.int32),
        "article_id": rng.integers(0, 41, B).astype(np.int32),
    }


class TestMesh:
    def test_requires_divisible(self):
        with pytest.raises(ValueError):
            make_mesh(model=3)

    def test_shapes(self):
        m = make_mesh()
        assert m.shape == {"data": 8, "model": 1}
        m2 = make_mesh(data=2, model=4)
        assert m2.shape == {"data": 2, "model": 4}


class TestDataParallel:
    def test_dp_step_matches_single_device(self, model, rng):
        batch = global_batch(rng)
        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": 0.05}
        )

        # single device
        state1 = create_train_state(model, opt, seed=0)
        step1 = make_train_step(model, opt)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state1, m1 = step1(state1, jb)

        # 8-way DP
        mesh = make_mesh()
        state8 = replicate_state(
            create_train_state(model, opt, seed=0), mesh
        )
        step8 = make_dp_train_step(model, opt, mesh)
        sb = shard_batch(batch, mesh)
        state8, m8 = step8(state8, sb)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(state1.params),
            jax.tree.leaves(state8.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )


class TestGlobalNegatives:
    def test_shard_map_loss_equals_global_loss(self, model, rng):
        batch = global_batch(rng)
        params = model.init_params(3)
        expected = float(
            model.loss(
                params, {k: jnp.asarray(v) for k, v in batch.items()}
            )
        )
        mesh = make_mesh()  # data=8
        loss_fn = make_global_negatives_loss(model, mesh)
        got = float(
            jax.jit(loss_fn)(params, shard_batch(batch, mesh))
        )
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_gradients_match(self, model, rng):
        batch = global_batch(rng)
        params = model.init_params(3)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        g_ref = jax.grad(model.loss)(params, jb)
        mesh = make_mesh()
        loss_fn = make_global_negatives_loss(model, mesh)
        g_dist = jax.jit(jax.grad(loss_fn))(
            params, shard_batch(batch, mesh)
        )
        for a, b in zip(
            jax.tree.leaves(g_ref), jax.tree.leaves(g_dist)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )


class TestShardedEmbedding:
    @pytest.mark.parametrize("strategy", ["psum", "all_to_all"])
    def test_lookup_matches_dense(self, strategy, rng):
        mesh = make_mesh(data=1, model=8)
        V, E, B = 100, 16, 64
        table = rng.normal(size=(V, E)).astype(np.float32)
        sharded = shard_table(table, mesh)
        lookup = make_sharded_lookup(mesh, strategy)
        ids = rng.integers(0, V, B).astype(np.int32)
        out = jax.jit(lookup)(sharded, jnp.asarray(ids))
        np.testing.assert_allclose(
            np.asarray(out), table[ids], rtol=1e-6
        )

    def test_lookup_with_dp_axis(self, rng):
        # data=2, model=4: each data shard looks up its own half.
        mesh = make_mesh(data=2, model=4)
        V, E, B = 64, 8, 32
        table = rng.normal(size=(V, E)).astype(np.float32)
        sharded = shard_table(table, mesh)
        lookup = make_sharded_lookup(mesh, "psum")
        ids = rng.integers(0, V, B).astype(np.int32)
        from hm_retrieval_tpu.parallel.mesh import batch_sharding

        ids_arr = jax.device_put(ids, batch_sharding(mesh))
        out = jax.jit(lookup)(sharded, ids_arr)
        np.testing.assert_allclose(
            np.asarray(out), table[ids], rtol=1e-6
        )

    def test_zipf_skew_matches_dense(self, rng):
        """SURVEY §7 hard part #4: Zipf-hot ids. The deduped exchange
        must stay exact under heavy duplication."""
        mesh = make_mesh(data=1, model=8)
        V, E, B = 200, 16, 128
        table = rng.normal(size=(V, E)).astype(np.float32)
        sharded = shard_table(table, mesh)
        ids = np.minimum(
            rng.zipf(1.3, B) - 1, V - 1
        ).astype(np.int32)  # heavy head: id 0 repeats ~B/3 times
        for strategy in ("psum", "all_to_all"):
            lookup = make_sharded_lookup(mesh, strategy)
            out = jax.jit(lookup)(sharded, jnp.asarray(ids))
            np.testing.assert_allclose(
                np.asarray(out), table[ids], rtol=1e-6
            )

    def test_zipf_skew_gradients_match_dense(self, rng):
        """Duplicate ids must SUM their gradients into the unique row
        through the deduped exchange, exactly like a dense gather."""
        mesh = make_mesh(data=1, model=8)
        V, E, B = 80, 8, 64
        table = rng.normal(size=(V, E)).astype(np.float32)
        ids = np.minimum(rng.zipf(1.3, B) - 1, V - 1).astype(np.int32)
        w = rng.normal(size=(B, E)).astype(np.float32)

        def dense_loss(t):
            return jnp.sum(jnp.take(t, ids, axis=0) * w)

        g_ref = jax.grad(dense_loss)(jnp.asarray(table))
        lookup = make_sharded_lookup(mesh, "all_to_all")
        sharded = shard_table(table, mesh)

        def dist_loss(t):
            return jnp.sum(lookup(t, jnp.asarray(ids)) * w)

        g_dist = jax.jit(jax.grad(dist_loss))(sharded)
        np.testing.assert_allclose(
            np.asarray(g_dist)[:V], np.asarray(g_ref),
            rtol=1e-5, atol=1e-6,
        )

    def test_hot_id_needs_one_slot(self, rng):
        """A batch of ONE repeated id fits capacity=1: the exchange
        carries O(unique ids), not O(B), per destination shard."""
        mesh = make_mesh(data=1, model=8)
        V, E, B = 64, 8, 48
        table = rng.normal(size=(V, E)).astype(np.float32)
        sharded = shard_table(table, mesh)
        lookup = make_sharded_lookup(
            mesh, "all_to_all", capacity=1
        )
        ids = np.full((B,), 37, np.int32)
        out = jax.jit(lookup)(sharded, jnp.asarray(ids))
        np.testing.assert_allclose(
            np.asarray(out), table[ids], rtol=1e-6
        )

    def test_capacity_overflow_poisons_not_truncates(self, rng):
        """Deduped demand above capacity must be LOUD (NaN), never a
        silently truncated lookup."""
        mesh = make_mesh(data=1, model=8)
        V, E = 64, 8
        table = rng.normal(size=(V, E)).astype(np.float32)
        sharded = shard_table(table, mesh)
        lookup = make_sharded_lookup(
            mesh, "all_to_all", capacity=2
        )
        # 3 distinct ids owned by shard 0 (R = 8): demand 3 > cap 2
        ids = np.array([0, 1, 2, 0, 1, 2, 0, 0], np.int32)
        out = jax.jit(lookup)(sharded, jnp.asarray(ids))
        assert np.isnan(np.asarray(out)).all()

    def test_default_capacity_bounded_by_shard_rows(self, rng):
        """cap defaults to min(B, R): with R < B the exchange shrinks
        automatically and stays exact (a shard cannot own more than R
        distinct ids)."""
        mesh = make_mesh(data=1, model=8)
        V, E, B = 40, 4, 64  # R = 5 < B
        table = rng.normal(size=(V, E)).astype(np.float32)
        sharded = shard_table(table, mesh)
        lookup = make_sharded_lookup(mesh, "all_to_all")
        ids = rng.integers(0, V, B).astype(np.int32)
        out = jax.jit(lookup)(sharded, jnp.asarray(ids))
        np.testing.assert_allclose(
            np.asarray(out), table[ids], rtol=1e-6
        )

    def test_gradient_matches_dense(self, rng):
        mesh = make_mesh(data=1, model=8)
        V, E, B = 40, 4, 16
        table = rng.normal(size=(V, E)).astype(np.float32)
        ids = rng.integers(0, V, B).astype(np.int32)
        w = rng.normal(size=(B, E)).astype(np.float32)

        def dense_loss(t):
            return jnp.sum(jnp.take(t, ids, axis=0) * w)

        g_ref = jax.grad(dense_loss)(jnp.asarray(table))

        lookup = make_sharded_lookup(mesh, "psum")
        sharded = shard_table(table, mesh)

        def dist_loss(t):
            return jnp.sum(lookup(t, jnp.asarray(ids)) * w)

        g_dist = jax.jit(jax.grad(dist_loss))(sharded)
        np.testing.assert_allclose(
            np.asarray(g_dist)[:V], np.asarray(g_ref), rtol=1e-5
        )


class TestShardedTraining:
    def test_sharded_tables_match_replicated(self, model, rng):
        """Row-sharded embedding tables over the model axis must produce
        the same loss + updated params as fully-replicated training."""
        from hm_retrieval_tpu.parallel import (
            create_sharded_train_state,
            make_sharded_train_step,
        )

        batch = global_batch(rng)
        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": 0.05}
        )

        state_ref = create_train_state(model, opt, seed=0)
        step_ref = make_train_step(model, opt)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state_ref, m_ref = step_ref(state_ref, jb)

        mesh = make_mesh(data=2, model=4)
        state_sh = create_sharded_train_state(
            model, opt, mesh, sharded_features=["uid", "article_id"],
            seed=0,
        )
        step_sh = make_sharded_train_step(model, opt, mesh)
        sb = shard_batch(batch, mesh)
        state_sh, m_sh = step_sh(state_sh, sb)

        np.testing.assert_allclose(
            float(m_ref["loss"]), float(m_sh["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(state_ref.params),
            jax.tree.leaves(state_sh.params),
        ):
            b = np.asarray(b)[: np.asarray(a).shape[0]]  # trim row pad
            np.testing.assert_allclose(
                np.asarray(a), b, rtol=1e-4, atol=1e-6
            )

    def test_tables_actually_sharded(self, model):
        from hm_retrieval_tpu.parallel import (
            create_sharded_train_state,
        )
        from jax.sharding import PartitionSpec as P

        opt = OptimizerFactory.get_optimizer(
            "adagrad", {"learning_rate": 0.05}
        )
        mesh = make_mesh(data=1, model=8)
        state = create_sharded_train_state(
            model, opt, mesh, sharded_features=["uid"]
        )
        uid_table = state.params["query_tower"]["embeddings"]["uid"]
        assert uid_table.sharding.spec == P("model", None)
        art = state.params["candidate_tower"]["embeddings"][
            "article_id"
        ]
        assert art.sharding.spec == P()
        # adagrad accumulator follows the table sharding
        accs = [
            leaf
            for leaf in jax.tree.leaves(state.opt_state)
            if hasattr(leaf, "shape")
            and leaf.shape == uid_table.shape
        ]
        assert any(
            a.sharding.spec == P("model", None) for a in accs
        )


def _make_topk(mesh, k, method):
    # pallas on the CPU test mesh runs the kernel in interpret mode with
    # fp32 compute so rankings match the fp32 XLA oracle exactly
    if method == "pallas":
        return make_distributed_topk(
            mesh,
            k,
            method="pallas",
            interpret=True,
            compute_dtype=jnp.float32,
        )
    return make_distributed_topk(mesh, k)


class TestDistributedTopk:
    @pytest.mark.parametrize("method", ["xla", "pallas"])
    def test_matches_single_device(self, rng, method):
        mesh = make_mesh(data=1, model=8)
        N, E, B, k = 1000, 16, 8, 10  # N not divisible by 8 -> padding
        emb = rng.normal(size=(N, E)).astype(np.float32)
        ids = np.arange(1, N + 1, dtype=np.int32)
        q = rng.normal(size=(B, E)).astype(np.float32)

        s_ref, i_ref = topk_dot(jnp.asarray(q), jnp.asarray(emb), k)
        ids_ref = ids[np.asarray(i_ref)]

        semb, sids, sbias = shard_candidates(emb, ids, mesh)
        topk = _make_topk(mesh, k, method)
        s_dist, ids_dist = jax.jit(topk)(
            jnp.asarray(q), semb, sids, sbias
        )
        np.testing.assert_allclose(
            np.asarray(s_ref), np.asarray(s_dist), rtol=1e-5
        )
        # ties could reorder ids; verify via scores only where unique
        np.testing.assert_array_equal(
            np.asarray(ids_dist), ids_ref
        )

    @pytest.mark.parametrize("method", ["xla", "pallas"])
    def test_padding_never_selected(self, rng, method):
        mesh = make_mesh(data=1, model=8)
        N, E, k = 12, 4, 12  # tiny: heavy padding per shard
        emb = rng.normal(size=(N, E)).astype(np.float32)
        ids = np.arange(1, N + 1, dtype=np.int32)
        q = np.zeros((3, E), np.float32)
        semb, sids, sbias = shard_candidates(emb, ids, mesh)
        topk = _make_topk(mesh, k, method)
        s, got = jax.jit(topk)(jnp.asarray(q), semb, sids, sbias)
        assert set(np.asarray(got).ravel()) == set(ids)
        assert np.isfinite(np.asarray(s)).all()


def _make_quant_topk(mesh, k, method, **kw):
    from hm_retrieval_tpu.parallel.distributed_topk import (
        make_distributed_quantized_topk,
    )

    return make_distributed_quantized_topk(
        mesh,
        k,
        method=method,
        interpret=(method == "pallas"),
        **kw,
    )


class TestDistributedQuantizedTopk:
    @pytest.mark.parametrize("method", ["scan", "pallas"])
    @pytest.mark.parametrize("keep_fp32", [True, False])
    def test_matches_single_device(self, rng, keep_fp32, method):
        from hm_retrieval_tpu.parallel.distributed_topk import (
            shard_candidates_quantized,
        )

        mesh = make_mesh(data=1, model=8)
        N, E, B, k = 1000, 16, 8, 10  # N % 8 != 0 -> padding
        emb = rng.normal(size=(N, E)).astype(np.float32)
        ids = np.arange(1, N + 1, dtype=np.int32)
        q = rng.normal(size=(B, E)).astype(np.float32)

        _, i_ref = topk_dot(jnp.asarray(q), jnp.asarray(emb), k)
        ids_ref = ids[np.asarray(i_ref)]

        placed = shard_candidates_quantized(
            emb, ids, mesh, keep_fp32=keep_fp32
        )
        topk = _make_quant_topk(mesh, k, method)
        s, got = topk(jnp.asarray(q), *placed)
        got = np.asarray(got)
        hits = sum(
            len(set(a.tolist()) & set(b.tolist()))
            for a, b in zip(got, ids_ref)
        )
        # int8 + oversample: near-exact; exact rescore when fp32 kept
        assert hits / ids_ref.size >= (0.99 if keep_fp32 else 0.95)
        assert np.isfinite(np.asarray(s)).all()

    @pytest.mark.parametrize("method", ["scan", "pallas"])
    def test_padding_never_selected(self, rng, method):
        from hm_retrieval_tpu.parallel.distributed_topk import (
            shard_candidates_quantized,
        )

        mesh = make_mesh(data=1, model=8)
        N, E, k = 12, 4, 12  # heavy padding per shard
        emb = rng.normal(size=(N, E)).astype(np.float32)
        ids = np.arange(1, N + 1, dtype=np.int32)
        q = np.zeros((3, E), np.float32)
        placed = shard_candidates_quantized(emb, ids, mesh)
        topk = _make_quant_topk(mesh, k, method)
        s, got = topk(jnp.asarray(q), *placed)
        assert set(np.asarray(got).ravel()) == set(ids)
        assert np.isfinite(np.asarray(s)).all()

    @pytest.mark.parametrize("method", ["scan", "pallas"])
    def test_rescored_scores_are_exact(self, rng, method):
        """With fp32 shards kept, returned scores equal the true dot
        products of the returned ids."""
        from hm_retrieval_tpu.parallel.distributed_topk import (
            shard_candidates_quantized,
        )

        mesh = make_mesh(data=1, model=8)
        N, E, B, k = 256, 8, 4, 5
        emb = rng.normal(size=(N, E)).astype(np.float32)
        ids = np.arange(1, N + 1, dtype=np.int32)
        q = rng.normal(size=(B, E)).astype(np.float32)
        placed = shard_candidates_quantized(emb, ids, mesh)
        topk = _make_quant_topk(mesh, k, method)
        s, got = topk(jnp.asarray(q), *placed)
        s, got = np.asarray(s), np.asarray(got)
        for b in range(B):
            want = np.array([q[b] @ emb[i - 1] for i in got[b]])
            np.testing.assert_allclose(s[b], want, rtol=1e-5, atol=1e-5)

    def test_unknown_method_rejected(self):
        from hm_retrieval_tpu.parallel.distributed_topk import (
            make_distributed_quantized_topk,
        )

        mesh = make_mesh(data=1, model=8)
        with pytest.raises(ValueError, match="unknown method"):
            make_distributed_quantized_topk(mesh, 5, method="ivf")
