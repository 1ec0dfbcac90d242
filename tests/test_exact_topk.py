"""Exactness tests for the iterative PartialReduce top-k against the
lax.top_k oracle, including adversarial score layouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hm_retrieval_tpu.ops.exact_topk import (
    exact_topk_dot,
    exact_topk_scores,
)
from hm_retrieval_tpu.ops.topk import topk_dot


def assert_same_topk(scores, v, i, k):
    """Compare against np sort; sets compared to tolerate tie order."""
    ref = np.sort(scores, axis=1)[:, ::-1][:, :k]
    np.testing.assert_allclose(
        np.sort(np.asarray(v), axis=1)[:, ::-1], ref, rtol=1e-6
    )
    # indices must point at their values
    got_vals = np.take_along_axis(scores, np.asarray(i), axis=1)
    np.testing.assert_allclose(
        got_vals, np.asarray(v), rtol=1e-6
    )


class TestExactTopk:
    def test_random_matches_oracle(self, rng):
        B, N, k = 16, 2048, 50
        s = rng.normal(size=(B, N)).astype(np.float32)
        v, i, rounds = exact_topk_scores(jnp.asarray(s), k)
        assert_same_topk(s, v, i, k)
        assert int(rounds) >= 1

    def test_adversarial_clustered_rows(self, rng):
        # all large values packed contiguously -> maximal bin collisions
        # under strided binning
        B, N, k = 4, 4096, 32
        s = np.zeros((B, N), np.float32)
        s[:, :64] = (
            1000 + rng.normal(size=(B, 64)).astype(np.float32)
        )
        v, i, rounds = exact_topk_scores(jnp.asarray(s), k)
        assert_same_topk(s, v, i, k)

    def test_duplicate_scores(self):
        B, N, k = 2, 1024, 10
        s = np.zeros((B, N), np.float32)
        s[:, 100:120] = 5.0  # 20 tied winners, k=10
        v, i, _ = exact_topk_scores(jnp.asarray(s), k)
        v = np.asarray(v)
        np.testing.assert_allclose(v, 5.0)
        assert all(
            100 <= j < 120 for j in np.asarray(i).ravel()
        )

    def test_descending_rows(self):
        # worst case for contiguous winners
        B, N, k = 2, 2048, 100
        s = np.tile(
            np.arange(N, 0, -1, dtype=np.float32), (B, 1)
        )
        v, i, _ = exact_topk_scores(jnp.asarray(s), k)
        assert_same_topk(s, v, i, k)

    def test_dot_variant_matches_topk_dot(self, rng):
        B, N, E, k = 8, 1024, 16, 20
        q = rng.normal(size=(B, E)).astype(np.float32)
        c = rng.normal(size=(N, E)).astype(np.float32)
        v_ref, i_ref = topk_dot(jnp.asarray(q), jnp.asarray(c), k)
        v, i = exact_topk_dot(jnp.asarray(q), jnp.asarray(c), k)
        np.testing.assert_allclose(
            np.sort(np.asarray(v), axis=1),
            np.sort(np.asarray(v_ref), axis=1),
            rtol=1e-5,
        )

    def test_k_too_large_rejected(self):
        with pytest.raises(ValueError):
            exact_topk_scores(jnp.zeros((2, 8)), 9)
