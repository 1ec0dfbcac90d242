"""Pallas fused retrieval kernel tests (interpret mode on CPU; compiled
exactness + perf validated on real TPU by benchmarks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hm_retrieval_tpu.ops.pallas_retrieval import (
    pallas_exact_topk,
    pallas_quantized_topk,
)


def ref_topk(scores, k):
    return np.sort(scores, axis=1)[:, ::-1][:, :k]


class TestPallasExactTopk:
    @pytest.mark.parametrize("N", [512, 1000, 4096])
    @pytest.mark.parametrize("keep", [1, 2])
    def test_random_matches_oracle(self, rng, N, keep):
        B, E, k = 8, 32, 10
        q = rng.normal(size=(B, E)).astype(np.float32)
        c = rng.normal(size=(N, E)).astype(np.float32)
        v, i, rounds = pallas_exact_topk(
            jnp.asarray(q), jnp.asarray(c), k, L=256, interpret=True, compute_dtype=jnp.float32,
            keep_per_bin=keep,
        )
        scores = q @ c.T
        np.testing.assert_allclose(
            np.asarray(v), ref_topk(scores, k), rtol=1e-5
        )
        # indices point at their scores
        got = np.take_along_axis(scores, np.asarray(i), axis=1)
        np.testing.assert_allclose(got, np.asarray(v), rtol=1e-5)

    @pytest.mark.parametrize("keep", [1, 2])
    def test_adversarial_single_bin_collision(self, rng, keep):
        # every winner lands in the same bin (stride L apart)
        B, E, k, L = 2, 16, 5, 128
        N = L * 8
        c = rng.normal(size=(N, E)).astype(np.float32) * 1e-3
        q = np.ones((B, E), np.float32)
        # plant winners at indices 7, 7+L, 7+2L, ... (same bin 7)
        for j in range(6):
            c[7 + j * L] = (10 - j) * np.ones(E) / E
        v, i, rounds = pallas_exact_topk(
            jnp.asarray(q), jnp.asarray(c), k, L=L, interpret=True, compute_dtype=jnp.float32,
            keep_per_bin=keep,
        )
        scores = q @ c.T
        np.testing.assert_allclose(
            np.asarray(v), ref_topk(scores, k), rtol=1e-5
        )
        if keep == 1:
            assert int(rounds) >= 5  # one round per collision
        else:
            assert int(rounds) <= 4  # top-2 halves the rounds

    def test_duplicate_scores_tie_break(self):
        B, E, k, L = 1, 8, 4, 64
        N = 256
        c = np.zeros((N, E), np.float32)
        # 6 identical-score candidates: exact top-k VALUES are the tie
        # score and indices must be 4 distinct members of the tied set
        # (tie resolution is positional, like lax.top_k)
        tied = [3, 67, 131, 150, 195, 200]
        for j in tied:
            c[j] = np.ones(E) / E
        q = np.ones((B, E), np.float32)
        v, i, _ = pallas_exact_topk(
            jnp.asarray(q), jnp.asarray(c), k, L=L, interpret=True, compute_dtype=jnp.float32
        )
        np.testing.assert_allclose(np.asarray(v), 1.0, rtol=1e-6)
        ids = np.asarray(i)[0]
        assert len(set(ids.tolist())) == k
        assert set(ids.tolist()) <= set(tied)

    def test_quantized_matches_dequantized_oracle(self, rng):
        """pallas_quantized_topk is the EXACT top-k of the dequantized
        score matrix Q @ (codes * scales)^T (quantization error lives
        in the catalog, not the kernel)."""
        from hm_retrieval_tpu.indices.quantized import quantize_rows

        B, E, N, k = 8, 32, 1000, 10
        q = rng.normal(size=(B, E)).astype(np.float32)
        emb = rng.normal(size=(N, E)).astype(np.float32)
        codes, scales = quantize_rows(emb)
        v, i, _ = pallas_quantized_topk(
            jnp.asarray(q),
            jnp.asarray(codes),
            jnp.asarray(scales),
            k,
            L=256,
            interpret=True,
            compute_dtype=jnp.float32,
        )
        deq = codes.astype(np.float32) * scales[:, None]
        scores = q @ deq.T
        np.testing.assert_allclose(
            np.asarray(v), ref_topk(scores, k), rtol=1e-5
        )
        got = np.take_along_axis(scores, np.asarray(i), axis=1)
        np.testing.assert_allclose(got, np.asarray(v), rtol=1e-5)

    def test_quantized_n_valid_masks_padded_rows(self, rng):
        from hm_retrieval_tpu.indices.quantized import quantize_rows

        B, E, N, k, n_valid = 4, 16, 512, 8, 450
        q = rng.normal(size=(B, E)).astype(np.float32)
        emb = rng.normal(size=(N, E)).astype(np.float32)
        # make the tail rows the best scorers: they must still lose
        emb[n_valid:] *= 100.0
        codes, scales = quantize_rows(emb)
        v, i, _ = pallas_quantized_topk(
            jnp.asarray(q),
            jnp.asarray(codes),
            jnp.asarray(scales),
            k,
            n_valid=n_valid,
            L=128,
            interpret=True,
            compute_dtype=jnp.float32,
        )
        assert np.asarray(i).max() < n_valid
        deq = codes.astype(np.float32) * scales[:, None]
        scores = (q @ deq.T)[:, :n_valid]
        np.testing.assert_allclose(
            np.asarray(v), ref_topk(scores, k), rtol=1e-5
        )

    def test_quantized_validation(self):
        with pytest.raises(ValueError, match="n_valid"):
            pallas_quantized_topk(
                jnp.zeros((2, 8)),
                jnp.zeros((128, 8), jnp.int8),
                jnp.ones((128,)),
                10,
                n_valid=5,
                L=64,
                interpret=True,
            )

    def test_k_exceeds_bins_rejected(self):
        with pytest.raises(ValueError, match="<= L"):
            pallas_exact_topk(
                jnp.zeros((2, 8)), jnp.zeros((512, 8)), 300, L=256,
                interpret=True,
            )

    def test_n_smaller_than_bins(self, rng):
        B, E, k, L, N = 4, 16, 8, 256, 100
        q = rng.normal(size=(B, E)).astype(np.float32)
        c = rng.normal(size=(N, E)).astype(np.float32)
        v, i, _ = pallas_exact_topk(
            jnp.asarray(q), jnp.asarray(c), k, L=L, interpret=True, compute_dtype=jnp.float32
        )
        scores = q @ c.T
        np.testing.assert_allclose(
            np.asarray(v), ref_topk(scores, k), rtol=1e-5
        )


class TestDeviceParameterizedBudget:
    """pick_bins/vmem_budget derive the VMEM budget from the queried
    device generation (VERDICT r2 weak #6): v5e/v4 = 16MiB class
    (measured), v5p/v6 = 32MiB class (published spec)."""

    class _Dev:
        def __init__(self, kind):
            self.device_kind = kind

    def test_budget_by_device_kind(self):
        from hm_retrieval_tpu.ops.pallas_retrieval import (
            VMEM_BUDGET,
            vmem_budget,
        )

        v5e = int(16 * 2**20 * 0.9)
        v5p = int(32 * 2**20 * 0.9)
        assert vmem_budget(self._Dev("TPU v5 lite")) == v5e
        assert vmem_budget(self._Dev("TPU v5e")) == v5e
        assert vmem_budget(self._Dev("TPU v4")) == v5e
        assert vmem_budget(self._Dev("TPU v5p")) == v5p
        assert vmem_budget(self._Dev("TPU v6 lite")) == v5p
        # unknown kinds (incl. the CPU test backend) fall back to the
        # measured v5e constant
        assert vmem_budget(self._Dev("Colossus")) == VMEM_BUDGET
        assert vmem_budget() == VMEM_BUDGET  # cpu default device

    def test_pick_bins_scales_with_budget(self):
        from hm_retrieval_tpu.ops.pallas_retrieval import (
            pick_bins,
            vmem_budget,
            vmem_estimate,
        )

        v5e = vmem_budget(self._Dev("TPU v5e"))
        v5p = vmem_budget(self._Dev("TPU v5p"))
        # a (B, E, k) point sized to be infeasible in 16MiB but
        # feasible in 32MiB at the smallest bin count
        B, E, k = 2048, 128, 100
        assert vmem_estimate(B, E, 256, 2) > v5e
        assert vmem_estimate(B, E, 256, 2) <= v5p
        assert pick_bins(B, E, k, 2, budget=v5e) is None
        assert pick_bins(B, E, k, 2, budget=v5p) is not None
        # and the guard still refuses outright-infeasible configs
        assert pick_bins(100_000, 128, 100, 2, budget=v5p) is None

    def test_kernel_guard_uses_device_budget(self, monkeypatch):
        """The kernel driver refuses configs over the CURRENT device's
        budget (not a hardcoded constant)."""
        import numpy as np
        import pytest

        from hm_retrieval_tpu.ops import pallas_retrieval as pr

        q = np.zeros((2048, 128), np.float32)
        c = np.zeros((4096, 128), np.float32)
        monkeypatch.setattr(pr, "vmem_budget", lambda *a: 1_000_000)
        with pytest.raises(ValueError, match="VMEM"):
            pr.pallas_exact_topk(q, c, 100, L=256, q_block=2048)


class TestSinglePassLayout:
    """The threshold-free single-pass layout must keep a FULL B=1024
    batch resident within the validated v5e budget — that's what makes
    the catalog stream once (VERDICT r2 weak #1)."""

    def test_full_batch_feasible_at_v5e(self):
        from hm_retrieval_tpu.ops.pallas_retrieval import (
            VMEM_BUDGET,
            pick_bins,
            vmem_estimate,
            vmem_estimate_first,
        )

        # 10M-point shape: B=1024, E=128, k_over=200
        assert (
            vmem_estimate_first(1024, 128, 512) <= VMEM_BUDGET
        )
        assert (
            pick_bins(
                1024, 128, 200, 2, first_pass=True,
                budget=VMEM_BUDGET,
            )
            is not None
        )
        # ... while the refinement layout can't reach L=512 at the
        # full batch (the reason the old driver was stuck at small
        # q_blocks)
        assert vmem_estimate(1024, 128, 512, 2) > VMEM_BUDGET
        refine_L = pick_bins(1024, 128, 200, 2, budget=VMEM_BUDGET)
        assert refine_L is None or refine_L < 512

    def test_single_pass_matches_rescore_oracle(self, rng):
        """End-to-end single-pass driver (auto q_block = full batch)
        against brute force, with bias + n_valid in play."""
        import jax.numpy as jnp

        from hm_retrieval_tpu.ops.pallas_retrieval import (
            pallas_quantized_topk,
        )
        from hm_retrieval_tpu.ops.topk import topk_dot

        N, E, B, k = 3000, 16, 16, 10
        c = rng.normal(size=(N, E)).astype(np.float32)
        q = rng.normal(size=(B, E)).astype(np.float32)
        scales = np.max(np.abs(c), axis=1) / 127.0
        codes = np.clip(
            np.rint(c / scales[:, None]), -127, 127
        ).astype(np.int8)
        n_valid = 2500  # rows beyond must never surface

        v, idx, rounds = pallas_quantized_topk(
            jnp.asarray(q),
            jnp.asarray(codes),
            jnp.asarray(scales),
            k,
            n_valid=n_valid,
            max_rounds=1,
            interpret=True,
            compute_dtype=jnp.float32,
        )
        assert int(rounds) == 1
        assert np.asarray(idx).max() < n_valid
        # survivors vs the dequantized-score oracle over valid rows
        deq = codes.astype(np.float32) * scales[:, None]
        s_ref, i_ref = topk_dot(
            jnp.asarray(q), jnp.asarray(deq[:n_valid]), k
        )
        ref_sets = [set(r) for r in np.asarray(i_ref)]
        got_sets = [set(r) for r in np.asarray(idx)]
        recall = np.mean(
            [len(a & b) / k for a, b in zip(ref_sets, got_sets)]
        )
        assert recall >= 0.95


class TestFoldPass:
    def test_fold_matches_oracle(self, rng):
        """Fold-by-F survivor selection: near-oracle recall and exact
        validity semantics (bias-encoded pads never surface)."""
        import jax.numpy as jnp

        from hm_retrieval_tpu.ops.pallas_retrieval import (
            pallas_quantized_topk,
        )
        from hm_retrieval_tpu.ops.topk import topk_dot

        N, E, B, k = 5000, 16, 16, 10
        c = rng.normal(size=(N, E)).astype(np.float32)
        q = rng.normal(size=(B, E)).astype(np.float32)
        scales = np.max(np.abs(c), axis=1) / 127.0
        codes = np.clip(
            np.rint(c / scales[:, None]), -127, 127
        ).astype(np.int8)
        n_valid = 4321

        deq = codes.astype(np.float32) * scales[:, None]
        _, i_ref = topk_dot(
            jnp.asarray(q), jnp.asarray(deq[:n_valid]), k
        )
        ref_sets = [set(r) for r in np.asarray(i_ref)]
        for F in (2, 4):
            v, idx, rounds = pallas_quantized_topk(
                jnp.asarray(q),
                jnp.asarray(codes),
                jnp.asarray(scales),
                k,
                n_valid=n_valid,
                max_rounds=1,
                interpret=True,
                compute_dtype=jnp.float32,
                fold=F,
                L=256,
            )
            assert int(rounds) == 1
            assert np.asarray(idx).max() < n_valid
            got_sets = [set(r) for r in np.asarray(idx)]
            recall = np.mean(
                [
                    len(a & b) / k
                    for a, b in zip(ref_sets, got_sets)
                ]
            )
            assert recall >= 0.9, (F, recall)

    def test_global_scale_pass_matches_oracle(self, rng):
        """pallas_quantized_topk_global: raw-score kernel (no dequant
        FMA, no mask) + XLA tail merge == exact top-k of the globally
        dequantized scores, for tails of every size including
        kernel-free (n_valid < fold*L) and tail-free
        (n_valid % (fold*L) == 0)."""
        import jax.numpy as jnp

        from hm_retrieval_tpu.indices.quantized import (
            quantize_rows_global,
        )
        from hm_retrieval_tpu.ops.pallas_retrieval import (
            pallas_quantized_topk_global,
        )

        E, B, k, L = 16, 8, 10, 256
        q = rng.normal(size=(B, E)).astype(np.float32)
        for F, n_valid in (
            (1, 1000),   # tail 1000 - 768 = 232
            (1, 512),    # no tail
            (2, 300),    # n_valid < F*L: tail-only, no kernel launch
            (2, 1500),   # fold + tail
        ):
            N = max(n_valid, 2048)
            emb = rng.normal(size=(N, E)).astype(np.float32)
            codes, g = quantize_rows_global(emb)
            v, i, rounds = pallas_quantized_topk_global(
                jnp.asarray(q),
                jnp.asarray(codes),
                g,
                k,
                n_valid=n_valid,
                L=L,
                fold=F,
                interpret=True,
                compute_dtype=jnp.float32,
            )
            assert int(rounds) == 1
            assert np.asarray(i).max() < n_valid
            scores = (
                q @ (codes[:n_valid].astype(np.float32) * g).T
            )
            want = ref_topk(scores, k)
            if F == 1:
                # no fold losses: exact values
                np.testing.assert_allclose(
                    np.asarray(v), want, rtol=1e-5, atol=1e-6
                )
            else:
                got_sets = [set(r) for r in np.asarray(i)]
                ref_i = np.argsort(-scores, axis=1)[:, :k]
                recall = np.mean(
                    [
                        len(a & set(b)) / k
                        for a, b in zip(got_sets, ref_i)
                    ]
                )
                assert recall >= 0.9, (F, n_valid, recall)

    def test_global_scale_validation(self):
        from hm_retrieval_tpu.ops.pallas_retrieval import (
            pallas_quantized_topk_global,
        )

        with pytest.raises(ValueError, match="n_valid"):
            pallas_quantized_topk_global(
                jnp.zeros((2, 8)),
                jnp.zeros((16, 8), jnp.int8),
                1.0,
                4,
                n_valid=32,
                interpret=True,
            )

    def test_fold_rejected_with_rounds(self, rng):
        import pytest as _pytest

        from hm_retrieval_tpu.ops.pallas_retrieval import (
            pallas_quantized_topk,
        )

        with _pytest.raises(ValueError, match="fold"):
            pallas_quantized_topk(
                np.zeros((4, 16), np.float32),
                np.zeros((512, 16), np.int8),
                np.ones(512, np.float32),
                5,
                max_rounds=2,
                fold=2,
                interpret=True,
            )


class TestLockstepVariant:
    def test_lockstep_matches_per_block_and_oracle(self, rng):
        """The opt-in lockstep refinement (full-width merges) must be
        exactly the per-block path's result — it only changes merge
        batching and the done-test granularity."""
        B, E, N, k = 256, 16, 3000, 600
        q = rng.normal(size=(B, E)).astype(np.float32)
        c = rng.normal(size=(N, E)).astype(np.float32)
        want = ref_topk(q @ c.T, k)
        v1, i1, _ = pallas_exact_topk(
            jnp.asarray(q), jnp.asarray(c), k,
            interpret=True, compute_dtype=jnp.float32,
            q_block=128, lockstep=True,
        )
        v0, i0, _ = pallas_exact_topk(
            jnp.asarray(q), jnp.asarray(c), k,
            interpret=True, compute_dtype=jnp.float32,
            q_block=128, lockstep=False,
        )
        np.testing.assert_allclose(np.asarray(v1), want, rtol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(i1), np.asarray(i0)
        )

    def test_lockstep_validation(self, rng):
        q = rng.normal(size=(200, 16)).astype(np.float32)
        c = rng.normal(size=(1000, 16)).astype(np.float32)
        with pytest.raises(ValueError, match="divisible"):
            pallas_exact_topk(
                jnp.asarray(q), jnp.asarray(c), 10,
                interpret=True, q_block=128, lockstep=True,
            )


class TestAutoPolicyLargeK:
    def test_large_k_over_still_feasible(self, rng):
        """Regression (round-3 review finding): the joint (q_block,
        fold) auto policy must probe feasibility with the ACTUAL L that
        pick_bins would choose — with k_over=600 (k=150, oversample=4)
        the fixed-L probe locked in q_block=1024 and then raised at L
        selection, where smaller blocks work."""
        import jax.numpy as jnp

        from hm_retrieval_tpu.ops.pallas_retrieval import (
            pallas_quantized_topk,
        )

        # B=1024 is load-bearing: the broken policy chose q_block=1024
        # (feasible at the fixed probe L) and then failed at the real
        # L >= 600 selection
        N, E, B, k_over = 2000, 128, 1024, 600
        c = rng.normal(size=(N, E)).astype(np.float32)
        scales = np.max(np.abs(c), axis=1) / 127.0
        codes = np.clip(
            np.rint(c / scales[:, None]), -127, 127
        ).astype(np.int8)
        q = rng.normal(size=(B, E)).astype(np.float32)
        # must not raise "no feasible bin count"
        v, idx, rounds = pallas_quantized_topk(
            jnp.asarray(q),
            jnp.asarray(codes),
            jnp.asarray(scales),
            k_over,
            max_rounds=1,
            interpret=True,
            compute_dtype=jnp.float32,
        )
        assert v.shape == (B, k_over)
        assert int(rounds) == 1
