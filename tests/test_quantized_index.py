"""Int8 quantized scan index: near-exact recall vs the brute-force
oracle, multi-chunk merge correctness, rescore semantics, persistence,
and the runner/serving integration via ModelConfig.index_type.
(Beyond-parity ANN component — the reference is exact-only,
ref: pkg/modelling/indices/brute_force.py:75-83.)"""

import dataclasses
import os
import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from hm_retrieval_tpu.indices.brute_force import BruteForceIndex
from hm_retrieval_tpu.indices.quantized import (
    QuantizedIndex,
    quantize_rows,
)

from tests.test_runners import pipeline  # noqa: F401


def recall_vs_oracle(got_ids, want_ids):
    hits = 0
    for g, w in zip(got_ids, want_ids):
        hits += len(set(g.tolist()) & set(w.tolist()))
    return hits / want_ids.size


class TestQuantizeRows:
    def test_roundtrip_error_bounded(self, rng):
        emb = rng.normal(size=(64, 16)).astype(np.float32)
        codes, scales = quantize_rows(emb)
        deq = codes.astype(np.float32) * scales[:, None]
        err = np.abs(deq - emb).max(axis=1)
        assert (err <= scales / 2 + 1e-6).all()

    def test_zero_row(self):
        codes, scales = quantize_rows(np.zeros((2, 4)))
        assert (codes == 0).all() and (scales == 1.0).all()


class TestQuantizedIndex:
    def _data(self, rng, n=3000, e=32):
        emb = rng.normal(size=(n, e)).astype(np.float32)
        ids = rng.permutation(n).astype(np.int32) + 1
        q = rng.normal(size=(17, e)).astype(np.float32)
        return ids, emb, q

    def test_recall_vs_exact_oracle(self, rng):
        ids, emb, q = self._data(rng)
        k = 20
        oracle = BruteForceIndex(k, ids, emb, method="full")
        _, want = oracle.topk_from_embeddings(jnp.asarray(q))
        idx = QuantizedIndex(k, ids, emb)
        _, got = idx.topk_from_embeddings(jnp.asarray(q))
        r = recall_vs_oracle(np.asarray(got), np.asarray(want))
        assert r >= 0.99

    def test_rescore_orders_exactly(self, rng):
        """With rescore, returned scores are the exact fp32 dot
        products and the ids that survive are ordered exactly."""
        ids, emb, q = self._data(rng, n=500)
        idx = QuantizedIndex(5, ids, emb, rescore=True)
        scores, got = idx.topk_from_embeddings(jnp.asarray(q))
        scores, got = np.asarray(scores), np.asarray(got)
        id_to_row = {
            int(i): emb[j] for j, i in enumerate(ids.tolist())
        }
        for b in range(len(q)):
            want = np.array(
                [q[b] @ id_to_row[int(i)] for i in got[b]]
            )
            np.testing.assert_allclose(
                scores[b], want, rtol=1e-5, atol=1e-5
            )
            assert (np.diff(scores[b]) <= 1e-6).all()

    def test_multi_chunk_equals_single_chunk(self, rng):
        ids, emb, q = self._data(rng, n=4096)
        one = QuantizedIndex(10, ids, emb, chunk=4096)
        many = QuantizedIndex(10, ids, emb, chunk=1024)
        _, a = one.topk_from_embeddings(jnp.asarray(q))
        _, b = many.topk_from_embeddings(jnp.asarray(q))
        # both rescore in fp32, so the candidate sets may differ at the
        # margin but the top ids should agree almost everywhere
        r = recall_vs_oracle(np.asarray(a), np.asarray(b))
        assert r >= 0.99

    def test_padding_never_selected(self, rng):
        ids = np.array([1, 2, 3], np.int32)
        emb = np.eye(3, 8, dtype=np.float32)
        idx = QuantizedIndex(3, ids, emb)
        scores, got = idx.topk_from_embeddings(
            jnp.zeros((4, 8), jnp.float32)
        )
        assert set(np.asarray(got).ravel()) == {1, 2, 3}
        assert np.isfinite(np.asarray(scores)).all()

    def test_no_rescore_path(self, rng):
        ids, emb, q = self._data(rng, n=800)
        k = 10
        oracle = BruteForceIndex(k, ids, emb, method="full")
        _, want = oracle.topk_from_embeddings(jnp.asarray(q))
        idx = QuantizedIndex(k, ids, emb, rescore=False)
        assert idx.embeddings is None
        _, got = idx.topk_from_embeddings(jnp.asarray(q))
        r = recall_vs_oracle(np.asarray(got), np.asarray(want))
        assert r >= 0.95  # 8-bit ranking without rescore

    def test_query_api(self, rng):
        from tests.test_indices import MockEmbeddingTable

        ids = np.array([1, 2, 3], np.int32)
        emb = np.array(
            [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], np.float32
        )
        table = np.array(
            [[2.0, 0.0], [0.0, 2.0]], np.float32
        )
        idx = QuantizedIndex(2, ids, emb)
        got = np.asarray(
            idx.query(
                MockEmbeddingTable(table),
                {"qid": jnp.array([0, 1], jnp.int32)},
            )
        )
        assert set(got[0]) == {1, 3}
        assert set(got[1]) == {2, 3}

    @pytest.mark.parametrize("rescore", [True, False])
    def test_save_load_roundtrip(self, rng, tmp_path, rescore):
        ids, emb, q = self._data(rng, n=600)
        idx = QuantizedIndex(7, ids, emb, rescore=rescore)
        _, want = idx.topk_from_embeddings(jnp.asarray(q))
        idx.save(str(tmp_path))
        loaded = QuantizedIndex.load(str(tmp_path))
        assert loaded.rescore == rescore
        assert loaded.k == 7
        assert loaded.num_candidates == 600
        _, got = loaded.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want)
        )

    def test_build_from_batches(self, rng):
        ids, emb, q = self._data(rng, n=100, e=8)
        table = jnp.asarray(emb)
        # ids is a permutation of 1..100: invert it so id -> its row
        row_of_id = np.empty(101, np.int32)
        row_of_id[ids] = np.arange(100, dtype=np.int32)
        row_of_id = jnp.asarray(row_of_id)

        def embed(batch):
            return jnp.take(
                table,
                jnp.take(row_of_id, batch["article_id"]),
                axis=0,
            )

        batches = [
            {"article_id": ids[lo : lo + 32]}
            for lo in range(0, 100, 32)
        ]
        idx = QuantizedIndex.build_from_batches(
            5, "article_id", embed, batches, 32
        )
        assert idx.num_candidates == 100
        oracle = BruteForceIndex(5, ids, emb, method="full")
        _, want = oracle.topk_from_embeddings(jnp.asarray(q))
        _, got = idx.topk_from_embeddings(jnp.asarray(q))
        assert (
            recall_vs_oracle(np.asarray(got), np.asarray(want))
            >= 0.99
        )


    def test_exact_when_k_over_exceeds_catalog(self, rng):
        """When oversample*k exceeds the real catalog, every real row
        survives and the rescore must return the EXACT top-k — the
        -inf init/tie slots must never resurface as duplicate real
        rows (regression: ReLU towers + small catalogs returned
        duplicated row 0 and collapsed Recall@100 to Recall@10)."""
        emb = np.maximum(
            rng.normal(size=(300, 64)), 0
        ).astype(np.float32)
        q = np.maximum(
            rng.normal(size=(20, 64)), 0
        ).astype(np.float32)
        ids = np.arange(1, 301, dtype=np.int32)
        oracle = BruteForceIndex(100, ids, emb, method="full")
        _, want = oracle.topk_from_embeddings(jnp.asarray(q))
        idx = QuantizedIndex(100, ids, emb)  # k_over=400 > 300
        _, got = idx.topk_from_embeddings(jnp.asarray(q))
        got = np.asarray(got)
        for row in got:
            assert len(set(row.tolist())) == 100  # no duplicates
        assert (
            recall_vs_oracle(got, np.asarray(want)) == 1.0
        )  # all real rows survive -> rescore is fully exact

    def test_pallas_method_exact_when_all_rows_survive(self, rng):
        """method='pallas' (interpret on CPU): when k_over covers the
        whole catalog the fp32 rescore makes the result exactly the
        brute-force top-k, independent of the survivor engine."""
        ids, emb, q = self._data(rng, n=150, e=16)
        k = 30  # k_over = 120 -> min(k_over, 150) with oversample=4
        oracle = BruteForceIndex(k, ids, emb, method="full")
        _, want = oracle.topk_from_embeddings(jnp.asarray(q))
        idx = QuantizedIndex(
            k, ids, emb, oversample=5, method="pallas"
        )  # k_over = min(150, chunk)
        assert idx.method == "pallas"
        _, got = idx.topk_from_embeddings(jnp.asarray(q))
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want)
        )

    def test_pallas_method_recall(self, rng):
        ids, emb, q = self._data(rng, n=600, e=16)
        k = 10
        oracle = BruteForceIndex(k, ids, emb, method="full")
        _, want = oracle.topk_from_embeddings(jnp.asarray(q))
        idx = QuantizedIndex(k, ids, emb, method="pallas")
        _, got = idx.topk_from_embeddings(jnp.asarray(q))
        assert (
            recall_vs_oracle(np.asarray(got), np.asarray(want))
            >= 0.99
        )

    def test_pallas_method_no_rescore(self, rng):
        """Without the fp32 table the pallas path ranks by dequantized
        scores with bf16 queries — at least as accurate as the int8
        query scan."""
        ids, emb, q = self._data(rng, n=400, e=16)
        k = 5
        oracle = BruteForceIndex(k, ids, emb, method="full")
        _, want = oracle.topk_from_embeddings(jnp.asarray(q))
        idx = QuantizedIndex(
            k, ids, emb, rescore=False, method="pallas"
        )
        assert idx.embeddings is None
        _, got = idx.topk_from_embeddings(jnp.asarray(q))
        assert (
            recall_vs_oracle(np.asarray(got), np.asarray(want))
            >= 0.95
        )

    def test_pallas_method_load_remaps_off_tpu(
        self, rng, tmp_path, caplog
    ):
        """Persisted method='pallas' loads as 'scan' on a CPU backend
        (interpret mode is correct but unusably slow for serving)."""
        ids, emb, q = self._data(rng, n=300, e=16)
        idx = QuantizedIndex(
            4, ids, emb, method="pallas", pallas_rounds=2
        )
        _, want = idx.topk_from_embeddings(jnp.asarray(q))
        idx.save(str(tmp_path))
        import json

        with open(str(tmp_path / "meta.json")) as f:
            meta = json.load(f)
        assert meta["method"] == "pallas"
        assert meta["pallas_rounds"] == 2
        loaded = QuantizedIndex.load(str(tmp_path))
        assert loaded.method == "scan"
        assert loaded.pallas_rounds == 2
        _, got = loaded.topk_from_embeddings(jnp.asarray(q))
        # both rescore the survivors in fp32; sets agree near-exactly
        assert (
            recall_vs_oracle(np.asarray(got), np.asarray(want))
            >= 0.99
        )

    def test_global_scale_mode_recall(self, rng):
        """scale_mode='global' on NON-uniform row norms (lognormal
        spread — the realistic case where one shared scale hurts):
        rescore keeps recall near the per-row mode's."""
        ids, emb, q = self._data(rng, n=2000, e=32)
        # lognormal row-norm spread: sigma=1 -> ~20x norm range
        emb = emb * rng.lognormal(0.0, 1.0, (len(emb), 1)).astype(
            np.float32
        )
        k = 20
        oracle = BruteForceIndex(k, ids, emb, method="full")
        _, want = oracle.topk_from_embeddings(jnp.asarray(q))
        r = {}
        for mode in ("per_row", "global"):
            idx = QuantizedIndex(
                k, ids, emb, method="pallas", scale_mode=mode
            )
            _, got = idx.topk_from_embeddings(jnp.asarray(q))
            r[mode] = recall_vs_oracle(
                np.asarray(got), np.asarray(want)
            )
        assert r["per_row"] >= 0.99
        # the global mode gives up some survivor resolution; with the
        # default 4x oversample + rescore it must stay close
        assert r["global"] >= 0.95, r

    def test_global_scale_pallas_path_engaged(self, rng):
        """The global mode with pallas_rounds=1 must route through the
        raw kernel entry (no per-column scales reach the kernel)."""
        from unittest import mock

        ids, emb, q = self._data(rng, n=600, e=16)
        idx = QuantizedIndex(
            5, ids, emb, method="pallas", scale_mode="global"
        )
        assert idx.global_scale is not None
        with mock.patch.object(
            QuantizedIndex,
            "_topk_pallas_global",
            wraps=QuantizedIndex._topk_pallas_global,
        ) as spy:
            idx.topk_from_embeddings(jnp.asarray(q))
            assert spy.called

    def test_global_scale_save_load_roundtrip(self, rng, tmp_path):
        for rescore in (True, False):
            ids, emb, q = self._data(rng, n=400, e=16)
            idx = QuantizedIndex(
                5,
                ids,
                emb,
                rescore=rescore,
                method="scan",
                scale_mode="global",
            )
            d = str(tmp_path / f"g_{rescore}")
            idx.save(d)
            loaded = QuantizedIndex.load(d)
            assert loaded.scale_mode == "global"
            assert loaded.global_scale == idx.global_scale
            _, a = idx.topk_from_embeddings(jnp.asarray(q))
            _, b = loaded.topk_from_embeddings(jnp.asarray(q))
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            )

    def test_auto_shrinks_infeasible_survivor_set(self, rng):
        """Large k with the default oversample would make the pallas
        survivor set infeasible (k' > max bin count): method='auto'
        with rescore shrinks k_over to the largest feasible size
        instead of silently dropping to the ~16x-slower scan
        (BASELINE.md k=1000 sweep: rescore bounds recall, not the
        survivor count)."""
        from unittest import mock

        ids, emb, q = self._data(rng, n=3000, e=16)
        k = 600  # oversample=4 -> k'=2400 > L_max=2048: infeasible
        with mock.patch(
            "jax.default_backend", return_value="tpu"
        ):
            idx = QuantizedIndex.__new__(QuantizedIndex)
            QuantizedIndex.__init__(
                idx, k, ids, emb, oversample=4, method="auto"
            )
        assert idx.method == "pallas"
        assert idx.k_over == 2 * k  # largest feasible candidate
        # rescore still exact over the survivors (run via interpret)
        oracle = BruteForceIndex(k, ids, emb, method="full")
        _, want = oracle.topk_from_embeddings(jnp.asarray(q))
        _, got = idx.topk_from_embeddings(jnp.asarray(q))
        assert (
            recall_vs_oracle(np.asarray(got), np.asarray(want))
            >= 0.97
        )

    def test_auto_shrunk_index_survives_save_load(
        self, rng, tmp_path
    ):
        """save() records the RESOLVED method ('pallas') in meta; the
        reload must re-shrink the infeasible oversampled survivor set
        identically instead of crashing on its first query (the shrink
        applies to explicit 'pallas' too for exactly this reason)."""
        from unittest import mock

        ids, emb, q = self._data(rng, n=3000, e=16)
        k = 600
        with mock.patch(
            "jax.default_backend", return_value="tpu"
        ):
            idx = QuantizedIndex.__new__(QuantizedIndex)
            QuantizedIndex.__init__(
                idx, k, ids, emb, oversample=4, method="auto"
            )
            assert (idx.method, idx.k_over) == ("pallas", 1200)
            d = str(tmp_path / "shrunk")
            idx.save(d)
            loaded = QuantizedIndex.load(d)
            assert (loaded.method, loaded.k_over) == (
                "pallas",
                1200,
            )
        # query off-TPU: load remaps pallas->scan but the shrink must
        # also round-trip through that path without error
        reloaded = QuantizedIndex.load(d)
        _, got = reloaded.topk_from_embeddings(jnp.asarray(q))
        assert got.shape == (len(q), k)

    def test_explicit_scan_request_honored_at_large_k(self, rng):
        ids, emb, _ = self._data(rng, n=3000, e=16)
        idx = QuantizedIndex(
            600, ids, emb, oversample=4, method="scan"
        )
        assert idx.method == "scan"
        assert idx.k_over == 2400  # literal oversample preserved

    def test_load_index_dispatch(self, rng, tmp_path):
        from hm_retrieval_tpu.indices import load_index

        ids, emb, _ = self._data(rng, n=300)
        QuantizedIndex(3, ids, emb).save(str(tmp_path / "q"))
        BruteForceIndex(3, ids, emb).save(str(tmp_path / "b"))
        assert isinstance(
            load_index(str(tmp_path / "q")), QuantizedIndex
        )
        assert isinstance(
            load_index(str(tmp_path / "b")), BruteForceIndex
        )

    def test_validation(self, rng):
        ids = np.arange(10, dtype=np.int32)
        emb = np.ones((10, 4), np.float32)
        with pytest.raises(ValueError):
            QuantizedIndex(0, ids, emb)
        with pytest.raises(ValueError):
            QuantizedIndex(11, ids, emb)
        with pytest.raises(ValueError):
            QuantizedIndex(2, ids, emb, oversample=0)
        with pytest.raises(ValueError):
            QuantizedIndex(2, ids, emb, recall_target=0.0)
        with pytest.raises(ValueError):
            QuantizedIndex(2, ids, emb, pallas_rounds=0)
        with pytest.raises(ValueError):
            QuantizedIndex(2, ids, emb, method="ivf")


class TestRunnerIntegration:
    def test_evaluation_runner_with_quantized_index(
        self, pipeline, tmp_path  # noqa: F811
    ):
        """Flip ModelConfig.index_type to 'quantized' and rerun the
        eval-only stage from the trained checkpoint: recall must match
        the exact index (near-exact ANN) and the saved artifact must
        round-trip through the generic loader + RetrievalService."""
        from hm_retrieval_tpu.indices import load_index
        from hm_retrieval_tpu.runners import evaluation_runner
        from hm_retrieval_tpu.schema import Schema
        from hm_retrieval_tpu.serving import RetrievalService

        settings, results, _ = pipeline
        schema_dir = str(tmp_path / "schema")
        shutil.copytree(settings.schema_dirpath, schema_dir)
        schema = Schema.load(schema_dir)
        schema.model_config.index_type = "quantized"
        schema.save(schema_dir)
        qsettings = dataclasses.replace(
            settings,
            schema_dirpath=schema_dir,
            index_dirpath=str(tmp_path / "index"),
        )
        res = evaluation_runner(qsettings)
        # same checkpoint as the pipeline's final exact eval
        assert res[10] == pytest.approx(
            results["final"][10], abs=0.02
        )
        assert os.path.exists(
            os.path.join(qsettings.index_dirpath, "meta.json")
        )
        idx = load_index(qsettings.index_dirpath)
        assert isinstance(idx, QuantizedIndex)

        service = RetrievalService.load(
            qsettings.schema_dirpath,
            qsettings.model_dirpath,
            qsettings.index_dirpath,
        )
        cust = service.schema.feature("customer_id").vocab[:3]
        rows = service.retrieve({"customer_id": list(cust)}, k=5)
        assert len(rows) == 3 and all(
            len(r) == 5 for r in rows
        )


class TestSingleQueryServing:
    def test_b1_query(self, rng):
        """B=1 single-request serving path through the pallas engine
        (validated compiled on real TPU: 0.52ms over a 1M catalog,
        BASELINE.md)."""
        import jax.numpy as jnp

        from hm_retrieval_tpu.indices.quantized import QuantizedIndex

        N, E, k = 2000, 16, 10
        emb = rng.normal(size=(N, E)).astype(np.float32)
        ids = np.arange(1, N + 1, dtype=np.int32)
        idx = QuantizedIndex(k, ids, emb, method="pallas")
        q = rng.normal(size=(1, E)).astype(np.float32)
        s, got = idx.topk_from_embeddings(jnp.asarray(q))
        assert got.shape == (1, k)
        ref = BruteForceIndex(k, ids, emb, method="full")
        _, want = ref.topk_from_embeddings(jnp.asarray(q))
        overlap = len(
            set(np.asarray(got)[0]) & set(np.asarray(want)[0])
        )
        assert overlap >= k - 1


class TestDeviceConstruction:
    """Device-resident construction: handing the constructor a
    jax.Array quantizes + pads on device (no host round trip for the
    catalog — the path the serving-edge bench uses for a 1M catalog
    behind a slow host<->device link) and must match the host-numpy
    build exactly."""

    @pytest.mark.parametrize("scale_mode", ["per_row", "global"])
    @pytest.mark.parametrize("rescore", [True, False])
    def test_matches_host_build(self, rng, scale_mode, rescore):
        n, e, k = 1500, 16, 7
        emb = rng.normal(size=(n, e)).astype(np.float32)
        emb[3] = 0.0  # zero row: scale-1 convention must carry over
        ids = np.arange(1, n + 1, dtype=np.int32)
        host = QuantizedIndex(
            k, ids, emb, rescore=rescore, scale_mode=scale_mode
        )
        dev = QuantizedIndex(
            k,
            ids,
            jnp.asarray(emb),
            rescore=rescore,
            scale_mode=scale_mode,
        )
        np.testing.assert_array_equal(
            np.asarray(dev.codes), np.asarray(host.codes)
        )
        np.testing.assert_array_equal(
            np.asarray(dev.scales), np.asarray(host.scales)
        )
        np.testing.assert_array_equal(
            np.asarray(dev._score_bias),
            np.asarray(host._score_bias),
        )
        assert dev.global_scale == host.global_scale
        if rescore:
            np.testing.assert_array_equal(
                np.asarray(dev.embeddings),
                np.asarray(host.embeddings),
            )
        else:
            assert dev.embeddings is None
        q = jnp.asarray(
            rng.normal(size=(9, e)).astype(np.float32)
        )
        hs, hi = host.topk_from_embeddings(q)
        ds, di = dev.topk_from_embeddings(q)
        np.testing.assert_array_equal(
            np.asarray(di), np.asarray(hi)
        )
        np.testing.assert_allclose(
            np.asarray(ds), np.asarray(hs), rtol=1e-6
        )


class TestDeviceBuildFromBatches:
    """device=True builds (embeddings never leave the device) must
    equal the host-collected builds exactly, for both catalog
    families — the runner's per-epoch rebuild path."""

    def _setup(self, rng, n=100, e=8):
        emb = rng.normal(size=(n, e)).astype(np.float32)
        ids = rng.permutation(n).astype(np.int32) + 1
        table = jnp.asarray(emb)
        row_of_id = np.empty(n + 1, np.int32)
        row_of_id[ids] = np.arange(n, dtype=np.int32)
        row_of_id = jnp.asarray(row_of_id)

        def embed(batch):
            return jnp.take(
                table,
                jnp.take(row_of_id, batch["article_id"]),
                axis=0,
            )

        def batches():
            return [
                {"article_id": ids[lo : lo + 32]}
                for lo in range(0, n, 32)
            ]

        return ids, embed, batches

    def test_quantized_device_equals_host(self, rng):
        ids, embed, batches = self._setup(rng)
        host = QuantizedIndex.build_from_batches(
            5, "article_id", embed, batches(), 32
        )
        dev = QuantizedIndex.build_from_batches(
            5, "article_id", embed, batches(), 32, device=True
        )
        np.testing.assert_array_equal(
            np.asarray(dev.codes), np.asarray(host.codes)
        )
        np.testing.assert_array_equal(
            np.asarray(dev.scales), np.asarray(host.scales)
        )
        np.testing.assert_array_equal(
            np.asarray(dev.embeddings), np.asarray(host.embeddings)
        )
        np.testing.assert_array_equal(
            np.asarray(dev.identifiers),
            np.asarray(host.identifiers),
        )

    def test_brute_force_device_equals_host(self, rng):
        ids, embed, batches = self._setup(rng)
        host = BruteForceIndex.build_from_batches(
            5, "article_id", embed, batches(), 32
        )
        dev = BruteForceIndex.build_from_batches(
            5, "article_id", embed, batches(), 32, device=True
        )
        np.testing.assert_array_equal(
            np.asarray(dev.embeddings), np.asarray(host.embeddings)
        )
        np.testing.assert_array_equal(
            np.asarray(dev._score_bias),
            np.asarray(host._score_bias),
        )
        q = jnp.asarray(
            rng.normal(size=(7, 8)).astype(np.float32)
        )
        hs, hi = host.topk_from_embeddings(q)
        ds, di = dev.topk_from_embeddings(q)
        np.testing.assert_array_equal(
            np.asarray(di), np.asarray(hi)
        )
