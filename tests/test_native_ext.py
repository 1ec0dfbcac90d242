"""Native C++ kernel tests: identical results to the pure-python path,
plus a smoke perf sanity check."""

import time

import numpy as np
import pandas as pd
import pytest

from hm_retrieval_tpu import native_ext
from hm_retrieval_tpu.schema import Feature, FeatureFamily, FeatureKind

pytestmark = pytest.mark.skipif(
    not native_ext.available(),
    reason="native toolchain unavailable",
)


class TestNativeVocab:
    def test_matches_pandas_encode(self, rng):
        vocab = np.array([f"tok_{i}" for i in range(5000)])
        nv = native_ext.NativeVocab(vocab)
        tokens = np.array(
            [f"tok_{i}" for i in rng.integers(0, 8000, 20000)]
        )  # ~3/8 OOV
        got = nv.encode(tokens)
        table = {t: i + 1 for i, t in enumerate(vocab)}
        expect = (
            pd.Series(tokens).map(table).fillna(0).to_numpy(np.int32)
        )
        np.testing.assert_array_equal(got, expect)
        assert len(nv) == 5000

    def test_feature_encode_uses_native_and_matches(self, rng):
        vocab = np.array([f"a{i}" for i in range(100)])
        f = Feature(
            "x",
            FeatureKind.CATEGORICAL,
            FeatureFamily.QUERY,
            embedding_size=4,
            vocab=vocab,
        )
        toks = np.array(["a5", "zzz", "a0", "a99"])
        ids = f.encode(toks)
        np.testing.assert_array_equal(ids, [6, 0, 1, 100])
        assert f._native is not None  # native path engaged

    def test_empty_and_unicode_tokens(self):
        nv = native_ext.NativeVocab(np.array(["", "héllo", "☃"]))
        got = nv.encode(np.array(["☃", "", "héllo", "nope"]))
        np.testing.assert_array_equal(got, [3, 1, 2, 0])

    def test_duplicate_vocab_tokens_last_wins(self):
        # user-supplied vocabs may contain duplicates; both native paths
        # must match the Python dict-comprehension oracle (last id wins)
        vocab = np.array(["a", "b", "a", "c", "b"])
        oracle = {t: i + 1 for i, t in enumerate(vocab)}
        toks = np.array(["a", "b", "c", "zzz"])
        expect = [oracle["a"], oracle["b"], oracle["c"], 0]
        nv = native_ext.NativeVocab(vocab)  # shardio path
        np.testing.assert_array_equal(nv.encode(toks), expect)
        f = Feature(
            "x",
            FeatureKind.CATEGORICAL,
            FeatureFamily.QUERY,
            embedding_size=4,
            vocab=vocab,
        )  # seqencode path (object-dtype input)
        np.testing.assert_array_equal(
            f.encode(toks.astype(object)), expect
        )


class TestGatherRows:
    def test_matches_numpy_2d(self, rng):
        src = rng.normal(size=(1000, 16)).astype(np.float32)
        idx = rng.integers(0, 1000, 500).astype(np.int32)
        np.testing.assert_array_equal(
            native_ext.gather_rows(src, idx), src[idx]
        )

    def test_matches_numpy_1d(self, rng):
        src = rng.integers(0, 100, 1000).astype(np.int32)
        idx = rng.integers(0, 1000, 300).astype(np.int32)
        np.testing.assert_array_equal(
            native_ext.gather_rows(src, idx), src[idx]
        )

    def test_large_parallel_path(self, rng):
        src = rng.normal(size=(100_000, 8)).astype(np.float32)
        idx = rng.permutation(100_000).astype(np.int32)
        t0 = time.time()
        out = native_ext.gather_rows(src, idx)
        dt = time.time() - t0
        np.testing.assert_array_equal(out[:100], src[idx[:100]])
        assert dt < 2.0  # smoke: not pathologically slow
