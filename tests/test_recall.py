"""Recall@K streaming accumulation tests.

Mirrors the reference fixture exactly (ref: tests/test_recall.py:8-95): a
StaticIndex used as a deterministic fake index returning ids 1..10 in
order, a dataset crafted so hits@1=1 and hits@2=3 of 5, asserting recall
{1: 0.2, 2: 0.6, 5: 0.6}.
"""

import numpy as np

from hm_retrieval_tpu.indices.static_index import StaticIndex
from hm_retrieval_tpu.metrics.index_recall import IndexRecall


class TestIndexRecall:
    def test_reference_golden_values(self):
        index = StaticIndex(np.arange(1, 11, dtype=np.int32))
        metric = IndexRecall(ks=[1, 2, 5])
        # 5 eval rows in 2 batches; true ids chosen so that:
        # hit@1: true id == 1 -> 1 row; hit@2: true in {1,2} -> 3 rows;
        # hit@5: true in 1..5 -> still 3 rows (others are 20, 30)
        true_batches = [
            np.array([1, 2, 20], np.int32),
            np.array([2, 30], np.int32),
        ]
        for t in true_batches:
            retrieved = index.query(batch_size=len(t), k=5)
            metric.update(retrieved, t)
        res = metric.results()
        assert res == {1: 1 / 5, 2: 3 / 5, 5: 3 / 5}

    def test_streaming_accumulation_matches_single_batch(self, rng):
        retrieved = rng.integers(0, 50, size=(10, 8)).astype(np.int32)
        true_ids = rng.integers(0, 50, size=10).astype(np.int32)
        whole = IndexRecall(ks=[1, 4, 8])
        whole.update(retrieved, true_ids)
        parts = IndexRecall(ks=[1, 4, 8])
        parts.update(retrieved[:3], true_ids[:3])
        parts.update(retrieved[3:7], true_ids[3:7])
        parts.update(retrieved[7:], true_ids[7:])
        assert whole.results() == parts.results()

    def test_reset(self):
        m = IndexRecall(ks=[1])
        m.update(np.array([[1]], np.int32), np.array([1], np.int32))
        assert m.results() == {1: 1.0}
        m.reset()
        assert m.results() == {1: 0.0}
        assert m.seen == 0

    def test_duplicate_retrieved_ids_count_once(self):
        m = IndexRecall(ks=[2])
        m.update(
            np.array([[7, 7]], np.int32), np.array([7], np.int32)
        )
        assert m.results() == {2: 1.0}

    def test_empty_results(self):
        assert IndexRecall(ks=[3]).results() == {3: 0.0}
