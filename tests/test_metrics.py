"""Retrieval metrics vs hand-computed values (torchmetrics definitions).

The reference logs torchmetrics RetrievalNormalizedDCG / Recall /
Precision / MAP / HitRate / MRR @ k=20 (lightning.py:289-306); the
monitored metric drives checkpointing, early stopping, and HPO, so these
numbers must be right. Expected values below are computed by hand per
the torchmetrics formulas, not by a vectorized re-implementation.
"""

import math

import numpy as np
import pytest

from xfmr_rec_tpu.training.metrics import METRIC_NAMES, retrieval_metrics


def d(i):  # discount at 0-based rank i
    return 1.0 / math.log2(i + 2)


class TestHandComputed:
    def test_single_user_worked_example(self):
        # user targets: items 7 (rating 5), 3 (rating 4), 9 (rating 3)
        # predictions @ k=5: [2, 7, 9, 8, 1] -> hits at ranks 2 and 3
        pred = np.array([[2, 7, 9, 8, 1]])
        tgt = np.array([[7, 3, 9, 0]])
        rat = np.array([[5.0, 4.0, 3.0, 0.0]])
        m = retrieval_metrics(pred, tgt, rat, top_k=5)

        dcg = 5.0 * d(1) + 3.0 * d(2)
        idcg = 5.0 * d(0) + 4.0 * d(1) + 3.0 * d(2)
        assert np.isclose(float(m["RetrievalNormalizedDCG"]), dcg / idcg)
        assert np.isclose(float(m["RetrievalRecall"]), 2 / 3)
        assert np.isclose(float(m["RetrievalPrecision"]), 2 / 5)
        assert np.isclose(float(m["RetrievalHitRate"]), 1.0)
        assert np.isclose(float(m["RetrievalMRR"]), 1 / 2)  # first hit rank 2
        # AP = (prec@2 * 1 + prec@3 * 1) / min(3 targets, 5)
        ap = (1 / 2 + 2 / 3) / 3
        assert np.isclose(float(m["RetrievalMAP"]), ap)

    def test_no_hits_user(self):
        pred = np.array([[2, 4, 6]])
        tgt = np.array([[1, 3]])
        rat = np.array([[5.0, 5.0]])
        m = retrieval_metrics(pred, tgt, rat, top_k=3)
        for name in METRIC_NAMES:
            assert float(m[name]) == 0.0

    def test_perfect_ranking(self):
        pred = np.array([[5, 3, 1]])
        tgt = np.array([[5, 3, 1, 0]])
        rat = np.array([[5.0, 4.0, 3.0, 0.0]])
        m = retrieval_metrics(pred, tgt, rat, top_k=3)
        assert np.isclose(float(m["RetrievalNormalizedDCG"]), 1.0)
        assert np.isclose(float(m["RetrievalRecall"]), 1.0)
        assert np.isclose(float(m["RetrievalPrecision"]), 1.0)
        assert np.isclose(float(m["RetrievalMAP"]), 1.0)
        assert np.isclose(float(m["RetrievalMRR"]), 1.0)

    def test_users_without_targets_excluded_from_means(self):
        pred = np.array([[1, 2], [1, 2]])
        tgt = np.array([[1, 0], [0, 0]])  # second user: no targets
        rat = np.array([[5.0, 0.0], [0.0, 0.0]])
        m = retrieval_metrics(pred, tgt, rat, top_k=2)
        # means over ONE valid user, whose recall is 1.0
        assert np.isclose(float(m["RetrievalRecall"]), 1.0)
        assert np.isclose(float(m["RetrievalHitRate"]), 1.0)

    def test_padding_ids_never_match(self):
        # pred contains 0s (can't happen live, but padding must not count)
        pred = np.array([[0, 2]])
        tgt = np.array([[0, 2]])
        rat = np.array([[0.0, 1.0]])
        m = retrieval_metrics(pred, tgt, rat, top_k=2)
        assert np.isclose(float(m["RetrievalRecall"]), 1.0)  # only item 2
        assert np.isclose(float(m["RetrievalPrecision"]), 0.5)

    def test_two_user_mean(self):
        pred = np.array([[1, 9], [9, 1]])
        tgt = np.array([[1, 0], [1, 0]])
        rat = np.array([[2.0, 0.0], [2.0, 0.0]])
        m = retrieval_metrics(pred, tgt, rat, top_k=2)
        # user A: hit at rank 1 -> MRR 1; user B: hit at rank 2 -> MRR 1/2
        assert np.isclose(float(m["RetrievalMRR"]), (1.0 + 0.5) / 2)
        ndcg_b = d(1) / d(0)
        assert np.isclose(
            float(m["RetrievalNormalizedDCG"]), (1.0 + ndcg_b) / 2
        )

    @pytest.mark.parametrize("k", [1, 3])
    def test_k_truncation(self, k):
        pred = np.array([[4, 1, 7]])
        tgt = np.array([[7, 0]])
        rat = np.array([[3.0, 0.0]])
        m = retrieval_metrics(pred, tgt, rat, top_k=k)
        want_hit = 1.0 if k >= 3 else 0.0
        assert float(m["RetrievalHitRate"]) == want_hit
