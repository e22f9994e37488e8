"""Torchmetrics-formula oracle for the metrics layer (VERDICT r2 #5).

The reference logs torchmetrics retrieval metrics through a per-user
update that unions the predicted top-k with the target set and assigns
RANDOM NEGATIVE scores to targets the model did not rank
(/root/reference/xfmr_rec/lightning.py:149-187) over the collection
NDCG/Recall/Precision/MAP/HitRate/MRR at top_k=20 (:289-306).
torchmetrics itself is not installed in this image, so this oracle
re-implements BOTH layers independently of `training/metrics.py`:

1. the reference's update construction (union list, ranked preds get
   descending positive scores, unranked targets get -U(0,1) scores),
2. the torchmetrics formulas applied per user group and meaned:
   - retrieval_normalized_dcg: sort by pred desc, DCG over the top
     min(k, n) with linear gains and 1/log2(rank+1) discounts; ideal =
     targets sorted desc, same truncation,
   - retrieval_recall: hits@k / n_relevant,
   - retrieval_precision: hits@k / min(k, n),
   - retrieval_average_precision (top_k): sum_i rel_i * prec@i over the
     top k / min(k, n_relevant),
   - retrieval_hit_rate: any hit in top k,
   - retrieval_reciprocal_rank (top_k): 1 / rank of first hit in top k.

The monitored metric drives checkpointing/early-stop/HPO, so a
formula-level divergence here would silently skew every quality
headline. Randomized agreement cases cover rating ties, k > #targets,
few-target users, and duplicated predictions of one target set; the
random-negative draw is verified to be immaterial (two independent
draws must agree exactly) because the 20 ranked predictions always fill
the top-20 cut.

Known, deliberate deviation (documented in training/metrics.py): users
with ZERO targets are excluded from the mean (torchmetrics'
empty_target_action="neg" would count them as 0.0); the trainer's eval
stream never emits such users (eval_users filters target_counts > 0),
so the logged values are identical. Asserted explicitly below.
"""

from __future__ import annotations

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from xfmr_rec_tpu.training.metrics import retrieval_metrics  # noqa: E402

TOP_K = 20


def _user_metrics(pred_vec, target_vec, top_k):
    """torchmetrics retrieval formulas for ONE user group."""
    n = len(pred_vec)
    k = min(top_k, n)
    order = np.argsort(-pred_vec, kind="stable")
    ranked_targets = target_vec[order]
    top = ranked_targets[:k]
    discounts = 1.0 / np.log2(np.arange(k) + 2.0)
    dcg = float(np.sum(top * discounts))
    ideal = np.sort(target_vec)[::-1][:k]
    idcg = float(np.sum(ideal * discounts[: len(ideal)]))
    ndcg = dcg / idcg if idcg > 0 else 0.0

    rel = (top > 0).astype(np.float64)
    n_rel = int(np.sum(target_vec > 0))
    hits = float(rel.sum())
    recall = hits / n_rel if n_rel else 0.0
    precision = hits / k
    hit_rate = 1.0 if hits > 0 else 0.0
    first = np.flatnonzero(rel)
    mrr = 1.0 / (first[0] + 1.0) if first.size else 0.0
    prec_at = np.cumsum(rel) / (np.arange(k) + 1.0)
    ap = float(np.sum(rel * prec_at)) / max(min(k, n_rel), 1)
    return {
        "RetrievalNormalizedDCG": ndcg,
        "RetrievalRecall": recall,
        "RetrievalPrecision": precision,
        "RetrievalMAP": ap,
        "RetrievalHitRate": hit_rate,
        "RetrievalMRR": mrr,
    }


def torchmetrics_oracle(pred_ids, target_ids, target_ratings, top_k, rng):
    """The reference's update_metrics + torchmetrics math, per user."""
    totals: dict[str, list[float]] = {}
    for u in range(len(pred_ids)):
        tids = target_ids[u][target_ids[u] > 0]
        trat = target_ratings[u][target_ids[u] > 0]
        if len(tids) == 0:
            continue  # trainer never emits target-less users (see module doc)
        targets = {int(i): float(r) for i, r in zip(tids, trat)}
        # ranked predictions get descending positive scores
        preds = {int(i): float(len(pred_ids[u]) - j) for j, i in enumerate(pred_ids[u])}
        # union; unranked targets get random NEGATIVE scores
        # (lightning.py:170-176)
        union = list(targets.keys() | preds.keys())
        pred_vec = np.array(
            [preds.get(i, -float(rng.uniform())) for i in union]
        )
        target_vec = np.array([targets.get(i, 0.0) for i in union])
        for name, value in _user_metrics(pred_vec, target_vec, top_k).items():
            totals.setdefault(name, []).append(value)
    return {name: float(np.mean(vals)) for name, vals in totals.items()}


def make_case(
    seed,
    *,
    users=24,
    corpus=200,
    max_targets=40,
    tie_ratings=False,
    few_targets=False,
):
    rng = np.random.default_rng(seed)
    pred_ids = np.stack(
        [
            rng.choice(np.arange(1, corpus + 1), TOP_K, replace=False)
            for _ in range(users)
        ]
    )
    target_ids = np.zeros((users, max_targets), dtype=np.int64)
    target_ratings = np.zeros((users, max_targets), dtype=np.float64)
    for u in range(users):
        hi = min(3 if few_targets else max_targets, corpus)
        n = int(rng.integers(1, hi + 1))
        ids = rng.choice(np.arange(1, corpus + 1), n, replace=False)
        ratings = (
            np.full(n, 3.0)
            if tie_ratings
            else rng.integers(1, 6, n).astype(np.float64)
        )
        # descending rating order, as the data module stores them
        order = np.argsort(-ratings, kind="stable")
        target_ids[u, :n] = ids[order]
        target_ratings[u, :n] = ratings[order]
    return pred_ids, target_ids, target_ratings


@pytest.mark.parametrize(
    ("seed", "kwargs"),
    [
        (0, {}),
        (1, {}),
        (2, {"tie_ratings": True}),
        (3, {"few_targets": True}),  # k > #targets
        (4, {"max_targets": 60}),  # more targets than k
        (5, {"corpus": 30}),  # dense overlap between preds and targets
    ],
)
def test_metrics_match_torchmetrics_formulas(seed, kwargs):
    pred_ids, target_ids, target_ratings = make_case(seed, **kwargs)
    want = torchmetrics_oracle(
        pred_ids, target_ids, target_ratings, TOP_K,
        np.random.default_rng(seed + 100),
    )
    got = retrieval_metrics(
        jnp.asarray(pred_ids),
        jnp.asarray(target_ids),
        jnp.asarray(target_ratings),
        top_k=TOP_K,
    )
    for name, value in want.items():
        np.testing.assert_allclose(
            float(got[name]), value, rtol=1e-5, atol=1e-6, err_msg=name
        )


def test_random_negative_scores_are_immaterial():
    """Two independent random draws for unranked targets must give
    identical metrics: the 20 ranked predictions always occupy the
    top-20 cut, so the random scores only order items past the cut."""
    pred_ids, target_ids, target_ratings = make_case(7)
    a = torchmetrics_oracle(
        pred_ids, target_ids, target_ratings, TOP_K,
        np.random.default_rng(1),
    )
    b = torchmetrics_oracle(
        pred_ids, target_ids, target_ratings, TOP_K,
        np.random.default_rng(2),
    )
    for name in a:
        assert a[name] == pytest.approx(b[name], abs=0.0), name


def test_empty_target_users_excluded_from_mean():
    """Documented deviation: zero-target users drop from the mean (the
    trainer's eval stream filters them; torchmetrics would count 0.0)."""
    pred_ids, target_ids, target_ratings = make_case(9, users=8)
    got_all = retrieval_metrics(
        jnp.asarray(pred_ids),
        jnp.asarray(target_ids),
        jnp.asarray(target_ratings),
        top_k=TOP_K,
    )
    # blank half the users' targets: mean must equal the kept half alone
    target_ids2 = target_ids.copy()
    target_ratings2 = target_ratings.copy()
    target_ids2[4:] = 0
    target_ratings2[4:] = 0.0
    got_half = retrieval_metrics(
        jnp.asarray(pred_ids[:4]),
        jnp.asarray(target_ids[:4]),
        jnp.asarray(target_ratings[:4]),
        top_k=TOP_K,
    )
    got_masked = retrieval_metrics(
        jnp.asarray(pred_ids),
        jnp.asarray(target_ids2),
        jnp.asarray(target_ratings2),
        top_k=TOP_K,
    )
    for name in got_all:
        np.testing.assert_allclose(
            float(got_masked[name]), float(got_half[name]), rtol=1e-6
        )
