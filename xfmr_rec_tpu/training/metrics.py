"""Vectorized retrieval metrics @ k.

Replaces the reference's per-user python metric loop
(/root/reference/xfmr_rec/lightning.py:149-187, :289-306 — torchmetrics
RetrievalNormalizedDCG/Recall/Precision/MAP/HitRate/MRR with top_k=20).
Here all users are scored in one fixed-shape jitted computation: matched
relevance is derived by comparing the predicted top-k id matrix against
0-padded target id matrices (real ids are >= 1, so padding never matches).

Semantics (matching the torchmetrics definitions the reference logs):
- NDCG@k uses graded gains = the target ratings, linear gain, and an
  ideal DCG from the user's ratings sorted descending, truncated at k.
  Predictions outside the target set contribute gain 0; targets outside
  the predicted top-k fall past the cut (the reference achieves the same
  by assigning them random negative scores — lightning.py:170-176).
- Recall@k = hits / num_targets; Precision@k = hits / k;
  HitRate@k = 1 if any hit; MRR@k = 1 / rank of first hit (0 if none);
  MAP@k = sum_j rel_j * precision@j / min(k, num_targets).
- Metric means are over users with at least one target.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

METRIC_NAMES = (
    "RetrievalNormalizedDCG",
    "RetrievalRecall",
    "RetrievalPrecision",
    "RetrievalMAP",
    "RetrievalHitRate",
    "RetrievalMRR",
)


def retrieval_metrics(
    pred_ids: Array,
    target_ids: Array,
    target_ratings: Array,
    *,
    top_k: int,
    prefix: str = "",
) -> dict[str, Array]:
    """Compute all retrieval metrics at once.

    Args:
        pred_ids: (num_users, k) predicted item ids, ranked descending.
        target_ids: (num_users, max_targets) 0-padded target item ids.
        target_ratings: (num_users, max_targets) ratings (0 where padded).
        top_k: the k (pred_ids may have >= top_k columns; extra are ignored).
        prefix: metric-name prefix, e.g. "val/".

    Returns:
        dict of scalar f32 metrics.
    """
    pred_ids = pred_ids[:, :top_k]
    k = pred_ids.shape[1]

    target_valid = target_ids > 0
    num_targets = jnp.sum(target_valid, axis=-1)  # (U,)
    user_valid = num_targets > 0

    # match matrix: (U, k, T)
    match = (pred_ids[:, :, None] == target_ids[:, None, :]) & target_valid[
        :, None, :
    ]
    rel = jnp.any(match, axis=-1)  # (U, k) binary relevance
    gains = jnp.max(
        jnp.where(match, target_ratings[:, None, :], 0.0), axis=-1
    )  # (U, k) graded gains

    positions = jnp.arange(k)
    discounts = 1.0 / jnp.log2(positions + 2.0)  # (k,)

    # NDCG
    dcg = jnp.sum(gains * discounts[None, :], axis=-1)
    sorted_ratings = jnp.sort(
        jnp.where(target_valid, target_ratings, 0.0), axis=-1
    )[:, ::-1]
    ideal_len = min(k, target_ids.shape[1])
    idcg = jnp.sum(
        sorted_ratings[:, :ideal_len] * discounts[None, :ideal_len], axis=-1
    )
    ndcg = jnp.where(idcg > 0, dcg / jnp.maximum(idcg, 1e-10), 0.0)

    hits = jnp.sum(rel, axis=-1)
    recall = hits / jnp.maximum(num_targets, 1)
    precision = hits / k
    hit_rate = (hits > 0).astype(jnp.float32)

    # MRR: first relevant rank
    first_rank = jnp.argmax(rel, axis=-1)  # 0 if none relevant — guard below
    mrr = jnp.where(hits > 0, 1.0 / (first_rank + 1.0), 0.0)

    # MAP
    cum_rel = jnp.cumsum(rel, axis=-1)
    prec_at = cum_rel / (positions[None, :] + 1.0)
    ap = jnp.sum(rel * prec_at, axis=-1) / jnp.maximum(
        jnp.minimum(num_targets, k), 1
    )

    def mean_valid(values: Array) -> Array:
        values = values.astype(jnp.float32)
        count = jnp.maximum(jnp.sum(user_valid), 1)
        return jnp.sum(jnp.where(user_valid, values, 0.0)) / count

    results = {
        "RetrievalNormalizedDCG": mean_valid(ndcg),
        "RetrievalRecall": mean_valid(recall),
        "RetrievalPrecision": mean_valid(precision),
        "RetrievalMAP": mean_valid(ap),
        "RetrievalHitRate": mean_valid(hit_rate),
        "RetrievalMRR": mean_valid(mrr),
    }
    return {f"{prefix}{name}": value for name, value in results.items()}
