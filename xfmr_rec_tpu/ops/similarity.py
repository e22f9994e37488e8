"""Embedding similarity primitives.

Semantics follow the reference loss framework
(/root/reference/xfmr_rec/losses.py:9-23): similarity is measured as half
the squared euclidean distance, and reductions over mined negatives use a
sample-weighted mean with a small-denominator guard.

The TPU-first difference: distances are computed through a single matmul
(`q @ c.T` hits the MXU) plus rank-1 norm corrections, instead of a
pairwise-distance kernel. For L2-normalized embeddings this reduces to
`1 - q @ c.T`, i.e. pure MXU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def squared_distance(
    query_embed: Array,
    candidate_embed: Array,
    *,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> Array:
    """Half squared euclidean distance matrix.

    Args:
        query_embed: (num_queries, dim)
        candidate_embed: (num_candidates, dim)
        precision: matmul precision. Defaults to HIGHEST because the loss
            path is the numerical-parity surface; the retrieval index uses
            its own bf16 scoring path where throughput matters instead.

    Returns:
        (num_queries, num_candidates) with entries ||q - c||^2 / 2, clamped
        to be non-negative (the quadratic-form expansion can go slightly
        negative in floating point).
    """
    q_sq = jnp.sum(query_embed * query_embed, axis=-1)
    c_sq = jnp.sum(candidate_embed * candidate_embed, axis=-1)
    cross = jnp.dot(
        query_embed,
        candidate_embed.T,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    dist = 0.5 * (q_sq[:, None] + c_sq[None, :]) - cross
    return jnp.maximum(dist, 0.0)


def weighted_mean(
    values: Array,
    sample_weights: Array,
    *,
    axis: int | None = None,
    keepdims: bool = False,
) -> Array:
    """Weighted mean with a 1e-10 denominator guard.

    Matches reference weighted_mean (losses.py:15-23): the denominator is
    the weight sum (not forced positive), so all-zero weights yield ~0
    instead of NaN.
    """
    sample_weights = sample_weights.astype(values.dtype)
    denominator = jnp.sum(sample_weights, axis=axis, keepdims=True) + 1e-10
    return jnp.sum(
        values * sample_weights / denominator, axis=axis, keepdims=keepdims
    )
