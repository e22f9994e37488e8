"""Corpus-sharded exact retrieval over the ICI mesh.

For catalogs too large for one chip's HBM, the item-embedding matrix is
sharded along items over the "model" mesh axis. Each device scores its
local tile ((B, D) @ (D, N/m) on the MXU), takes a local top-k, and the
(m, B, k) candidate sets are merged after an all-gather over ICI —
bandwidth O(B * k * m), never the full (B, N) score matrix.

This is the scale-out axis the reference lacks entirely (its LanceDB ANN
index is a single-host CPU structure — SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P

from xfmr_rec_tpu.parallel.mesh import MODEL_AXIS

NEG_INF = float("-inf")


def sharded_topk(
    queries: Array,
    corpus: Array,
    k: int,
    mesh: Mesh,
    *,
    exclude_positions: Array | None = None,
) -> tuple[Array, Array]:
    """Exact top-k over an item-sharded corpus.

    Args:
        queries: (B, D), replicated.
        corpus: (N, D), sharded P("model", None) (or host array to place).
        k: static top-k.
        exclude_positions: (B, E) global corpus positions to mask
            (padded with >= N), replicated.

    Returns:
        (scores (B, k), positions (B, k)) — global positions, replicated.
    """
    num_model = mesh.shape[MODEL_AXIS]
    local_n = corpus.shape[0] // num_model
    local_k = min(k, local_n)

    has_exclusions = exclude_positions is not None
    if not has_exclusions:
        exclude_positions = jnp.zeros((queries.shape[0], 1), dtype=jnp.int32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def inner(q, corpus_local, excl):
        batch = q.shape[0]
        offset = jax.lax.axis_index(MODEL_AXIS) * local_n
        scores = jnp.dot(
            q, corpus_local.T, preferred_element_type=jnp.float32
        )
        positions = offset + jnp.arange(local_n, dtype=jnp.int32)[None, :]
        positions = jnp.broadcast_to(positions, scores.shape)
        if has_exclusions:
            hit = jnp.any(
                positions[:, :, None] == excl[:, None, :], axis=-1
            )
            scores = jnp.where(hit, NEG_INF, scores)
        local_scores, local_arg = jax.lax.top_k(scores, local_k)
        local_pos = jnp.take_along_axis(positions, local_arg, axis=-1)
        # (m, B, local_k) candidates -> merged (B, k)
        all_scores = jax.lax.all_gather(local_scores, MODEL_AXIS)
        all_pos = jax.lax.all_gather(local_pos, MODEL_AXIS)
        all_scores = all_scores.transpose(1, 0, 2).reshape(batch, -1)
        all_pos = all_pos.transpose(1, 0, 2).reshape(batch, -1)
        top_scores, merge_arg = jax.lax.top_k(all_scores, k)
        top_pos = jnp.take_along_axis(all_pos, merge_arg, axis=-1)
        return top_scores, top_pos

    return inner(queries, corpus, exclude_positions)
