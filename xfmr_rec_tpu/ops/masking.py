"""Accidental-hit masking and hard / semi-hard negative mining.

Behavioral parity targets (reference /root/reference/xfmr_rec/losses.py):
- negative_masks     : losses.py:92-110
- hard_mining        : losses.py:112-132
- semi_hard_mining   : losses.py:134-162

All functions are shape-static and jit-friendly: `num_negatives` is a
Python int resolved at trace time, masks are boolean arrays, and the
mined-negative selection uses `jax.lax.top_k` with a static k.

Ragged per-user positive sets (`pos_idx`) arrive as fixed-width padded
arrays. Padding uses index 0: real item indices (`movie_rn`) start at 1
(see data/prepare row-number offset), so a 0 pad can never collide with a
candidate item index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

NEG_INF = -jnp.inf


def mask_log(mask: Array) -> Array:
    """log of a boolean mask: 0 where True, -inf where False."""
    return jnp.where(mask, 0.0, NEG_INF)


def negative_masks(
    logits: Array,
    *,
    item_idx: Array,
    pos_idx: Array | None = None,
) -> Array:
    """True where a candidate item is a *valid* negative for a row.

    Accidental hits are masked out: a candidate with the same item index as
    the row's positive (in-batch duplicate), or a candidate appearing in the
    row's positive set `pos_idx` (items the user actually interacted with).

    Args:
        logits: (batch_size, num_items) — only the shape is used.
        item_idx: (num_items,) int — candidate item indices; the first
            batch_size entries are the rows' own positives.
        pos_idx: (batch_size, num_positives) int, 0-padded, or None.

    Returns:
        bool (batch_size, num_items)
    """
    batch_size = logits.shape[0]
    accidental_hits = item_idx[:batch_size, None] == item_idx[None, :]
    if pos_idx is not None:
        accidental_hits |= jnp.any(
            pos_idx[:, None, :] == item_idx[None, :, None], axis=-1
        )
    return ~accidental_hits


# mining keeps only a handful of negatives (reference default 4); above
# this the successive-argmax selection stops paying for itself and the
# sort-based top_k takes over
_ARGMAX_SELECT_MAX_K = 32


def _restrict_to_topk(masks: Array, scores: Array, k: int) -> Array:
    """Keep only the top-k scoring entries of each row of `masks`.

    For the tiny k of negative mining the selection runs as k unrolled
    argmax+knockout passes instead of `lax.top_k`: XLA lowers top_k to
    a full bitonic sort of each (num_items,) row — O(log^2 n) passes
    over the (B, 2B) score matrix, the measured round-4 train-step
    bottleneck at h32 (~1.5% MFU, BENCH_NOTES) — while k argmax passes
    are O(k) VPU reductions. Tie semantics match lax.top_k exactly:
    equal scores resolve to the lowest index first, so the selected SET
    is identical (pinned against the sort path in tests/test_losses.py).
    """
    if k > _ARGMAX_SELECT_MAX_K:
        _, indices = jax.lax.top_k(scores, k)
        batch_size, num_items = masks.shape
        rows = jnp.arange(batch_size)[:, None]
        selected = (
            jnp.zeros((batch_size, num_items), dtype=bool)
            .at[rows, indices]
            .set(True)
        )
        return masks & selected
    num_items = scores.shape[-1]
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    selected = jnp.zeros_like(masks)
    for _ in range(k):
        best = jnp.argmax(scores, axis=-1)  # first index on ties
        hit = cols == best[:, None]
        selected |= hit
        scores = jnp.where(hit, NEG_INF, scores)
    return masks & selected


def hard_mining(logits: Array, masks: Array, *, num_negatives: int) -> Array:
    """Keep the `num_negatives` highest-logit valid negatives per row."""
    if num_negatives <= 0 or num_negatives >= logits.shape[1]:
        return masks
    scores = logits + mask_log(masks)
    return _restrict_to_topk(masks, scores, num_negatives)


def semi_hard_mining(
    logits: Array, masks: Array, *, num_negatives: int
) -> Array:
    """Prefer semi-hard negatives, then hard negatives, never false ones.

    Ordering per row (matching losses.py:134-162): candidates whose logit is
    below the row's positive logit ("semi-hard") rank first, in descending
    closeness to the positive; candidates above the positive ("hard") rank
    after, closest first; masked false negatives rank last (-inf).
    """
    if num_negatives <= 0 or num_negatives >= logits.shape[1]:
        return masks
    diag = jnp.diagonal(logits)  # (batch_size,) — positive logits
    logits_mod = logits - diag[:, None]
    logits_min = jnp.min(logits_mod, axis=-1, keepdims=True)
    logits_mod = jnp.where(logits_mod < 0, logits_mod - logits_min, -logits_mod)
    scores = logits_mod + mask_log(masks)
    return _restrict_to_topk(masks, scores, num_negatives)
