"""Pallas fused MIPS top-k: score + select in one HBM sweep.

Why: the XLA path (`index/mips.py exact_topk`) materializes the (B, N)
score matrix in HBM and runs `lax.top_k` over N — profiling on v5e shows
that write + sort dominate (matmul-only ~32k qps, full exact ~3k qps at
B=2048, N=1M). This kernel keeps scores in VMEM: for each corpus tile it
computes (B_tile, C) scores on the MXU and folds them into a running
per-lane maximum, so HBM traffic is just the corpus read plus a (B, L)
result — the speed-of-light pattern for exhaustive retrieval.

Selection scheme (lane-max):
- lane(position) = position % L, with L == tile width C, so tile column j
  *is* lane j — the update is a pure elementwise max, no in-kernel sort.
- After the sweep, exact `lax.top_k` over the (B, L) lane maxima.
- Two true top-k items colliding in a lane lose the smaller one; with
  L >> k the expected loss is ~ C(k,2)/L (k=100, L=4096 -> ~1.2 items,
  recall ~98.8%; L=8192 -> ~0.6). The corpus order is arbitrary w.r.t.
  scores, so this is a birthday bound, not an adversarial one.

Exactness certification (`certified_topk`):
- Let tau = the k-th best value found. tau is a LOWER bound on the true
  k-th value (each lane max is a real element, so >= k elements >= tau).
- Primary ("discard", single sweep): the kernel keeps a per-row running
  max of every value evicted from a lane's slots. Every corpus element
  ends in a slot or was evicted, so max(evicted) < tau proves all
  elements >= tau are still in the buffers — the selected set IS the
  exact top-k. Costs ~6% over the uncertified scan (measured v5e).
- Cross-check ("count", second fused sweep): c = #{score >= tau} == k
  certifies the same property; kept for validation.
- Uncertified rows (lane collision or tie at tau) fall back to the dense
  exact path (RetrievalIndex.search_certified) — rare, and correctness
  never depends on the birthday bound.

Grid: (batch_tiles, corpus_tiles); TPU grids execute sequentially, with
the corpus dimension minor, so the (B_tile, L) running buffers stay
resident in VMEM across the whole corpus sweep for one batch tile.
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")

# Tile defaults tuned for ~16 MB VMEM at D=64: slots=2 keeps 4 running
# (bt, ct) buffers + the (bt, ct) score tile resident, so (256, 2048) is
# the largest safe default (measured: (256, 4096) at slots=2 exceeds the
# 16 MB scoped-vmem limit on v5e).
DEFAULT_BATCH_TILE = 256
DEFAULT_CORPUS_TILE = 2048


def pick_corpus_tile(num_items: int, dim: int) -> int:
    """Largest healthy corpus tile for the scan kernels at this dim.

    Measured on v5e (slots=2 + certificate, bt=256, 1M items): ct=2048
    sustains 148k qps at dim 64 (ct*dim = 128k elements) but collapses
    ~300x at dim 384 with the same tile (ct*dim = 768k — VMEM thrash
    once the wider corpus tiles + matmul staging crowd the running
    buffers), while ct=1024 (ct*dim = 384k) runs dim 384 at 74k qps.
    Budget rule from those points: keep ct*dim <= ~400k elements, capped
    at the dim-64-tuned default and floored at 256 lanes.
    """
    budget = 400_000
    tile = DEFAULT_CORPUS_TILE
    while tile > 256 and tile * dim > budget:
        tile //= 2
    return min(tile, 1 << (max(num_items, 2) - 1).bit_length())


def _lane_mapped_scores(scores, corpus_step, corpus_tile, lane_shuffle):
    """Map tile scores onto lanes; returns (scores, positions).

    Default mapping is identity (tile column j == lane j). With
    ``lane_shuffle`` s != 0, the tile's scores are rotated by
    shift = (tile_index * s) mod L before the slot contest, so lane l
    holds item (l - shift) mod L of the tile. Two items in different
    tiles t1 != t2 that collide under the identity mapping (same column)
    land in different lanes whenever (t1 - t2) * s != 0 mod L — with
    s=1 and num_tiles <= L, NO identity-mapping collision survives,
    which is what makes a shuffled retry pass effective for rows the
    first pass could not certify.
    """
    base = corpus_step * corpus_tile
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
    if not lane_shuffle:
        return scores, base + iota
    shift = (corpus_step * lane_shuffle) % corpus_tile
    scores = pltpu.roll(scores, shift, 1)
    # pltpu.roll(x, shift, 1) places input column j at lane (j + shift)
    # mod L (np.roll semantics), i.e. lane l holds tile item
    # (l - shift) mod L:
    positions = base + jax.lax.rem(
        iota - shift + corpus_tile, corpus_tile
    )
    return scores, positions


def _tile_scores(q_ref, corpus_ref, scales_ref):
    """(bt, ct) score tile; int8 corpora dequantize on the fly.

    int8 mode: the corpus tile is stored as int8 with a per-item scale
    (score = scale_i * dot(q, q_i)); the cast to bf16 happens in VMEM so
    HBM sees half the bytes of a bf16 corpus.
    """
    corpus = corpus_ref[:]
    if corpus.dtype == jnp.int8:
        corpus = corpus.astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        q_ref[:],
        corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (batch_tile, corpus_tile)
    if scales_ref is not None:
        scores = scores * scales_ref[:]  # (1, ct) broadcast
    return scores


def _scan_kernel(
    *refs,
    corpus_tile,
    true_num_items,
    lane_shuffle=0,
    has_scales=False,
    track_discards=False,
):
    if has_scales:
        q_ref, corpus_ref, scales_ref, *outs = refs
    else:
        q_ref, corpus_ref, *outs = refs
        scales_ref = None
    vals_ref, pos_ref, *rest = outs
    dmax_ref = rest[0] if track_discards else None
    corpus_step = pl.program_id(1)

    @pl.when(corpus_step == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, NEG_INF)
        pos_ref[:] = jnp.zeros_like(pos_ref)
        if dmax_ref is not None:
            dmax_ref[:] = jnp.full_like(dmax_ref, NEG_INF)

    scores = _tile_scores(q_ref, corpus_ref, scales_ref)
    scores, positions = _lane_mapped_scores(
        scores, corpus_step, corpus_tile, lane_shuffle
    )
    if true_num_items is not None:
        scores = jnp.where(positions < true_num_items, scores, NEG_INF)
    better = scores > vals_ref[:]
    if dmax_ref is not None:
        # loser of the slot contest = the value this lane discards now;
        # reduced to a per-row running max ((bt, 1) buffer) to keep VMEM
        # pressure off the hot loop.
        discarded = jnp.where(better, vals_ref[:], scores)
        dmax_ref[:] = jnp.maximum(
            dmax_ref[:], jnp.max(discarded, axis=-1, keepdims=True)
        )
    vals_ref[:] = jnp.where(better, scores, vals_ref[:])
    pos_ref[:] = jnp.where(better, positions, pos_ref[:])


def _scan2_kernel(
    *refs,
    corpus_tile,
    true_num_items,
    lane_shuffle=0,
    has_scales=False,
    track_discards=False,
):
    """Top-2-per-lane variant: a lane loses a true top-k item only when
    THREE of them collide in it — certification rate ~96% at the default
    L=2048 (k=100), vs ~10% for one slot."""
    if has_scales:
        q_ref, corpus_ref, scales_ref, *outs = refs
    else:
        q_ref, corpus_ref, *outs = refs
        scales_ref = None
    vals1_ref, pos1_ref, vals2_ref, pos2_ref, *rest = outs
    dmax_ref = rest[0] if track_discards else None
    corpus_step = pl.program_id(1)

    @pl.when(corpus_step == 0)
    def _init():
        vals1_ref[:] = jnp.full_like(vals1_ref, NEG_INF)
        pos1_ref[:] = jnp.zeros_like(pos1_ref)
        vals2_ref[:] = jnp.full_like(vals2_ref, NEG_INF)
        pos2_ref[:] = jnp.zeros_like(pos2_ref)
        if dmax_ref is not None:
            dmax_ref[:] = jnp.full_like(dmax_ref, NEG_INF)

    scores = _tile_scores(q_ref, corpus_ref, scales_ref)
    scores, positions = _lane_mapped_scores(
        scores, corpus_step, corpus_tile, lane_shuffle
    )
    if true_num_items is not None:
        scores = jnp.where(positions < true_num_items, scores, NEG_INF)
    best1, best2 = vals1_ref[:], vals2_ref[:]
    beats1 = scores > best1
    # value/pos displaced into the slot-2 contest
    contender = jnp.where(beats1, best1, scores)
    contender_pos = jnp.where(beats1, pos1_ref[:], positions)
    beats2 = contender > best2
    if dmax_ref is not None:
        # loser of the slot-2 contest leaves the lane for good; per-row
        # running max keeps the certificate state at (bt, 1)
        discarded = jnp.where(beats2, best2, contender)
        dmax_ref[:] = jnp.maximum(
            dmax_ref[:], jnp.max(discarded, axis=-1, keepdims=True)
        )
    vals1_ref[:] = jnp.where(beats1, scores, best1)
    pos1_ref[:] = jnp.where(beats1, positions, pos1_ref[:])
    vals2_ref[:] = jnp.where(beats2, contender, best2)
    pos2_ref[:] = jnp.where(beats2, contender_pos, pos2_ref[:])


def lane_max_scan(
    queries: Array,
    corpus: Array,
    *,
    batch_tile: int = DEFAULT_BATCH_TILE,
    corpus_tile: int = DEFAULT_CORPUS_TILE,
    slots: int = 1,
    track_discards: bool = False,
    true_num_items: int | None = None,
    lane_shuffle: int = 0,
    scales: Array | None = None,
    interpret: bool = False,
) -> tuple[Array, ...]:
    """One fused sweep -> per-lane top-`slots` values/positions.

    Returns (values (B, slots*corpus_tile), positions (B, slots*corpus_tile)).
    With ``track_discards=True``, also returns the per-row maximum value
    ever evicted from any lane's slots, (B, 1) f32 — the single-sweep
    exactness certificate (see ``certified_topk``). ``true_num_items``
    masks zero-padding rows of the corpus to -inf inside the kernel so
    both results and certificates see only the logical corpus.

    ``scales``: (N,) or (1, N) per-item f32 multipliers applied to the
    score tile, for int8-quantized corpora (score = scale_i * q . c_i);
    the int8->bf16 cast happens in VMEM, so an int8 corpus halves HBM
    read traffic and doubles per-chip catalog capacity.
    """
    batch, dim = queries.shape
    num_items = corpus.shape[0]
    batch_tile = min(batch_tile, batch)
    corpus_tile = min(corpus_tile, num_items)
    if batch % batch_tile or num_items % corpus_tile:
        msg = (
            f"shapes must tile evenly: {batch=} % {batch_tile=}, "
            f"{num_items=} % {corpus_tile=}"
        )
        raise ValueError(msg)
    if slots not in (1, 2):
        msg = f"slots must be 1 or 2, got {slots}"
        raise ValueError(msg)

    grid = (batch // batch_tile, num_items // corpus_tile)
    block_in = [
        pl.BlockSpec(
            (batch_tile, dim), lambda b, i: (b, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (corpus_tile, dim), lambda b, i: (i, 0), memory_space=pltpu.VMEM
        ),
    ]
    operands = [queries, corpus]
    if scales is not None:
        scales = jnp.asarray(scales, dtype=jnp.float32).reshape(1, -1)
        if scales.shape[1] != num_items:
            msg = f"scales length {scales.shape[1]} != {num_items=}"
            raise ValueError(msg)
        block_in.append(
            pl.BlockSpec(
                (1, corpus_tile), lambda b, i: (0, i),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(scales)
    out_block = pl.BlockSpec(
        (batch_tile, corpus_tile), lambda b, i: (b, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape_f = jax.ShapeDtypeStruct((batch, corpus_tile), jnp.float32)
    out_shape_i = jax.ShapeDtypeStruct((batch, corpus_tile), jnp.int32)
    cost = pl.CostEstimate(
        flops=2 * batch * num_items * dim,
        bytes_accessed=corpus.size * corpus.dtype.itemsize,
        transcendentals=0,
    )
    dmax_block = pl.BlockSpec(
        (batch_tile, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM
    )
    extra_blocks = [dmax_block] if track_discards else []
    extra_shapes = (
        [jax.ShapeDtypeStruct((batch, 1), jnp.float32)]
        if track_discards
        else []
    )
    if true_num_items is not None and true_num_items >= num_items:
        true_num_items = None
    kernel_kwargs = dict(
        corpus_tile=corpus_tile,
        true_num_items=true_num_items,
        lane_shuffle=lane_shuffle,
        has_scales=scales is not None,
        track_discards=track_discards,
    )
    if slots == 1:
        kernel = functools.partial(_scan_kernel, **kernel_kwargs)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=block_in,
            out_specs=[out_block, out_block, *extra_blocks],
            out_shape=[out_shape_f, out_shape_i, *extra_shapes],
            cost_estimate=cost,
            interpret=interpret,
        )(*operands)
        return tuple(outs)
    kernel = functools.partial(_scan2_kernel, **kernel_kwargs)
    vals1, pos1, vals2, pos2, *extra = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=block_in,
        out_specs=[out_block, out_block, out_block, out_block, *extra_blocks],
        out_shape=[
            out_shape_f,
            out_shape_i,
            out_shape_f,
            out_shape_i,
            *extra_shapes,
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)
    return (
        jnp.concatenate([vals1, vals2], axis=-1),
        jnp.concatenate([pos1, pos2], axis=-1),
        *extra,
    )


def scan_topk(
    queries: Array,
    corpus: Array,
    k: int,
    *,
    batch_tile: int = DEFAULT_BATCH_TILE,
    corpus_tile: int = DEFAULT_CORPUS_TILE,
    slots: int = 1,
    true_num_items: int | None = None,
    scales: Array | None = None,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Fused-scan top-k (near-exact; see module docstring for recall)."""
    vals, pos = lane_max_scan(
        queries,
        corpus,
        batch_tile=batch_tile,
        corpus_tile=corpus_tile,
        slots=slots,
        true_num_items=true_num_items,
        scales=scales,
        interpret=interpret,
    )
    top_vals, top_lanes = jax.lax.top_k(vals, k)
    top_pos = jnp.take_along_axis(pos, top_lanes, axis=-1)
    return top_vals, top_pos


def scan_topk_excluding(
    queries: Array,
    corpus: Array,
    k: int,
    *,
    exclude_positions: Array | None = None,
    true_num_items: int | None = None,
    batch_tile: int = DEFAULT_BATCH_TILE,
    corpus_tile: int = DEFAULT_CORPUS_TILE,
    slots: int = 2,
    scales: Array | None = None,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Fused-scan top-k with per-row exclusions and query padding.

    Exclusions are applied by slack: the kernel retrieves k + E lanes,
    excluded (and corpus-padding) positions are masked to -inf, and the
    final top-k is taken — so E excluded items can never push a wanted
    item out. Requires k + E <= corpus_tile lanes.

    `true_num_items`: logical corpus size when the stored corpus is
    zero-padded to a tile multiple (padding rows are masked out).
    """
    batch = queries.shape[0]
    batch_tile = min(batch_tile, _round_up(batch, 8))
    pad_rows = -batch % batch_tile
    if pad_rows:
        queries = jnp.pad(queries, ((0, pad_rows), (0, 0)))
        if exclude_positions is not None:
            exclude_positions = jnp.pad(
                exclude_positions, ((0, pad_rows), (0, 0))
            )
    slack = 0 if exclude_positions is None else exclude_positions.shape[1]
    pool = slots * min(corpus_tile, corpus.shape[0])
    # when N <= pool every item provably lands in some lane slot (each
    # lane sees at most `slots` tiles' worth of items), so coverage is
    # exhaustive regardless of slack; otherwise an exclusion list wider
    # than the pool's headroom could exhaust the candidates and top_k
    # would fill the tail with -inf rows whose positions ARE excluded
    # items — fail loud instead of silently recommending them.
    if slack and k + slack > pool and corpus.shape[0] > pool:
        msg = (
            f"exclusion width {slack} + {k=} exceeds the candidate pool "
            f"({slots} slots x {min(corpus_tile, corpus.shape[0])} lanes "
            f"= {pool}); raise corpus_tile/slots or use the dense method"
        )
        raise ValueError(msg)
    fetch = min(k + slack, pool)
    # true_num_items masks IN-KERNEL: padding rows must not reach the
    # lanes at all — zero rows score 0, which outranks negative real
    # scores and would both eat the exclusion slack and leak
    # out-of-range positions into the results
    vals, pos = scan_topk(
        queries,
        corpus,
        fetch,
        batch_tile=batch_tile,
        corpus_tile=corpus_tile,
        slots=slots,
        true_num_items=true_num_items,
        scales=scales,
        interpret=interpret,
    )
    if exclude_positions is not None:
        hit = jnp.any(
            pos[:, :, None] == exclude_positions[:, None, :], axis=-1
        )
        vals = jnp.where(hit, NEG_INF, vals)
    top_vals, sel = jax.lax.top_k(vals, k)
    top_pos = jnp.take_along_axis(pos, sel, axis=-1)
    return top_vals[:batch], top_pos[:batch]


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _count_kernel(
    q_ref, tau_ref, corpus_ref, count_ref, *, corpus_tile, true_num_items
):
    corpus_step = pl.program_id(1)

    @pl.when(corpus_step == 0)
    def _init():
        count_ref[:] = jnp.zeros_like(count_ref)

    scores = jax.lax.dot_general(
        q_ref[:],
        corpus_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    hits = scores >= tau_ref[:]
    if true_num_items is not None:
        base = corpus_step * corpus_tile
        positions = base + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, dimension=1
        )
        hits = jnp.logical_and(hits, positions < true_num_items)
    count_ref[:] += jnp.sum(hits.astype(jnp.int32), axis=-1, keepdims=True)


def count_at_least(
    queries: Array,
    corpus: Array,
    tau: Array,
    *,
    batch_tile: int = DEFAULT_BATCH_TILE,
    corpus_tile: int = DEFAULT_CORPUS_TILE,
    true_num_items: int | None = None,
    interpret: bool = False,
) -> Array:
    """Per-row count of corpus scores >= tau (fused sweep, (B,) int32)."""
    batch, dim = queries.shape
    num_items = corpus.shape[0]
    batch_tile = min(batch_tile, batch)
    corpus_tile = min(corpus_tile, num_items)
    if true_num_items is not None and true_num_items >= num_items:
        true_num_items = None
    grid = (batch // batch_tile, num_items // corpus_tile)
    counts = pl.pallas_call(
        functools.partial(
            _count_kernel,
            corpus_tile=corpus_tile,
            true_num_items=true_num_items,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_tile, dim), lambda b, i: (b, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (batch_tile, 1), lambda b, i: (b, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (corpus_tile, dim), lambda b, i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, 1), jnp.int32),
        interpret=interpret,
    )(queries, tau.reshape(-1, 1), corpus)
    return counts[:, 0]


def certified_topk(
    queries: Array,
    corpus: Array,
    k: int,
    *,
    batch_tile: int = DEFAULT_BATCH_TILE,
    corpus_tile: int = DEFAULT_CORPUS_TILE,
    slots: int = 2,
    method: str = "discard",
    true_num_items: int | None = None,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Fused-scan top-k + per-row exactness certificate.

    Returns (values, positions, exact_mask). exact_mask[b] is True when
    the row's result is *provably* the exact top-k by score multiset
    (tied items at the k-th score may swap identity). Callers needing
    guaranteed exactness re-run the (rare) uncertified rows through a
    lane-shuffled retry and then the dense path; see
    RetrievalIndex.search_certified. Default slots=2 (top-2 per lane):
    ~96% of rows certify at L=2048, k=100 vs ~10% for slots=1.

    method="discard" (default): SINGLE sweep. The kernel tracks the
    maximum value ever evicted from any lane's slots (one (bt, 1)
    running max). Every corpus element either sits in a lane slot at the
    end or was evicted; so if max(evicted) < tau (the k-th value found),
    every element >= tau is still in the buffers and the selected top-k
    is provably exact. A couple of VPU ops per tile instead of a second
    matmul sweep.

    method="count": two sweeps — after the scan, a fused count sweep
    computes #{score >= tau} per row and certifies when it equals k.
    Kept for cross-validation.
    """
    if method == "count":
        top_vals, top_pos = scan_topk(
            queries,
            corpus,
            k,
            batch_tile=batch_tile,
            corpus_tile=corpus_tile,
            slots=slots,
            true_num_items=true_num_items,
            interpret=interpret,
        )
        tau = top_vals[:, k - 1]
        counts = count_at_least(
            queries,
            corpus,
            tau,
            batch_tile=batch_tile,
            corpus_tile=corpus_tile,
            true_num_items=true_num_items,
            interpret=interpret,
        )
        return top_vals, top_pos, counts == k
    if method != "discard":
        msg = f"unknown certification {method=}"
        raise ValueError(msg)
    top_vals, top_pos, dmax = certified_topk_parts(
        queries,
        corpus,
        k,
        batch_tile=batch_tile,
        corpus_tile=corpus_tile,
        slots=slots,
        true_num_items=true_num_items,
        interpret=interpret,
    )
    tau = top_vals[:, k - 1]
    # dmax <= tau certifies SCORE-MULTISET exactness: no evicted value
    # exceeds tau, so every element scoring strictly above tau is still
    # in the lane buffers and gets selected; the boundary fills with
    # tau-valued elements, which are interchangeable with any tied
    # true-top-k element. (Tied items at the k-th score may swap
    # identity — same guarantee contract as any score-ranked retriever;
    # bf16 scores over large corpora tie routinely, so a strict <
    # certificate would reject rows whose returned scores are provably
    # optimal.)
    exact = dmax <= tau
    return top_vals, top_pos, exact


# ---------------------------------------------------------------------------
# Packed-key scan ("turbo" path)
# ---------------------------------------------------------------------------
# The slot contest above spends most of its VPU budget tracking POSITIONS:
# per corpus tile it needs 2 compares + 5 selects + an iota on the (bt, ct)
# score tile. The packed-key scan removes position tracking entirely:
#
#   key = (bitcast<int32>(score * s + 1.5) & ~low_mask) | tile_index
#
# - queries are pre-scaled so |score*s| <= 0.25, hence the float key lies
#   in [1.25, 1.75): positive, single exponent, UNIFORM quantization. For
#   positive IEEE-754 floats the int32 bit pattern is monotonic in the
#   value, so integer max/min on keys IS max/min on (quantized score,
#   tile) lexicographic order.
# - the low `idx_bits` mantissa bits carry the corpus-tile index; the
#   lane index is implicit (tile column j == lane j), so position =
#   tile * corpus_tile + lane is recovered AFTER the sweep from the
#   winning key + its lane. No pos buffers, no iota, no selects:
#   the whole slot-2 contest is max, min, max, min.
#
# Precision contract: selection/certification order is the PACKED order —
# scores quantized to 2^-23+idx_bits of the [1.25,1.75) key range (e.g.
# idx_bits=10 -> quantum 2^-13 of the scaled range, ~5e-4 of a unit score
# range at the default bound). Ties at the quantum may swap vs the f32
# order; exact f32 scores for the selected items are recomputed by a
# (B, k) gather+dot epilogue. The discard certificate proves exactness
# w.r.t. the packed order (same score-multiset contract as the f32 path,
# at quantum resolution).


def _packed_keys(scores, step, idx_bits, reserve_bits=0, biased=False):
    """(bt, ct) f32 scaled scores -> int32 packed keys for corpus tile
    `step`. Assumes scores + 1.5 > 0 (sound `score_bound` upstream).

    `reserve_bits` extra low bits are zeroed below the tile index —
    `merge_lane_pairs` stamps its merge path there so positions decode
    without a lane map. `biased=True` means the +1.5 window bias is
    already in `scores` (folded into the matmul via an augmented
    column, see `bias_in_dot`).
    """
    keyf = scores if biased else scores + 1.5
    keyi = jax.lax.bitcast_convert_type(keyf, jnp.int32)
    low_mask = (1 << (idx_bits + reserve_bits)) - 1
    return (keyi & ~low_mask) | (step << reserve_bits)


def _packed_scan2_kernel(
    *refs,
    corpus_tile,
    true_num_items,
    idx_bits,
    reserve_bits=0,
    bias_in_dot=False,
    lane_shuffle=0,
    has_scales=False,
    track_discards=True,
):
    if has_scales:
        q_ref, corpus_ref, scales_ref, *outs = refs
    else:
        q_ref, corpus_ref, *outs = refs
        scales_ref = None
    if track_discards:
        key1_ref, key2_ref, dmax_ref = outs
    else:
        key1_ref, key2_ref = outs
        dmax_ref = None
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        key1_ref[:] = jnp.zeros_like(key1_ref)
        key2_ref[:] = jnp.zeros_like(key2_ref)
        if dmax_ref is not None:
            dmax_ref[:] = jnp.zeros_like(dmax_ref)

    scores = _tile_scores(q_ref, corpus_ref, scales_ref)
    if lane_shuffle:
        shift = (step * lane_shuffle) % corpus_tile
        scores = pltpu.roll(scores, shift, 1)
    keys = _packed_keys(
        scores, step, idx_bits, reserve_bits=reserve_bits, biased=bias_in_dot
    )
    if true_num_items is not None:
        # mask zero-padding corpus rows to key 0 (below any real key);
        # lane l holds tile item (l - shift) mod ct under lane_shuffle
        iota = jax.lax.broadcasted_iota(jnp.int32, keys.shape, dimension=1)
        if lane_shuffle:
            shift = (step * lane_shuffle) % corpus_tile
            iota = jax.lax.rem(iota - shift + corpus_tile, corpus_tile)
        keys = jnp.where(
            step * corpus_tile + iota < true_num_items, keys, 0
        )
    best1, best2 = key1_ref[:], key2_ref[:]
    new1 = jnp.maximum(best1, keys)
    contender = jnp.minimum(best1, keys)
    new2 = jnp.maximum(best2, contender)
    if dmax_ref is not None:
        discarded = jnp.minimum(best2, contender)
        # full-width elementwise running discard-max: cheaper on the VPU
        # than reducing each tile's discards to (bt, 1) inside the hot
        # loop (measured -0.35 ms at B=2048 x 1M x 64); reduced once
        # post-sweep. track_discards=False (uncertified callers — the
        # exclusion search) skips the min + max + buffer round-trip per
        # element: ~25% of the contest's VPU work.
        dmax_ref[:] = jnp.maximum(dmax_ref[:], discarded)
    key1_ref[:] = new1
    key2_ref[:] = new2


def packed_lane_scan(
    queries: Array,
    corpus: Array,
    *,
    score_bound: float | Array = 1.0,
    batch_tile: int = DEFAULT_BATCH_TILE,
    corpus_tile: int = DEFAULT_CORPUS_TILE,
    idx_bits: int | None = None,
    reserve_bits: int = 0,
    bias_in_dot: bool = False,
    true_num_items: int | None = None,
    lane_shuffle: int = 0,
    scales: Array | None = None,
    track_discards: bool = True,
    interpret: bool = False,
) -> tuple[Array, Array | None]:
    """One packed-key sweep -> (keys (B, 2*ct) int32, dmax (B,) int32
    — or None with track_discards=False, which skips the certificate
    bookkeeping for uncertified callers: 2 VPU ops + one (bt, ct) i32
    buffer round-trip per tile saved).

    `score_bound` must upper-bound |score| (for unit-norm embeddings, 1.0;
    generally max||q|| * max||c||, times max|scale| for int8 corpora).
    Queries are pre-scaled by 0.25/score_bound so keys stay in the
    uniform-quantization window; an unsound bound degrades quantization
    resolution smoothly (keys stay monotonic for any score > -6.0 after
    scaling) but a bound allowing score*s <= -1.5 would break key order —
    hence the 0.25 safety margin on top of the caller's bound.

    `reserve_bits` zeroes extra low mantissa bits below the tile index
    for `merge_lane_pairs` path stamps (coarsens the key quantum by
    2^reserve_bits). `bias_in_dot=True` folds the +1.5 window bias into
    the matmul: the CORPUS must already carry a trailing column of
    constant 1.5 (queries get a matching 1.0 column here); the
    contraction dim is MXU-padded anyway so the extra column is free on
    the MXU and saves one VPU add per score element (float corpora
    only — incompatible with `scales`).
    """
    batch = queries.shape[0]
    num_items = corpus.shape[0]
    batch_tile = min(batch_tile, batch)
    corpus_tile = min(corpus_tile, num_items)
    if batch % batch_tile or num_items % corpus_tile:
        msg = (
            f"shapes must tile evenly: {batch=} % {batch_tile=}, "
            f"{num_items=} % {corpus_tile=}"
        )
        raise ValueError(msg)
    num_tiles = num_items // corpus_tile
    if idx_bits is None:
        idx_bits = max((num_tiles - 1).bit_length(), 1)
    if num_tiles > (1 << idx_bits):
        msg = f"{num_tiles=} does not fit in {idx_bits=}"
        raise ValueError(msg)
    if idx_bits + reserve_bits > 20:
        msg = (
            f"{idx_bits=} + {reserve_bits=} leaves fewer than 3 mantissa "
            "bits of score resolution"
        )
        raise ValueError(msg)
    scale = 0.25 / jnp.asarray(score_bound, dtype=jnp.float32)
    queries = (queries.astype(jnp.float32) * scale).astype(queries.dtype)
    if bias_in_dot:
        if scales is not None:
            msg = "bias_in_dot is incompatible with int8 scales"
            raise ValueError(msg)
        if corpus.shape[1] != queries.shape[1] + 1:
            msg = (
                "bias_in_dot expects the corpus to carry a trailing "
                f"1.5 column: corpus dim {corpus.shape[1]} != query dim "
                f"{queries.shape[1]} + 1"
            )
            raise ValueError(msg)
        queries = jnp.concatenate(
            [queries, jnp.ones((batch, 1), dtype=queries.dtype)], axis=1
        )
    dim = queries.shape[1]

    grid = (batch // batch_tile, num_tiles)
    block_in = [
        pl.BlockSpec(
            (batch_tile, dim), lambda b, i: (b, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (corpus_tile, dim), lambda b, i: (i, 0), memory_space=pltpu.VMEM
        ),
    ]
    operands = [queries, corpus]
    if scales is not None:
        scales = jnp.asarray(scales, dtype=jnp.float32).reshape(1, -1)
        block_in.append(
            pl.BlockSpec(
                (1, corpus_tile), lambda b, i: (0, i),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(scales)
    out_block = pl.BlockSpec(
        (batch_tile, corpus_tile), lambda b, i: (b, 0),
        memory_space=pltpu.VMEM,
    )
    if true_num_items is not None and true_num_items >= num_items:
        true_num_items = None
    kernel = functools.partial(
        _packed_scan2_kernel,
        corpus_tile=corpus_tile,
        true_num_items=true_num_items,
        idx_bits=idx_bits,
        reserve_bits=reserve_bits,
        bias_in_dot=bias_in_dot,
        lane_shuffle=lane_shuffle,
        has_scales=scales is not None,
        track_discards=track_discards,
    )
    key_shape = jax.ShapeDtypeStruct((batch, corpus_tile), jnp.int32)
    n_bufs = 3 if track_discards else 2
    # VMEM budget: the f32 score tile + the i32 running buffers at
    # (bt, ct) + double-buffered corpus tiles + queries. The compiler's
    # default 16 MB scoped limit rejects the tuned (512, 2048) geometry
    # by ~1 MB (fresh-compile OOM observed on v5e), so grant what the
    # kernel actually needs, with slack for scheduling.
    item_bytes = corpus.dtype.itemsize
    vmem_needed = (
        (4 + 4 * n_bufs) * batch_tile * corpus_tile  # score f32 + bufs
        + 2 * corpus_tile * dim * item_bytes  # double-buffered tiles
        + batch_tile * dim * queries.dtype.itemsize
        + (2 * corpus_tile * 4 if scales is not None else 0)
        + 2 * 1024 * 1024  # slack
    )
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=max(vmem_needed, 16 * 1024 * 1024)
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=block_in,
        out_specs=[out_block] * n_bufs,
        out_shape=[key_shape] * n_bufs,
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * num_items * dim,
            bytes_accessed=corpus.size * corpus.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)
    keys = jnp.concatenate(outs[:2], axis=-1)
    if not track_discards:
        return keys, None
    return keys, jnp.max(outs[2], axis=-1)


def merge_lane_pairs3(
    key1: Array, key2: Array, level: int
) -> tuple[Array, Array, Array, Array]:
    """Merge lane pairs keeping the top-3 of each pair's 4 keys.

    Same pairing/stamping as `merge_lane_pairs`, but only the pair's
    MINIMUM key is discarded, so certification survives unless a pair
    holds >= 4 of a row's top-k (vs >= 3 for the top-2 merge): expected
    per-row failures drop from ~k^3/(6 pairs^2) to ~k^4/(24 pairs^3)
    (k=100, ct=2048 -> ~0.15 vs ~0.0004). The selection buffer is
    3*(ct/2) = 1.5ct wide vs ct for top-2 and 2ct unmerged — a middle
    point trading ~1/4 of the unmerged selection cost for a ~96%
    certification rate at the merged-path scan speed.

    The pair's sorted pairs (a1 >= a2, b1 >= b2) merge with the standard
    2+2 bitonic network: s1 = max(a1,b1), s4 = min(a2,b2), and the
    middle two are max/min of (min(a1,b1), max(a2,b2)).
    Returns (top1, top2, top3, disc_max (B,)).
    """
    w = key1.shape[1] // 2
    bit = 1 << level
    a1, a2 = key1[:, :w], key2[:, :w]
    b1, b2 = key1[:, w:] | bit, key2[:, w:] | bit
    lo1 = jnp.minimum(a1, b1)
    hi2 = jnp.maximum(a2, b2)
    top1 = jnp.maximum(a1, b1)
    top2 = jnp.maximum(lo1, hi2)
    top3 = jnp.minimum(lo1, hi2)
    disc = jnp.minimum(a2, b2)
    return top1, top2, top3, jnp.max(disc, axis=-1)


def merge_lane_pairs(
    key1: Array, key2: Array, level: int
) -> tuple[Array, Array, Array]:
    """Halve the slot buffers: keep the top-2 keys of each lane pair.

    Pairs column j with column j + w/2 (contiguous block slices — no
    lane relayout). Survivors from the upper half get bit `level`
    stamped into the key's reserved low bits, so positions decode from
    (key, final column) alone — no lane map, no gather. Returns
    (key1', key2', disc_max (B,)) with disc_max the max discarded key,
    which the caller must fold into the sweep's discard-max: the
    certificate then stays sound, while the certification RATE drops
    (a pair holding >= 3 of a row's top-k forces a retry — measured
    96% -> 87% per merge at k=100, ct=2048).

    Requires `level` < the `reserve_bits` used at pack time. Stamping
    perturbs order only within one (coarsened) key quantum.
    """
    w = key1.shape[1] // 2
    bit = 1 << level
    a1, a2 = key1[:, :w], key2[:, :w]
    b1, b2 = key1[:, w:] | bit, key2[:, w:] | bit
    awins = a1 >= b1
    top1 = jnp.where(awins, a1, b1)
    top2 = jnp.where(awins, jnp.maximum(a2, b1), jnp.maximum(b2, a1))
    disc = jnp.maximum(
        jnp.where(awins, jnp.minimum(a2, b1), jnp.minimum(b2, a1)),
        jnp.where(awins, b2, a2),
    )
    return top1, top2, jnp.max(disc, axis=-1)


def _packed_scan_select_kernel(
    *refs,
    corpus_tile,
    true_num_items,
    idx_bits,
    reserve_bits,
    bias_in_dot,
    lane_shuffle,
    has_scales,
    num_tiles,
    k,
    capacity,
    fb,
    quantum_bits,
    merge_levels,
    merge_keep,
):
    """Packed slot-contest scan with the selection FUSED as an epilogue.

    Identical per-tile contest to `_packed_scan2_kernel`, but the slot
    buffers live in VMEM scratch instead of kernel outputs; at the last
    corpus step the lane-pair merge + `_threshold_select_body` run on
    the still-resident buffers and only the (bt, capacity) winners (and
    a reduced per-row discard max) leave the kernel. This removes the
    whole intermediate HBM round trip of the two-kernel path — 3
    (B, ct) i32 stores + the (B, 1.5ct) pool store/load (~250 MB at
    B=4096, ct=2048) — plus one dispatch/grid overhead, which the phase
    probe (runs/bench_select_phases.py) measured at ~2 ms per call.

    MEASURED OUTCOME (runs/bench_fused_select.py, v5e, bench geometry):
    18.2 ms/batch vs 15.9 for the two-kernel threshold path and 17.7
    for lax.top_k — the epilogue's VMEM working set (~6 extra i32
    arrays at (bt, 1.5ct)) degrades the scan loop's scheduling more
    than the saved traffic buys back. Kept for A/B and future
    VMEM-budget work; `selector="auto"` routes to the two-kernel path.
    """
    if has_scales:
        (q_ref, corpus_ref, scales_ref, keys_out, meta_out, dmax_out,
         key1_ref, key2_ref, dmax_ref) = refs
    else:
        (q_ref, corpus_ref, keys_out, meta_out, dmax_out,
         key1_ref, key2_ref, dmax_ref) = refs
        scales_ref = None
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        key1_ref[:] = jnp.zeros_like(key1_ref)
        key2_ref[:] = jnp.zeros_like(key2_ref)
        dmax_ref[:] = jnp.zeros_like(dmax_ref)

    scores = _tile_scores(q_ref, corpus_ref, scales_ref)
    if lane_shuffle:
        shift = (step * lane_shuffle) % corpus_tile
        scores = pltpu.roll(scores, shift, 1)
    keys = _packed_keys(
        scores, step, idx_bits, reserve_bits=reserve_bits,
        biased=bias_in_dot,
    )
    if true_num_items is not None:
        iota = jax.lax.broadcasted_iota(jnp.int32, keys.shape, dimension=1)
        if lane_shuffle:
            shift = (step * lane_shuffle) % corpus_tile
            iota = jax.lax.rem(iota - shift + corpus_tile, corpus_tile)
        keys = jnp.where(
            step * corpus_tile + iota < true_num_items, keys, 0
        )
    best1, best2 = key1_ref[:], key2_ref[:]
    new1 = jnp.maximum(best1, keys)
    contender = jnp.minimum(best1, keys)
    new2 = jnp.maximum(best2, contender)
    discarded = jnp.minimum(best2, contender)
    dmax_ref[:] = jnp.maximum(dmax_ref[:], discarded)
    key1_ref[:] = new1
    key2_ref[:] = new2

    @pl.when(step == num_tiles - 1)
    def _epilogue():
        key1, key2 = key1_ref[:], key2_ref[:]
        dmax_row = jnp.max(dmax_ref[:], axis=1, keepdims=True)
        if merge_levels and merge_keep == 3:
            k1, k2, k3, disc = merge_lane_pairs3(key1, key2, 0)
            dmax_row = jnp.maximum(dmax_row, disc[:, None])
            pool = jnp.concatenate([k1, k2, k3], axis=-1)
        else:
            for level in range(merge_levels):
                key1, key2, disc = merge_lane_pairs(key1, key2, level)
                dmax_row = jnp.maximum(dmax_row, disc[:, None])
            pool = jnp.concatenate([key1, key2], axis=-1)
        sel_keys, sel_meta = _threshold_select_body(
            pool,
            k=k,
            capacity=capacity,
            fb=fb,
            quantum_bits=quantum_bits,
            shared_exponent=True,
        )
        keys_out[:] = sel_keys
        meta_out[:] = sel_meta
        dmax_out[:] = jnp.broadcast_to(dmax_row, dmax_out.shape)


def packed_lane_scan_select(
    queries: Array,
    corpus: Array,
    k: int,
    *,
    score_bound: float | Array = 1.0,
    batch_tile: int = DEFAULT_BATCH_TILE,
    corpus_tile: int = DEFAULT_CORPUS_TILE,
    idx_bits: int | None = None,
    merge_levels: int = 0,
    merge_keep: int = 2,
    capacity: int | None = None,
    bias_in_dot: bool = False,
    true_num_items: int | None = None,
    lane_shuffle: int = 0,
    scales: Array | None = None,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Fused packed sweep + merge + threshold-select in ONE kernel.

    Returns (sel_keys (B, capacity) i32, sel_lanes (B, capacity) i32,
    dmax (B,) i32): the per-row top-`capacity` candidate keys of the
    merged slot pool (rank-ordered, NOT sorted; empty slots key 0 /
    lane 0), their pool lane indices (same decode contract as the
    two-stage path: `unpack_positions` with reserve_bits=merge_levels),
    and the per-row discard-max already folded with the merge discards.
    Callers finish with `lax.top_k` over `capacity` lanes.

    Ties at the key quantum may resolve to either tied element — the
    certificate's existing exactness granularity. Same `score_bound` /
    `bias_in_dot` / `scales` contract as `packed_lane_scan`.
    """
    batch = queries.shape[0]
    num_items = corpus.shape[0]
    batch_tile = min(batch_tile, batch)
    corpus_tile = min(corpus_tile, num_items)
    if batch % batch_tile or num_items % corpus_tile:
        msg = (
            f"shapes must tile evenly: {batch=} % {batch_tile=}, "
            f"{num_items=} % {corpus_tile=}"
        )
        raise ValueError(msg)
    num_tiles = num_items // corpus_tile
    if idx_bits is None:
        idx_bits = max((num_tiles - 1).bit_length(), 1)
    if num_tiles > (1 << idx_bits):
        msg = f"{num_tiles=} does not fit in {idx_bits=}"
        raise ValueError(msg)
    if idx_bits + merge_levels > 20:
        msg = (
            f"{idx_bits=} + reserve {merge_levels} leaves fewer than 3 "
            "mantissa bits of score resolution"
        )
        raise ValueError(msg)
    if merge_keep == 3 and merge_levels:
        merge_levels = 1 if 3 * (corpus_tile >> 1) >= k else 0
    while merge_levels and 2 * (corpus_tile >> merge_levels) < k:
        merge_levels -= 1
    if merge_levels and merge_keep == 3:
        pool_width = 3 * (corpus_tile >> 1)
    else:
        pool_width = 2 * (corpus_tile >> merge_levels)
    if capacity is None:
        capacity = _round_up(k, 128)
    if not 0 < k <= capacity:
        msg = f"need 0 < {k=} <= {capacity=}"
        raise ValueError(msg)
    if capacity % 128 or pool_width % 128:
        msg = f"{capacity=} / {pool_width=} must be multiples of 128"
        raise ValueError(msg)
    fb = pool_width.bit_length()
    if 2 * fb + 1 > 31:
        msg = f"merged pool width {pool_width} too wide for meta routing"
        raise ValueError(msg)

    scale = 0.25 / jnp.asarray(score_bound, dtype=jnp.float32)
    queries = (queries.astype(jnp.float32) * scale).astype(queries.dtype)
    if bias_in_dot:
        if scales is not None:
            msg = "bias_in_dot is incompatible with int8 scales"
            raise ValueError(msg)
        if corpus.shape[1] != queries.shape[1] + 1:
            msg = (
                "bias_in_dot expects the corpus to carry a trailing "
                f"1.5 column: corpus dim {corpus.shape[1]} != query dim "
                f"{queries.shape[1]} + 1"
            )
            raise ValueError(msg)
        queries = jnp.concatenate(
            [queries, jnp.ones((batch, 1), dtype=queries.dtype)], axis=1
        )
    dim = queries.shape[1]

    grid = (batch // batch_tile, num_tiles)
    block_in = [
        pl.BlockSpec(
            (batch_tile, dim), lambda b, i: (b, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (corpus_tile, dim), lambda b, i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [queries, corpus]
    if scales is not None:
        scales = jnp.asarray(scales, dtype=jnp.float32).reshape(1, -1)
        block_in.append(
            pl.BlockSpec(
                (1, corpus_tile), lambda b, i: (0, i),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(scales)
    if true_num_items is not None and true_num_items >= num_items:
        true_num_items = None
    kernel = functools.partial(
        _packed_scan_select_kernel,
        corpus_tile=corpus_tile,
        true_num_items=true_num_items,
        idx_bits=idx_bits,
        reserve_bits=merge_levels,
        bias_in_dot=bias_in_dot,
        lane_shuffle=lane_shuffle,
        has_scales=scales is not None,
        num_tiles=num_tiles,
        k=k,
        capacity=capacity,
        fb=fb,
        quantum_bits=idx_bits + merge_levels,
        merge_levels=merge_levels,
        merge_keep=merge_keep,
    )
    sel_spec = pl.BlockSpec(
        (batch_tile, capacity), lambda b, i: (b, 0),
        memory_space=pltpu.VMEM,
    )
    dmax_spec = pl.BlockSpec(
        (batch_tile, 128), lambda b, i: (b, 0), memory_space=pltpu.VMEM
    )
    item_bytes = corpus.dtype.itemsize
    # VMEM: scan working set (score f32 + 3 i32 scratch at (bt, ct)) +
    # double-buffered corpus tiles + epilogue pool/keys/meta/roll temps
    # at (bt, 1.5ct)
    vmem_needed = (
        16 * batch_tile * corpus_tile
        + 2 * corpus_tile * dim * item_bytes
        + batch_tile * dim * queries.dtype.itemsize
        + 6 * batch_tile * pool_width * 4
        + (2 * corpus_tile * 4 if scales is not None else 0)
        + 2 * 1024 * 1024  # slack
    )
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=max(vmem_needed, 16 * 1024 * 1024)
    )
    sel_keys, sel_meta, dmax = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=block_in,
        out_specs=[sel_spec, sel_spec, dmax_spec],
        out_shape=[
            jax.ShapeDtypeStruct((batch, capacity), jnp.int32),
            jax.ShapeDtypeStruct((batch, capacity), jnp.int32),
            jax.ShapeDtypeStruct((batch, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch_tile, corpus_tile), jnp.int32),
            pltpu.VMEM((batch_tile, corpus_tile), jnp.int32),
            pltpu.VMEM((batch_tile, corpus_tile), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * num_items * dim,
            bytes_accessed=corpus.size * corpus.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)
    sel_lanes = jnp.maximum((sel_meta & ((1 << fb) - 1)) - 1, 0)
    return sel_keys, sel_lanes, dmax[:, 0]


def unpack_positions(
    keys: Array,
    lane_index: Array,
    *,
    corpus_tile: int,
    idx_bits: int,
    lane_shuffle: int = 0,
    reserve_bits: int = 0,
    merge_levels: int = 0,
) -> Array:
    """Recover corpus positions from packed keys + their lane indices.

    `lane_index` is the index into the (B, 2*width) key buffer (top_k's
    second output), width = ct >> merge_levels; the column is
    index % width. After `merge_levels` rounds of `merge_lane_pairs`
    the original lane is the column plus, per level l, bit l of the
    key's reserved low bits times ct >> (l+1). Under lane_shuffle the
    tile's item at lane l is (l - tile*shuffle) mod ct.
    """
    tile = (keys >> reserve_bits) & ((1 << idx_bits) - 1)
    width = corpus_tile >> merge_levels
    lane = jax.lax.rem(lane_index, width)
    for level in range(merge_levels):
        lane = lane + ((keys >> level) & 1) * (corpus_tile >> (level + 1))
    if lane_shuffle:
        col = jax.lax.rem(
            lane - tile * lane_shuffle % corpus_tile + corpus_tile,
            corpus_tile,
        )
    else:
        col = lane
    return tile * corpus_tile + col


def _threshold_select_body(
    pool, *, k, capacity, fb, quantum_bits, shared_exponent
):
    """Per-row top-k candidate extraction from a VMEM-resident key pool.

    The selection engine shared by `_select_kernel` (standalone pallas
    call) and `_packed_scan_select_kernel` (fused into the scan's last
    corpus step). Replaces `jax.lax.top_k` over the wide (bt, W) int32
    pool (measured 7.4 ms at (4096, 3072) on v5e — ~40% of the packed
    pass-1 cost):

    1. k-th key per row by binary search on the key BITS (keys are
       non-negative int32, so integer order == key order): one round of
       compare + row-reduce per searched bit. `shared_exponent` seeds
       the search with the high 9 bits of the row max (sound when every
       nonzero key shares them — packed floats in [1, 2) do), and
       `quantum_bits` stops the search above the index bits: tau is then
       the k-th key at QUANTUM granularity, and dropped tau-ties differ
       from kept ones only below the quantum — the packed certificate's
       existing semantics.
    2. keep-set + rank. Candidates split into two classes: keys ABOVE
       the tau quantum (all must be kept — there are < k of them) and
       tau-quantum ties (interchangeable; kept in lane order up to the
       remaining capacity). Dropping by flat lane-order rank alone
       would be UNSOUND: ties clustered in early lanes could crowd out
       a greater key in a later lane. Both class ranks ride ONE prefix
       sum (Hillis-Steele over lanes, log2(W) roll+add steps) by
       packing the counters into one int32 (gt << 16 | tie; each
       < width <= 2^15, no carry).
    3. butterfly compaction: each candidate moves LEFT by its distance
       dist = lane - rank, one bit per stage (LSB first). For monotone
       compaction routes this is conflict-free (two candidates never
       contend for one lane — property-tested against brute force).
       Key + meta (lane+1 | dist << fb) move together, so no
       post-kernel gather is needed (a (B, W) take_along_axis outside
       measured SLOWER than lax.top_k itself — TPU dynamic lane-gathers
       are the one thing this kernel must avoid).

    Returns ((bt, capacity) keys, (bt, capacity) meta), rank-ordered
    (= lane-ordered, NOT key-sorted); empty slots hold 0. The caller
    decodes lanes from meta and finishes with a cheap `lax.top_k` over
    `capacity` lanes to sort.
    """
    width = pool.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, pool.shape, dimension=1)

    # 1. k-th largest key per row, by bits
    if shared_exponent:
        rowmax = jnp.max(pool, axis=1, keepdims=True)
        tau = rowmax & ~((1 << 23) - 1)
        high_bit = 22
    else:
        tau = jnp.zeros((pool.shape[0], 1), dtype=jnp.int32)
        high_bit = 30  # tolerate keys >= 2^30 from a mildly-unsound
        # score_bound rather than silently mis-select
    # loops are deliberately UNROLLED (static roll amounts): a
    # lax.fori_loop variant with dynamic shifts compiled 2x faster
    # (26 s -> 11.5 s per shape, one-time and cached) but ran ~2 ms
    # SLOWER per batch at (4096, 3072) — dynamic rotates lower to
    # slower code than static ones
    for bit in range(high_bit, quantum_bits - 1, -1):
        cand = tau | (1 << bit)
        count = jnp.sum((pool >= cand).astype(jnp.int32), axis=1,
                        keepdims=True)
        tau = jnp.where(count >= k, cand, tau)

    # 2. two-class keep-set + rank
    floor = jnp.maximum(tau, 1)
    mask_ge = pool >= floor
    mask_gt = pool >= floor + (1 << quantum_bits)
    inc = jnp.where(
        mask_gt, 1 << 16, jnp.where(mask_ge, 1, 0)
    ).astype(jnp.int32)
    total = inc
    shift = 1
    while shift < width:
        rolled = pltpu.roll(total, shift, 1)
        total = total + jnp.where(iota >= shift, rolled, 0)
        shift *= 2
    excl = total - inc  # exclusive packed (gt_rank << 16 | tie_rank)
    tie_rank = excl & 0xFFFF
    gt_rank = excl >> 16
    n_gt = total[:, -1:] >> 16  # per-row total of above-quantum keys
    budget = capacity - n_gt  # >= capacity - (k - 1) >= 1
    mask = mask_gt | (mask_ge & (tie_rank < budget))
    rank = gt_rank + jnp.minimum(tie_rank, budget)
    dist = jnp.where(mask, iota - rank, 0)

    # 3. butterfly compaction
    meta = jnp.where(mask, (iota + 1) | (dist << fb), 0)
    keys = jnp.where(mask, pool, 0)
    stage_shift = 1
    while stage_shift < width:
        moving = ((meta >> fb) & stage_shift) != 0  # empty lanes: meta 0
        in_keys = pltpu.roll(keys, width - stage_shift, 1)
        in_meta = pltpu.roll(meta, width - stage_shift, 1)
        in_moving = ((in_meta >> fb) & stage_shift) != 0
        # wrapped-in lanes can never carry a moving element: remaining
        # dist <= lane index, so lanes < stage_shift have that bit clear
        keys = jnp.where(in_moving, in_keys, jnp.where(moving, 0, keys))
        meta = jnp.where(
            in_moving,
            in_meta - (stage_shift << fb),
            jnp.where(moving, 0, meta),
        )
        stage_shift *= 2

    return keys[:, :capacity], meta[:, :capacity]


def _select_kernel(
    pool_ref, keys_ref, meta_ref, *, k, capacity, fb, quantum_bits,
    shared_exponent,
):
    keys, meta = _threshold_select_body(
        pool_ref[:],
        k=k,
        capacity=capacity,
        fb=fb,
        quantum_bits=quantum_bits,
        shared_exponent=shared_exponent,
    )
    keys_ref[:] = keys
    meta_ref[:] = meta


def select_topk_keys(
    pool: Array,
    k: int,
    *,
    capacity: int = 128,
    batch_tile: int = 256,
    quantum_bits: int = 0,
    shared_exponent: bool = False,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Top-k of a non-negative int32 key pool, Pallas threshold-select.

    Returns (keys (B, k) descending, lane_index (B, k)) — drop-in for
    ``jax.lax.top_k(pool, k)`` when 0 <= pool < 2^31 and ties may
    resolve to either tied element (score-multiset semantics, the same
    contract as the packed certificate). Measured 5.5 ms vs lax.top_k's
    7.4 ms at (4096, 3072) on v5e — ~2 ms of which is fixed
    pallas-call + pool-HBM cost (runs/bench_select_phases.py), so in
    the packed pass-1 composition the net win is ~1.8 ms/batch
    (runs/bench_fused_select.py).

    `quantum_bits` > 0 relaxes the k-th-key search to that granularity:
    candidates tied with the k-th key in their bits >= quantum_bits may
    substitute for each other. For packed keys pass the index-bit count
    — ties then differ only below the score quantum, which is already
    the exactness granularity of the certificate. `shared_exponent`
    asserts every nonzero key shares bits 30..23 (true for packed
    float-window keys) and skips searching them.

    `capacity` must hold k and be a multiple of 128 (lane alignment);
    candidates beyond `capacity` are tau-ties and interchangeable.
    """
    if not 0 < k <= capacity:
        msg = f"need 0 < {k=} <= {capacity=}"
        raise ValueError(msg)
    if capacity % 128:
        msg = f"{capacity=} must be a multiple of 128"
        raise ValueError(msg)
    batch, width = pool.shape
    if width % 128:
        msg = f"pool width {width} must be a multiple of 128"
        raise ValueError(msg)
    if width <= capacity:
        return jax.lax.top_k(pool, k)
    fb = width.bit_length()  # lane+1 and dist both fit in fb bits
    if 2 * fb + 1 > 31:
        msg = f"pool width {width} too wide for packed meta routing"
        raise ValueError(msg)
    batch_tile = min(batch_tile, batch)
    pad_rows = -batch % batch_tile
    if pad_rows:
        pool = jnp.pad(pool, ((0, pad_rows), (0, 0)))
    padded = pool.shape[0]
    kernel = functools.partial(
        _select_kernel,
        k=k,
        capacity=capacity,
        fb=fb,
        quantum_bits=quantum_bits,
        shared_exponent=shared_exponent,
    )
    # VMEM: the pool block + mask/rank/meta working copies + roll
    # temps — grant ~8 i32 arrays at (bt, W) with slack
    vmem_needed = 9 * batch_tile * width * 4 + 2 * 1024 * 1024
    out_spec = pl.BlockSpec((batch_tile, capacity), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    sel_keys, meta = pl.pallas_call(
        kernel,
        grid=(padded // batch_tile,),
        in_specs=[
            pl.BlockSpec((batch_tile, width), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((padded, capacity), jnp.int32),
            jax.ShapeDtypeStruct((padded, capacity), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(vmem_needed, 16 * 1024 * 1024)
        ),
        interpret=interpret,
    )(pool)
    # empty slots (meta 0) clamp to lane 0 — their key 0 keeps them out
    # of any top-k that matters, and downstream gathers stay in-bounds
    sel_lanes = jnp.maximum((meta[:batch] & ((1 << fb) - 1)) - 1, 0)
    top_keys, sel = jax.lax.top_k(sel_keys[:batch], k)
    lanes = jnp.take_along_axis(sel_lanes, sel, axis=-1)
    return top_keys, lanes


def packed_certified_parts(
    queries: Array,
    corpus: Array,
    k: int,
    *,
    score_bound: float | Array = 1.0,
    batch_tile: int = DEFAULT_BATCH_TILE,
    corpus_tile: int = DEFAULT_CORPUS_TILE,
    idx_bits: int | None = None,
    merge_levels: int = 0,
    merge_keep: int = 2,
    bias_in_dot: bool = False,
    true_num_items: int | None = None,
    lane_shuffle: int = 0,
    scales: Array | None = None,
    selector: str = "auto",
    track_discards: bool = True,
    interpret: bool = False,
) -> tuple[Array, Array, Array | None]:
    """Packed scan + top-k: (top_keys (B,k) i32, positions (B,k) i32,
    dmax (B,) i32 — None with track_discards=False, for uncertified
    callers that skip the certificate bookkeeping). Keys from passes
    with the same score_bound are directly comparable, so multi-pass
    merges work in key space exactly like `certified_topk_parts`.

    `merge_levels` rounds of `merge_lane_pairs` halve the selection
    width each (top_k over (B, 2*ct >> levels)) at the cost of
    certification rate — levels are auto-clamped so the buffer still
    holds k candidates. `merge_keep=3` keeps the top-3 of each lane
    pair instead (single level only): selection width 1.5ct, but the
    certification rate stays at the unmerged ~96% because only pairs
    holding >= 4 top-k items fail (see `merge_lane_pairs3`).
    `bias_in_dot` needs a corpus with a trailing 1.5 column (see
    `packed_lane_scan`).

    `selector` picks the candidate-pool top-k: "fused" runs the scan,
    merge and threshold-select as ONE kernel (`packed_lane_scan_select`
    — no intermediate HBM pool, selection at the KEY QUANTUM so
    tau-quantum ties may swap vs lax.top_k, within the certificate's
    existing exactness granularity), "threshold" runs the scan then
    `select_topk_keys` as a second kernel (full-width pool in HBM;
    kept for A/B timing), "topk" uses `jax.lax.top_k` over the pool
    (full-key tie order), "auto" = fused whenever the pool is wide
    enough to benefit, else topk.
    """
    if merge_keep not in (2, 3):
        msg = f"merge_keep must be 2 or 3, got {merge_keep}"
        raise ValueError(msg)
    ct = min(corpus_tile, corpus.shape[0])
    num_tiles = corpus.shape[0] // ct
    if idx_bits is None:
        idx_bits = max((num_tiles - 1).bit_length(), 1)
    if merge_keep == 3 and merge_levels:
        # keep-3 buffers don't pair up again — single level only
        merge_levels = 1 if 3 * (ct >> 1) >= k else 0
    while merge_levels and 2 * (ct >> merge_levels) < k:
        merge_levels -= 1
    if selector not in ("auto", "fused", "threshold", "topk"):
        msg = f"unknown {selector=}"
        raise ValueError(msg)
    if not track_discards and selector == "fused":
        # the fused epilogue always tracks discards; route to the
        # two-kernel path where the scan can skip the bookkeeping
        selector = "topk"
    capacity = _round_up(k, 128)
    if merge_levels and merge_keep == 3:
        pool_width = 3 * (ct >> 1)
    else:
        pool_width = 2 * (ct >> merge_levels)
    # "auto" routes to the TWO-kernel threshold path: measured on v5e at
    # the bench geometry (runs/bench_fused_select.py) pass-1 is 15.9 ms
    # vs 17.7 (lax.top_k) and 18.2 (fully-fused epilogue — its VMEM
    # working set degrades the scan loop more than the saved dispatch
    # and pool round-trip buy back)
    if selector == "fused":
        sel_keys, sel_lanes, dmax = packed_lane_scan_select(
            queries,
            corpus,
            k,
            score_bound=score_bound,
            batch_tile=batch_tile,
            corpus_tile=corpus_tile,
            idx_bits=idx_bits,
            merge_levels=merge_levels,
            merge_keep=merge_keep,
            capacity=capacity,
            bias_in_dot=bias_in_dot,
            true_num_items=true_num_items,
            lane_shuffle=lane_shuffle,
            scales=scales,
            interpret=interpret,
        )
        top_keys, sel = jax.lax.top_k(sel_keys, k)
        top_lanes = jnp.take_along_axis(sel_lanes, sel, axis=-1)
        positions = unpack_positions(
            top_keys,
            top_lanes,
            corpus_tile=ct,
            idx_bits=idx_bits,
            lane_shuffle=lane_shuffle,
            reserve_bits=merge_levels,
            merge_levels=merge_levels,
        )
        return top_keys, positions, dmax
    keys, dmax = packed_lane_scan(
        queries,
        corpus,
        score_bound=score_bound,
        batch_tile=batch_tile,
        corpus_tile=corpus_tile,
        idx_bits=idx_bits,
        reserve_bits=merge_levels,
        bias_in_dot=bias_in_dot,
        true_num_items=true_num_items,
        lane_shuffle=lane_shuffle,
        scales=scales,
        track_discards=track_discards,
        interpret=interpret,
    )
    key1, key2 = keys[:, :ct], keys[:, ct:]
    if merge_levels and merge_keep == 3:
        key1, key2, key3, disc = merge_lane_pairs3(key1, key2, 0)
        if dmax is not None:
            dmax = jnp.maximum(dmax, disc)
        pool = jnp.concatenate([key1, key2, key3], axis=-1)
    else:
        for level in range(merge_levels):
            key1, key2, disc = merge_lane_pairs(key1, key2, level)
            if dmax is not None:
                dmax = jnp.maximum(dmax, disc)
        pool = jnp.concatenate([key1, key2], axis=-1)
    use_threshold = selector == "threshold" or (
        selector == "auto" and pool.shape[1] >= 4 * capacity
    )
    if use_threshold:
        top_keys, top_lanes = select_topk_keys(
            pool,
            k,
            capacity=capacity,
            quantum_bits=idx_bits + merge_levels,
            shared_exponent=True,
            interpret=interpret,
        )
    else:
        top_keys, top_lanes = jax.lax.top_k(pool, k)
    positions = unpack_positions(
        top_keys,
        top_lanes,
        corpus_tile=ct,
        idx_bits=idx_bits,
        lane_shuffle=lane_shuffle,
        reserve_bits=merge_levels,
        merge_levels=merge_levels,
    )
    return top_keys, positions, dmax


def decode_scores(
    keys: Array,
    *,
    idx_bits: int,
    score_bound: float | Array = 1.0,
    reserve_bits: int = 0,
) -> Array:
    """Decode packed keys back to (quantized) scores — zero extra device
    passes. The decoded value is the floor of the true score at the key
    quantum (2^(idx_bits+reserve_bits-23) of the scaled [1.25,1.75)
    window, i.e. ~score_bound * 2^(idx_bits+reserve_bits-21)):
    decoded <= true < decoded + quantum.
    """
    keyf = jax.lax.bitcast_convert_type(
        keys & ~((1 << (idx_bits + reserve_bits)) - 1), jnp.float32
    )
    return (keyf - 1.5) * (jnp.asarray(score_bound, jnp.float32) / 0.25)


def exact_scores_at(
    queries: Array, corpus: Array, positions: Array,
    scales: Array | None = None,
) -> Array:
    """Exact f32 scores for selected positions: (B, k) gather + dot."""
    rows = jnp.take(corpus, positions, axis=0)  # (B, k, D)
    scores = jnp.einsum(
        "bd,bkd->bk",
        queries,
        rows.astype(queries.dtype),
        preferred_element_type=jnp.float32,
    )
    if scales is not None:
        scores = scores * jnp.take(
            jnp.asarray(scales, jnp.float32).reshape(-1), positions
        )
    return scores


def packed_certified_topk(
    queries: Array,
    corpus: Array,
    k: int,
    *,
    score_bound: float | Array = 1.0,
    batch_tile: int = DEFAULT_BATCH_TILE,
    corpus_tile: int = DEFAULT_CORPUS_TILE,
    idx_bits: int | None = None,
    merge_levels: int = 0,
    merge_keep: int = 2,
    bias_in_dot: bool = False,
    true_num_items: int | None = None,
    scales: Array | None = None,
    recompute_scores: bool = True,
    selector: str = "auto",
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Packed-key certified top-k: (scores (B,k) f32, positions (B,k)
    i32, exact (B,) bool). `exact` certifies the packed (quantized-score)
    order; see module notes on the precision contract.

    recompute_scores=True gathers corpus rows and recomputes exact f32
    scores for the selected items (a (B, k) gather+dot, ~4.5 ms at
    B=2048, k=100 on v5e); False decodes the quantized scores from the
    keys for free (floor at the key quantum). `merge_levels` /
    `merge_keep` / `bias_in_dot`: see `packed_certified_parts`.
    """
    ct = min(corpus_tile, corpus.shape[0])
    num_tiles = corpus.shape[0] // ct
    if idx_bits is None:
        idx_bits = max((num_tiles - 1).bit_length(), 1)
    if merge_keep == 3 and merge_levels:
        merge_levels = 1 if 3 * (ct >> 1) >= k else 0
    while merge_levels and 2 * (ct >> merge_levels) < k:
        merge_levels -= 1
    top_keys, positions, dmax = packed_certified_parts(
        queries,
        corpus,
        k,
        score_bound=score_bound,
        batch_tile=batch_tile,
        corpus_tile=corpus_tile,
        idx_bits=idx_bits,
        merge_levels=merge_levels,
        merge_keep=merge_keep,
        bias_in_dot=bias_in_dot,
        true_num_items=true_num_items,
        scales=scales,
        selector=selector,
        interpret=interpret,
    )
    tau = top_keys[:, k - 1]
    # padding keys are 0 but merge stamps can raise them to
    # (1 << merge_levels) - 1; any real key is >= bitcast(1.25) >> that
    exact = jnp.logical_and(dmax <= tau, tau > (1 << merge_levels) - 1)
    if recompute_scores:
        if bias_in_dot:
            # drop the 1.5 bias column for the exact-score gather
            scores = exact_scores_at(
                queries, corpus[:, :-1], positions, scales=scales
            )
        else:
            scores = exact_scores_at(
                queries, corpus, positions, scales=scales
            )
    else:
        scores = decode_scores(
            top_keys,
            idx_bits=idx_bits,
            score_bound=score_bound,
            reserve_bits=merge_levels,
        )
    return scores, positions, exact


def packed_topk_excluding(
    queries: Array,
    corpus: Array,
    k: int,
    *,
    exclude_positions: Array | None = None,
    score_bound: float | Array = 1.0,
    true_num_items: int | None = None,
    batch_tile: int = DEFAULT_BATCH_TILE,
    corpus_tile: int = DEFAULT_CORPUS_TILE,
    merge_levels: int = 1,
    merge_keep: int = 2,
    bias_in_dot: bool = False,
    scales: Array | None = None,
    recompute_scores: bool = False,
    selector: str = "topk",
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Packed-key top-k with per-row exclusions (the `search` hot path).

    Same slack strategy as `scan_topk_excluding`: fetch k + E
    candidates from the packed buffer, zero the keys at excluded
    positions, take the final top-k — E exclusions can never push a
    wanted item out of the fetch. Merging auto-disables (merge_levels
    falls back to 0, restoring the full 2ct pool) when k + E exceeds
    the merged pool, so any width the f32 kernel accepts works here
    too. No exactness certificate is returned (parity with the f32
    excluding path), so the merge policy here is a pure recall/speed
    trade with no certification-rate stake — and measured at the
    serving geometry (1M x 64, B=2048, k=100, E=32, v5e) keep-2 +
    lax.top_k selection is strictly better than the certified path's
    keep-3 + threshold defaults: 197k vs 158k QPS for 0.086% recall
    (0.99515 vs 0.99601, runs/sweep_excl_keep.py) — hence the
    different defaults below. Scores are quantum-floor decodes by
    default or exact f32 with recompute_scores=True.
    """
    batch = queries.shape[0]
    batch_tile = min(batch_tile, _round_up(batch, 8))
    pad_rows = -batch % batch_tile
    if pad_rows:
        queries = jnp.pad(queries, ((0, pad_rows), (0, 0)))
        if exclude_positions is not None:
            exclude_positions = jnp.pad(
                exclude_positions, ((0, pad_rows), (0, 0))
            )
    slack = 0 if exclude_positions is None else exclude_positions.shape[1]
    ct = min(corpus_tile, corpus.shape[0])
    if merge_keep == 3 and merge_levels:
        merge_levels = 1 if 3 * (ct >> 1) >= k + slack else 0
    while merge_levels and 2 * (ct >> merge_levels) < k + slack:
        merge_levels -= 1
    pool = (merge_keep if merge_levels else 2) * (ct >> merge_levels)
    if slack and k + slack > pool and corpus.shape[0] > pool:
        msg = (
            f"exclusion width {slack} + {k=} exceeds the packed candidate "
            f"pool ({pool} = unmerged 2 slots x {ct} lanes); "
            "raise corpus_tile or use the dense method"
        )
        raise ValueError(msg)
    fetch = min(k + slack, pool)
    num_tiles = corpus.shape[0] // ct
    idx_bits = max((num_tiles - 1).bit_length(), 1)
    keys, positions, _ = packed_certified_parts(
        queries,
        corpus,
        fetch,
        score_bound=score_bound,
        batch_tile=batch_tile,
        corpus_tile=corpus_tile,
        idx_bits=idx_bits,
        merge_levels=merge_levels,
        merge_keep=merge_keep,
        bias_in_dot=bias_in_dot,
        true_num_items=true_num_items,
        scales=scales,
        selector=selector,
        # no certificate is returned on this path — skip the scan's
        # discard-max bookkeeping (~25% of the contest's VPU work)
        track_discards=False,
        interpret=interpret,
    )
    if exclude_positions is not None:
        hit = jnp.any(
            positions[:, :, None] == exclude_positions[:, None, :],
            axis=-1,
        )
        keys = jnp.where(hit, 0, keys)
    top_keys, sel = jax.lax.top_k(keys, k)
    top_pos = jnp.take_along_axis(positions, sel, axis=-1)
    # masked/exhausted keys are 0; stamped padding keys can reach
    # (1 << merge_levels) - 1 — both are below any real key
    real = top_keys > (1 << merge_levels) - 1
    if recompute_scores:
        c = corpus[:, :-1] if bias_in_dot else corpus
        scores = exact_scores_at(queries, c, top_pos, scales=scales)
        scores = jnp.where(real, scores, NEG_INF)
    else:
        scores = jnp.where(
            real,
            decode_scores(
                top_keys,
                idx_bits=idx_bits,
                score_bound=score_bound,
                reserve_bits=merge_levels,
            ),
            NEG_INF,
        )
    return scores[:batch], top_pos[:batch]


def certified_topk_parts(
    queries: Array,
    corpus: Array,
    k: int,
    *,
    batch_tile: int = DEFAULT_BATCH_TILE,
    corpus_tile: int = DEFAULT_CORPUS_TILE,
    slots: int = 2,
    true_num_items: int | None = None,
    lane_shuffle: int = 0,
    scales: Array | None = None,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Discard-certified scan returning raw parts for multi-pass merges.

    Returns (top_vals (B, k), top_pos (B, k), dmax (B,)) where dmax is
    the max value ever evicted from any lane. Passes with different
    ``lane_shuffle`` values have decorrelated lane collisions; merged
    pools certify via min-over-passes of dmax < merged tau (an element
    >= tau absent from the union must have been evicted in EVERY pass).
    See RetrievalIndex.search_certified for the retry composition.
    """
    vals, pos, dmax = lane_max_scan(
        queries,
        corpus,
        batch_tile=batch_tile,
        corpus_tile=corpus_tile,
        slots=slots,
        track_discards=True,
        true_num_items=true_num_items,
        lane_shuffle=lane_shuffle,
        scales=scales,
        interpret=interpret,
    )
    top_vals, top_lanes = jax.lax.top_k(vals, k)
    top_pos = jnp.take_along_axis(pos, top_lanes, axis=-1)
    return top_vals, top_pos, dmax[:, 0]


def _dedupe_pool_keys(pool_keys: Array, pool_pos: Array) -> Array:
    """Zero all but the best key per position within each row's pool.

    Two passes can return the same position with keys differing only in
    the reserved merge-stamp bits (the stamp depends on the pass's lane
    mapping), so dedupe keys on POSITION and keep the max key. Pools are
    small ((R, 2k)); the (R, 2k, 2k) comparison is negligible next to a
    corpus sweep.
    """
    width = pool_keys.shape[-1]
    pos_eq = pool_pos[:, :, None] == pool_pos[:, None, :]
    key_i = pool_keys[:, :, None]
    key_j = pool_keys[:, None, :]
    idx = jnp.arange(width, dtype=jnp.int32)
    j_beats_i = (key_j > key_i) | (
        (key_j == key_i) & (idx[None, :] < idx[:, None])
    )
    dup = jnp.any(pos_eq & j_beats_i, axis=-1)
    return jnp.where(dup, 0, pool_keys)


def packed_guaranteed_topk(
    queries: Array,
    corpus: Array,
    k: int,
    *,
    score_bound: float | Array = 1.0,
    batch_tile: int = DEFAULT_BATCH_TILE,
    corpus_tile: int = DEFAULT_CORPUS_TILE,
    merge_levels: int = 1,
    merge_keep: int = 3,
    bias_in_dot: bool = False,
    true_num_items: int | None = None,
    scales: Array | None = None,
    retry_width: int | Sequence[int] | None = None,
    retries: int = 2,
    recompute_scores: bool = False,
    selector: str = "auto",
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Guaranteed-exact top-k as ONE jittable device pipeline.

    Composes the certified packed sweep with in-graph retries: pass 1
    scans the full batch; rows whose discard-max certificate fails are
    gathered (static `retry_width` slots, `jnp.nonzero(size=...)`) and
    re-swept with a shuffled position->lane mapping (lane_shuffle
    decorrelates every pass-1 collision); the per-row candidate pools
    merge in key space ON DEVICE (position-deduped, `_dedupe_pool_keys`)
    and certify via min-over-passes of dmax <= merged tau. No host
    round-trip between passes, so the pipeline benches at true device
    throughput and serves without relay-bound host merges
    (RetrievalIndex.search_certified's host escalation remains the
    fallback for the residual).

    Returns (scores, positions, exact). `exact` is the final per-row
    certificate; with the keep-3 merge and 2 retries the expected
    uncertified residual is ~(1 - 0.96)^3 — callers needing a hard
    guarantee re-run `~exact` rows through the dense path (rare enough
    that it never shows in throughput). `retry_width` may be an int
    (every round) or a per-round sequence; the default schedule is
    batch/16 for round 1 and batch/64 after (all >= 64) — sized to the
    measured ~3.6% keep-3 pass-1 failure rate times ~0.036 per
    decorrelated retry, with >6 sigma margin (runs/sweep_retry_width.py:
    this schedule measures certified_frac 1.0000 at 202.5k QPS vs the
    uniform batch/8 schedule's 153.5k at the bench geometry); keep-2
    callers default to batch/4 then batch/16 for their ~13.2% rate. An
    undersized width is a throughput risk, never a correctness one:
    rows beyond a round's slots simply stay uncertified and take the
    caller's dense fallback — the guarantee contract is unchanged.
    """
    # device array up front: the conditional retry rounds gather rows
    # with traced indices, which host numpy arrays cannot do
    queries = jnp.asarray(queries)
    true_batch = queries.shape[0]
    batch_tile = min(batch_tile, _round_up(true_batch, 8))
    pad_rows = -true_batch % batch_tile
    if pad_rows:
        # zero queries tie every item at one key, so padding rows
        # certify trivially and never consume retry slots
        queries = jnp.pad(queries, ((0, pad_rows), (0, 0)))
    batch = queries.shape[0]
    ct = min(corpus_tile, corpus.shape[0])
    num_tiles = corpus.shape[0] // ct
    idx_bits = max((num_tiles - 1).bit_length(), 1)
    if merge_keep == 3 and merge_levels:
        merge_levels = 1 if 3 * (ct >> 1) >= k else 0
    while merge_levels and 2 * (ct >> merge_levels) < k:
        merge_levels -= 1
    min_real = (1 << merge_levels) - 1
    # Per-round retry widths. Pass-1 failures are a small fraction of
    # rows and a decorrelated retry multiplies the residual by roughly
    # that fraction again, so later rounds need far fewer slots than
    # the first. Sizing each round's sweep to its expected failure
    # count (with wide margin) is most of the guaranteed-pipeline
    # speedup: sweep cost is ~linear in rows. Rows beyond a round's
    # width just stay uncertified for that round — the contract is
    # unchanged. The default schedule keys off the merge policy's
    # measured pass-1 failure rate: keep-3 ~3.6% -> batch/16 then
    # batch/64; keep-2 ~13.2% -> batch/4 then batch/16.
    if retry_width is None:
        if merge_levels and merge_keep == 2:
            first, later = batch // 4, batch // 16
        else:
            first, later = batch // 16, batch // 64
        widths = [max(64, first)] + [max(64, later)] * max(retries - 1, 0)
    elif isinstance(retry_width, Sequence):
        widths = [int(w) for w in retry_width]
        if not widths:
            msg = "retry_width sequence must be non-empty"
            raise ValueError(msg)
        if len(widths) < retries:
            widths += [widths[-1]] * (retries - len(widths))
    else:
        widths = [int(retry_width)] * retries
    widths = [_round_up(min(w, batch), 8) for w in widths[:retries]]

    def sweep(q, shuffle):
        return packed_certified_parts(
            q,
            corpus,
            k,
            score_bound=score_bound,
            batch_tile=batch_tile,
            corpus_tile=corpus_tile,
            idx_bits=idx_bits,
            merge_levels=merge_levels,
            merge_keep=merge_keep,
            bias_in_dot=bias_in_dot,
            true_num_items=true_num_items,
            lane_shuffle=shuffle,
            scales=scales,
            selector=selector,
            interpret=interpret,
        )

    keys, positions, dmax = sweep(queries, 0)
    tau = keys[:, k - 1]
    exact = (dmax <= tau) & (tau > min_real)

    def retry_round(state, shuffle, width):
        keys, positions, dmax, exact = state
        bad_idx = jnp.nonzero(~exact, size=width, fill_value=0)[0]
        need = ~exact[bad_idx]
        keys2, pos2, dmax2 = sweep(queries[bad_idx], shuffle)
        pool_keys = jnp.concatenate([keys[bad_idx], keys2], axis=-1)
        pool_pos = jnp.concatenate([positions[bad_idx], pos2], axis=-1)
        pool_keys = _dedupe_pool_keys(pool_keys, pool_pos)
        merged_keys, sel = jax.lax.top_k(pool_keys, k)
        merged_pos = jnp.take_along_axis(pool_pos, sel, axis=-1)
        merged_dmax = jnp.minimum(dmax[bad_idx], dmax2)
        merged_tau = merged_keys[:, k - 1]
        merged_exact = (merged_dmax <= merged_tau) & (
            merged_tau > min_real
        )
        # scatter merged results back only for rows that needed a retry
        # (fill/duplicate indices recompute identical values — benign)
        keys = keys.at[bad_idx].set(
            jnp.where(need[:, None], merged_keys, keys[bad_idx])
        )
        positions = positions.at[bad_idx].set(
            jnp.where(need[:, None], merged_pos, positions[bad_idx])
        )
        dmax = dmax.at[bad_idx].set(
            jnp.where(need, merged_dmax, dmax[bad_idx])
        )
        exact = exact.at[bad_idx].set(
            jnp.where(need, merged_exact, exact[bad_idx])
        )
        return keys, positions, dmax, exact

    state = (keys, positions, dmax, exact)
    for attempt in range(retries):
        shuffle = 2 * attempt + 1  # 1, 3, 5... (see _lane_mapped_scores)
        # device-side skip: once every row certifies, later retry
        # sweeps cost one branch instead of a corpus re-read (at large
        # batch, retries 1-2 ~always fire; a 3rd fires ~P(any residual))
        state = jax.lax.cond(
            jnp.any(~state[3]),
            functools.partial(
                retry_round, shuffle=shuffle, width=widths[attempt]
            ),
            lambda s: s,
            state,
        )
    keys, positions, dmax, exact = state

    if recompute_scores:
        c = corpus[:, :-1] if bias_in_dot else corpus
        scores = exact_scores_at(queries, c, positions, scales=scales)
    else:
        scores = decode_scores(
            keys,
            idx_bits=idx_bits,
            score_bound=score_bound,
            reserve_bits=merge_levels,
        )
    return scores[:true_batch], positions[:true_batch], exact[:true_batch]
