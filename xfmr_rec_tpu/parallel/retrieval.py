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

from xfmr_rec_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

NEG_INF = float("-inf")


def _query_spec(
    mesh: Mesh, batch: int, shard_queries: bool | None
) -> tuple[P, int]:
    """Partition spec for the query batch: sharded over the data axis
    when requested (2-D mesh serving — per-device work B/d x N/m),
    replicated otherwise. `None` = auto: shard whenever the mesh has a
    nontrivial data axis that divides the batch AND this is a
    single-process run — data-sharded outputs of a multi-process mesh
    span non-addressable devices, so hosts that `np.asarray` the result
    would crash; multi-host callers opt in explicitly and gather."""
    data_size = mesh.shape.get(DATA_AXIS, 1)
    if shard_queries is None:
        shard_queries = (
            data_size > 1
            and batch % data_size == 0
            and jax.process_count() == 1
        )
    if not shard_queries:
        return P(), 1
    if batch % data_size:
        msg = (
            f"shard_queries: batch {batch} % mesh '{DATA_AXIS}' "
            f"({data_size}) != 0 — pad the batch or replicate queries"
        )
        raise ValueError(msg)
    return P(DATA_AXIS), data_size


def _validate_shard_geometry(
    corpus_rows: int, num_model: int, k: int
) -> int:
    """Shared guard: corpus divisibility + candidate-pool width.

    Returns local_n. The merged candidate pool is num_model *
    min(k, local_n) wide; a k beyond that (tiny per-shard corpora)
    would crash inside lax.top_k with an opaque shape error."""
    if corpus_rows % num_model:
        msg = f"corpus rows {corpus_rows} % mesh '{MODEL_AXIS}' != 0"
        raise ValueError(msg)
    local_n = corpus_rows // num_model
    if k > num_model * min(k, local_n):
        msg = (
            f"k={k} exceeds the merged candidate pool "
            f"{num_model} shards x min(k, local_n={local_n}) = "
            f"{num_model * min(k, local_n)}; reduce k or use fewer shards"
        )
        raise ValueError(msg)
    return local_n


def _gather_merge(local_vals, local_pos, k, batch):
    """All-gather the (B, local_k) shard candidates over the model axis
    and take the global top-k — the shared merge epilogue."""
    all_vals = jax.lax.all_gather(local_vals, MODEL_AXIS)
    all_pos = jax.lax.all_gather(local_pos, MODEL_AXIS)
    all_vals = all_vals.transpose(1, 0, 2).reshape(batch, -1)
    all_pos = all_pos.transpose(1, 0, 2).reshape(batch, -1)
    top_vals, merge_arg = jax.lax.top_k(all_vals, k)
    top_pos = jnp.take_along_axis(all_pos, merge_arg, axis=-1)
    return top_vals, top_pos


def sharded_topk(
    queries: Array,
    corpus: Array,
    k: int,
    mesh: Mesh,
    *,
    exclude_positions: Array | None = None,
    true_num_items: int | None = None,
    scales: Array | None = None,
    shard_queries: bool | None = None,
) -> tuple[Array, Array]:
    """Exact top-k over an item-sharded corpus.

    Args:
        queries: (B, D), replicated (or data-axis sharded, see below).
        corpus: (N, D), sharded P("model", None) (or host array to place).
        k: static top-k.
        exclude_positions: (B, E) global corpus positions to mask
            (padded with >= N), sharded like the queries.
        true_num_items: logical corpus size when trailing rows are
            shard-balancing padding (N not divisible by the mesh axis);
            pad rows are masked to -inf in-graph, so the result is exact
            over the first `true_num_items` rows.
        scales: (1, N) per-item dequantization scales for an int8
            corpus (sharded along items like the corpus).
        shard_queries: shard the batch over the mesh's data axis too
            (2-D mesh serving: per-device work (B/d, N/m), candidate
            merges ride the model axis only). None = auto when the data
            axis is nontrivial and divides B.

    Returns:
        (scores (B, k), positions (B, k)) — global positions, replicated
        (data-axis sharded when shard_queries).
    """
    num_model = mesh.shape[MODEL_AXIS]
    local_n = _validate_shard_geometry(corpus.shape[0], num_model, k)
    local_k = min(k, local_n)
    if true_num_items is not None and true_num_items >= corpus.shape[0]:
        true_num_items = None
    qspec, _ = _query_spec(mesh, queries.shape[0], shard_queries)
    has_scales = scales is not None
    if not has_scales:
        scales = jnp.zeros((1, num_model), dtype=jnp.float32)

    has_exclusions = exclude_positions is not None
    if not has_exclusions:
        exclude_positions = jnp.zeros((queries.shape[0], 1), dtype=jnp.int32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(qspec, P(MODEL_AXIS, None), qspec, P(None, MODEL_AXIS)),
        out_specs=(qspec, qspec),
        check_vma=False,
    )
    def inner(q, corpus_local, excl, scales_local):
        batch = q.shape[0]
        offset = jax.lax.axis_index(MODEL_AXIS) * local_n
        if has_scales:
            # int8 shard: dequantizing dense scoring (mirrors the
            # single-chip dense_exact int8 branch, mips.py)
            scores = jnp.dot(
                q,
                corpus_local.T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * scales_local[0][None, :]
        else:
            scores = jnp.dot(
                q, corpus_local.T, preferred_element_type=jnp.float32
            )
        positions = offset + jnp.arange(local_n, dtype=jnp.int32)[None, :]
        positions = jnp.broadcast_to(positions, scores.shape)
        if true_num_items is not None:
            scores = jnp.where(positions < true_num_items, scores, NEG_INF)
        if has_exclusions:
            hit = jnp.any(
                positions[:, :, None] == excl[:, None, :], axis=-1
            )
            scores = jnp.where(hit, NEG_INF, scores)
        local_scores, local_arg = jax.lax.top_k(scores, local_k)
        local_pos = jnp.take_along_axis(positions, local_arg, axis=-1)
        # (m, B, local_k) candidates -> merged (B, k)
        return _gather_merge(local_scores, local_pos, k, batch)

    return inner(queries, corpus, exclude_positions, scales)


def sharded_certified_topk(
    queries: Array,
    corpus: Array,
    k: int,
    mesh: Mesh,
    *,
    batch_tile: int | None = None,
    corpus_tile: int | None = None,
    true_num_items: int | None = None,
    shard_queries: bool | None = None,
    interpret: bool | None = None,
) -> tuple[Array, Array, Array]:
    """Exact-certified top-k over an item-sharded corpus (Pallas per shard).

    Each device runs the fused scan kernel (ops/topk_pallas.py,
    2 slots + discard-max) on its local corpus tile, takes a local
    top-k, and the (m, B, k) candidate sets merge after an all-gather
    over ICI. The exactness certificate composes across shards: a
    row's result is provably the exact top-k (by score multiset) iff
    pmax over devices of the per-shard discard-max is < tau, the k-th
    merged value. Proof sketch: an element >= tau on shard d is either
    still in d's lane buffers — and then either inside d's local top-k
    (so in the merged pool) or beaten by k local values >= it, which
    themselves enter the pool and push tau up to its value — or it was
    evicted, which the shard's discard-max records.

    Returns (scores (B, k), positions (B, k), exact (B,) bool),
    replicated.

    `true_num_items`: logical corpus size when trailing rows are
    shard-balancing zero padding. Pad candidates are masked out of the
    merged pool, so certified results are exact over the real rows; a
    pad row's score (exactly 0 for zero vectors) can still enter a
    shard's discard-max, which only makes the certificate conservative
    (rows may fail certification that would otherwise pass — never the
    reverse) and only when the true k-th score is below 0.
    """
    from xfmr_rec_tpu.ops import topk_pallas as tk

    num_model = mesh.shape[MODEL_AXIS]
    local_n = _validate_shard_geometry(corpus.shape[0], num_model, k)
    batch = queries.shape[0]
    qspec, data_size = _query_spec(mesh, batch, shard_queries)
    bt = batch_tile or min(tk.DEFAULT_BATCH_TILE, batch // data_size)
    ct = corpus_tile or tk.pick_corpus_tile(local_n, corpus.shape[1])
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    local_k = min(k, local_n)
    if true_num_items is not None and true_num_items >= corpus.shape[0]:
        true_num_items = None

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(qspec, P(MODEL_AXIS, None)),
        out_specs=(qspec, qspec, qspec),
        check_vma=False,
    )
    def inner(q, corpus_local):
        pad = -local_n % ct
        corpus_padded = (
            jnp.pad(corpus_local, ((0, pad), (0, 0))) if pad else corpus_local
        )
        vals, pos, dmax = tk.lane_max_scan(
            q,
            corpus_padded,
            batch_tile=bt,
            corpus_tile=ct,
            slots=2,
            track_discards=True,
            true_num_items=local_n if pad else None,
            interpret=interpret,
        )
        local_scores, local_arg = jax.lax.top_k(vals, local_k)
        offset = jax.lax.axis_index(MODEL_AXIS) * local_n
        local_pos = offset + jnp.take_along_axis(pos, local_arg, axis=-1)
        if true_num_items is not None:
            local_scores = jnp.where(
                local_pos < true_num_items, local_scores, NEG_INF
            )
        top_scores, top_pos = _gather_merge(
            local_scores, local_pos, k, q.shape[0]
        )
        tau = top_scores[:, k - 1]
        global_dmax = jax.lax.pmax(dmax[:, 0], MODEL_AXIS)
        # <=: score-multiset exactness, same convention as the
        # single-chip certificate (ops/topk_pallas.py certified_topk)
        return top_scores, top_pos, global_dmax <= tau

    return inner(queries, corpus)


def sharded_packed_certified_topk(
    queries: Array,
    corpus: Array,
    k: int,
    mesh: Mesh,
    *,
    score_bound: float | Array = 1.0,
    batch_tile: int | None = None,
    corpus_tile: int | None = None,
    merge_levels: int = 0,
    true_num_items: int | None = None,
    scales: Array | None = None,
    shard_queries: bool | None = None,
    interpret: bool | None = None,
) -> tuple[Array, Array, Array]:
    """Packed-key certified top-k over an item-sharded corpus.

    The multi-chip composition of the packed-key scan
    (ops/topk_pallas.py packed_lane_scan, ~40% faster than the f32
    certified scan on one chip): each device sweeps its local corpus
    shard producing int32 keys (quantized score in the high bits), takes
    a local top-k IN KEY SPACE, and the (m, B, k) key/position candidate
    sets merge after an all-gather over ICI. Keys are comparable across
    shards because every shard packs with the same `score_bound` and the
    same local tile geometry; the certificate composes exactly as in
    `sharded_certified_topk`, with pmax over per-shard discard-max keys
    against the merged k-th key. Exactness is w.r.t. the packed
    (quantized-score) order — ties within one key quantum may swap, as
    on one chip.

    `score_bound` must upper-bound |score| globally (1.0 for unit-norm
    embeddings). Returns (scores (B, k) f32 decoded at the key quantum,
    positions (B, k) global int32, exact (B,) bool), replicated.

    `true_num_items`: logical corpus size when trailing rows are
    shard-balancing zero padding; pad candidates are masked to key 0
    before the merge (exact results over the real rows), and a pad
    row's discarded key can only make the certificate conservative
    (see `sharded_certified_topk`).
    """
    from xfmr_rec_tpu.ops import topk_pallas as tk

    num_model = mesh.shape[MODEL_AXIS]
    local_n = _validate_shard_geometry(corpus.shape[0], num_model, k)
    batch = queries.shape[0]
    qspec, data_size = _query_spec(mesh, batch, shard_queries)
    bt = batch_tile or min(tk.DEFAULT_BATCH_TILE, batch // data_size)
    ct = corpus_tile or tk.pick_corpus_tile(local_n, corpus.shape[1])
    # lane-pair merges split the tile in half: keep ct a multiple
    # of 8 (pad rows inside the shard cover the remainder)
    ct = max(8, (min(ct, local_n) // 8) * 8)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    local_k = min(k, local_n)
    if true_num_items is not None and true_num_items >= corpus.shape[0]:
        true_num_items = None
    padded_local = local_n + (-local_n % ct)
    num_tiles = padded_local // ct
    idx_bits = max((num_tiles - 1).bit_length(), 1)
    while merge_levels and 2 * (ct >> merge_levels) < local_k:
        merge_levels -= 1
    has_scales = scales is not None
    if not has_scales:
        scales = jnp.zeros((1, num_model), dtype=jnp.float32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(qspec, P(MODEL_AXIS, None), P(None, MODEL_AXIS)),
        out_specs=(qspec, qspec, qspec),
        check_vma=False,
    )
    def inner(q, corpus_local, scales_local):
        pad = -local_n % ct
        corpus_padded = (
            jnp.pad(corpus_local, ((0, pad), (0, 0))) if pad else corpus_local
        )
        scales_padded = None
        if has_scales:
            scales_padded = (
                jnp.pad(scales_local, ((0, 0), (0, pad)))
                if pad
                else scales_local
            )
        local_keys, local_pos, dmax = tk.packed_certified_parts(
            q,
            corpus_padded,
            local_k,
            score_bound=score_bound,
            batch_tile=bt,
            corpus_tile=ct,
            idx_bits=idx_bits,
            merge_levels=merge_levels,
            true_num_items=local_n if pad else None,
            scales=scales_padded,
            interpret=interpret,
        )
        offset = jax.lax.axis_index(MODEL_AXIS) * local_n
        local_pos = offset + local_pos
        if true_num_items is not None:
            local_keys = jnp.where(local_pos < true_num_items, local_keys, 0)
        top_keys, top_pos = _gather_merge(
            local_keys, local_pos, k, q.shape[0]
        )
        tau = top_keys[:, k - 1]
        global_dmax = jax.lax.pmax(dmax, MODEL_AXIS)
        exact = jnp.logical_and(
            global_dmax <= tau, tau > (1 << merge_levels) - 1
        )
        scores = tk.decode_scores(
            top_keys,
            idx_bits=idx_bits,
            score_bound=score_bound,
            reserve_bits=merge_levels,
        )
        return scores, top_pos, exact

    return inner(queries, corpus, scales)


def sharded_packed_guaranteed_topk(
    queries: Array,
    corpus: Array,
    k: int,
    mesh: Mesh,
    *,
    score_bound: float | Array = 1.0,
    true_num_items: int | None = None,
    batch_tile: int | None = None,
    corpus_tile: int | None = None,
    merge_levels: int = 1,
    merge_keep: int = 3,
    retry_width: int | list[int] | tuple[int, ...] | None = None,
    retries: int = 2,
    scales: Array | None = None,
    shard_queries: bool | None = None,
    interpret: bool | None = None,
) -> tuple[Array, Array, Array]:
    """Guaranteed-exact top-k over an item-sharded corpus as ONE dispatch.

    The multi-chip composition of `packed_guaranteed_topk`
    (ops/topk_pallas.py — the benched single-chip guaranteed pipeline):
    pass 1 sweeps every shard with the keep-3 packed scan and merges
    candidates in key space over ICI; rows whose COMPOSED certificate
    (pmax of per-shard discard-max keys vs the merged tau) fails are
    gathered in-graph and re-swept with a shuffled lane mapping on
    every shard, pools merge position-deduped, and the certificate
    min-composes across passes: an element above the final tau must
    have been evicted in EVERY pass on SOME shard, so
    min_over_passes(pmax_over_shards(dmax_p)) <= tau certifies the
    union's top-k. All retry rounds are `lax.cond`-skipped on device
    once every row certifies — no host round-trip anywhere.

    Returns (scores (B, k) quantum-floor decodes, positions (B, k)
    global int32, exact (B,) bool). Callers needing the hard guarantee
    re-run `~exact` rows on `sharded_topk` (dense, exact by
    construction); the expected residual matches the single-chip
    pipeline's (~(1 - 0.96)^(1+retries) per row with keep-3).
    """
    from xfmr_rec_tpu.ops import topk_pallas as tk

    num_model = mesh.shape[MODEL_AXIS]
    local_n = _validate_shard_geometry(corpus.shape[0], num_model, k)
    batch = queries.shape[0]
    qspec, data_size = _query_spec(mesh, batch, shard_queries)
    local_batch = batch // data_size
    bt = batch_tile or min(tk.DEFAULT_BATCH_TILE, local_batch)
    ct = corpus_tile or tk.pick_corpus_tile(local_n, corpus.shape[1])
    # lane-pair merges split the tile in half: keep ct a multiple
    # of 8 (pad rows inside the shard cover the remainder)
    ct = max(8, (min(ct, local_n) // 8) * 8)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    local_k = min(k, local_n)
    if true_num_items is not None and true_num_items >= corpus.shape[0]:
        true_num_items = None
    padded_local = local_n + (-local_n % ct)
    num_tiles = padded_local // ct
    idx_bits = max((num_tiles - 1).bit_length(), 1)
    if merge_keep == 3 and merge_levels:
        merge_levels = 1 if 3 * (ct >> 1) >= local_k else 0
    while merge_levels and 2 * (ct >> merge_levels) < local_k:
        merge_levels -= 1
    min_real = (1 << merge_levels) - 1
    # per-round retry widths, sized to the measured failure decay like
    # the single-chip pipeline (keep-3 ~3.6% pass-1 failures -> b/16
    # then b/64; keep-2 ~13.2% -> b/4 then b/16); relative to the
    # PER-DEVICE batch when queries shard over the data axis
    if retry_width is None:
        if merge_levels and merge_keep == 2:
            first, later = local_batch // 4, local_batch // 16
        else:
            first, later = local_batch // 16, local_batch // 64
        widths = [max(64, first)] + [max(64, later)] * max(retries - 1, 0)
    elif isinstance(retry_width, (list, tuple)):
        widths = [int(w) for w in retry_width]
        if not widths:
            msg = "retry_width sequence must be non-empty"
            raise ValueError(msg)
        if len(widths) < retries:
            widths += [widths[-1]] * (retries - len(widths))
    else:
        widths = [int(retry_width)] * retries
    # retry sweeps tile at min(bt, width): round each width to a clean
    # tiling (multiple of 8 below bt, multiple of bt above)
    adjusted = []
    for w in widths[:retries]:
        w = min(w + (-w % 8), local_batch)
        if w > bt:
            w = min(w + (-w % bt), local_batch)
        adjusted.append(w or local_batch)
    widths = adjusted
    has_scales = scales is not None
    if not has_scales:
        scales = jnp.zeros((1, num_model), dtype=jnp.float32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(qspec, P(MODEL_AXIS, None), P(None, MODEL_AXIS)),
        out_specs=(qspec, qspec, qspec),
        check_vma=False,
    )
    def inner(q, corpus_local, scales_local):
        b = q.shape[0]
        pad = -local_n % ct
        corpus_padded = (
            jnp.pad(corpus_local, ((0, pad), (0, 0))) if pad else corpus_local
        )
        scales_padded = None
        if has_scales:
            scales_padded = (
                jnp.pad(scales_local, ((0, 0), (0, pad)))
                if pad
                else scales_local
            )
        offset = jax.lax.axis_index(MODEL_AXIS) * local_n

        def local_sweep(qrows, shuffle, tile):
            keys, pos, dmax = tk.packed_certified_parts(
                qrows,
                corpus_padded,
                local_k,
                score_bound=score_bound,
                batch_tile=tile,
                corpus_tile=ct,
                idx_bits=idx_bits,
                merge_levels=merge_levels,
                merge_keep=merge_keep,
                true_num_items=local_n if pad else None,
                lane_shuffle=shuffle,
                scales=scales_padded,
                interpret=interpret,
            )
            pos = offset + pos
            if true_num_items is not None:
                keys = jnp.where(pos < true_num_items, keys, 0)
            return keys, pos, dmax

        def gather_pool(keys, pos):
            """(rows, local_k) per shard -> (rows, m*local_k) global."""
            ak = jax.lax.all_gather(keys, MODEL_AXIS)
            ap = jax.lax.all_gather(pos, MODEL_AXIS)
            rows = keys.shape[0]
            return (
                ak.transpose(1, 0, 2).reshape(rows, -1),
                ap.transpose(1, 0, 2).reshape(rows, -1),
            )

        lk, lp, ld = local_sweep(q, 0, bt)
        pool_k, pool_p = gather_pool(lk, lp)
        keys, sel = jax.lax.top_k(pool_k, k)
        positions = jnp.take_along_axis(pool_p, sel, axis=-1)
        gdmax = jax.lax.pmax(ld, MODEL_AXIS)
        tau = keys[:, k - 1]
        exact = (gdmax <= tau) & (tau > min_real)

        def retry_round(state, shuffle, width):
            keys, positions, gdmax, exact = state
            bad_idx = jnp.nonzero(~exact, size=width, fill_value=0)[0]
            need = ~exact[bad_idx]
            lk2, lp2, ld2 = local_sweep(
                q[bad_idx], shuffle, min(bt, width)
            )
            new_k, new_p = gather_pool(lk2, lp2)
            gd2 = jax.lax.pmax(ld2, MODEL_AXIS)
            pool_keys = jnp.concatenate([keys[bad_idx], new_k], axis=-1)
            pool_pos = jnp.concatenate([positions[bad_idx], new_p], axis=-1)
            pool_keys = tk._dedupe_pool_keys(pool_keys, pool_pos)
            merged_keys, msel = jax.lax.top_k(pool_keys, k)
            merged_pos = jnp.take_along_axis(pool_pos, msel, axis=-1)
            merged_dmax = jnp.minimum(gdmax[bad_idx], gd2)
            merged_tau = merged_keys[:, k - 1]
            merged_exact = (merged_dmax <= merged_tau) & (
                merged_tau > min_real
            )
            keys = keys.at[bad_idx].set(
                jnp.where(need[:, None], merged_keys, keys[bad_idx])
            )
            positions = positions.at[bad_idx].set(
                jnp.where(need[:, None], merged_pos, positions[bad_idx])
            )
            gdmax = gdmax.at[bad_idx].set(
                jnp.where(need, merged_dmax, gdmax[bad_idx])
            )
            exact = exact.at[bad_idx].set(
                jnp.where(need, merged_exact, exact[bad_idx])
            )
            return keys, positions, gdmax, exact

        state = (keys, positions, gdmax, exact)
        for attempt in range(retries):
            shuffle = 2 * attempt + 1
            state = jax.lax.cond(
                jnp.any(~state[3]),
                functools.partial(
                    retry_round, shuffle=shuffle, width=widths[attempt]
                ),
                lambda s: s,
                state,
            )
        keys, positions, gdmax, exact = state
        scores = tk.decode_scores(
            keys,
            idx_bits=idx_bits,
            score_bound=score_bound,
            reserve_bits=merge_levels,
        )
        return scores, positions, exact

    return inner(queries, corpus, scales)


def sharded_packed_topk_excluding(
    queries: Array,
    corpus: Array,
    k: int,
    mesh: Mesh,
    *,
    exclude_positions: Array | None = None,
    score_bound: float | Array = 1.0,
    true_num_items: int | None = None,
    batch_tile: int | None = None,
    corpus_tile: int | None = None,
    merge_levels: int = 1,
    merge_keep: int = 2,
    selector: str = "topk",
    scales: Array | None = None,
    shard_queries: bool | None = None,
    interpret: bool | None = None,
) -> tuple[Array, Array]:
    """Packed-key top-k with per-row exclusions over an item-sharded corpus.

    The multi-chip serving hot path (exclusion search over ICI): each
    device sweeps its local corpus shard with the packed-key Pallas scan
    (no certificate bookkeeping — same contract as the single-chip
    `packed_topk_excluding`), fetches its local top-(k+E) candidates in
    key space, and the (m, B, k+E) candidate sets all-gather over the
    model axis. Exclusions are masked AFTER the merge by global
    position: within one shard at most E excluded items can outrank a
    wanted candidate, so fetching k+E per shard guarantees the global
    top-k survivors are all present in the merged pool (same slack
    argument as the single-chip path, applied per shard).

    Args mirror `sharded_packed_certified_topk`; `exclude_positions` is
    (B, E) GLOBAL corpus positions (padded with >= N), replicated.
    Returns (scores (B, k) f32 quantum-floor decodes, positions (B, k)
    global int32), replicated; masked/exhausted entries score -inf.
    """
    from xfmr_rec_tpu.ops import topk_pallas as tk

    num_model = mesh.shape[MODEL_AXIS]
    local_n = _validate_shard_geometry(corpus.shape[0], num_model, k)
    batch = queries.shape[0]
    qspec, data_size = _query_spec(mesh, batch, shard_queries)
    bt = batch_tile or min(tk.DEFAULT_BATCH_TILE, batch // data_size)
    ct = corpus_tile or tk.pick_corpus_tile(local_n, corpus.shape[1])
    # lane-pair merges split the tile in half: keep ct a multiple
    # of 8 (pad rows inside the shard cover the remainder)
    ct = max(8, (min(ct, local_n) // 8) * 8)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if true_num_items is not None and true_num_items >= corpus.shape[0]:
        true_num_items = None
    slack = 0 if exclude_positions is None else exclude_positions.shape[1]
    padded_local = local_n + (-local_n % ct)
    num_tiles = padded_local // ct
    idx_bits = max((num_tiles - 1).bit_length(), 1)
    # clamp the merge so the per-shard pool still holds k+E candidates
    # (same policy as the single-chip packed_topk_excluding)
    fetch_target = min(k + slack, local_n)
    if merge_keep == 3 and merge_levels:
        merge_levels = 1 if 3 * (ct >> 1) >= fetch_target else 0
    while merge_levels and 2 * (ct >> merge_levels) < fetch_target:
        merge_levels -= 1
    if merge_levels and merge_keep == 3:
        pool = 3 * (ct >> 1)
    else:
        pool = 2 * (ct >> merge_levels)
    if fetch_target > pool and padded_local > pool:
        msg = (
            f"exclusion width {slack} + {k=} exceeds the per-shard packed "
            f"candidate pool ({pool}); raise corpus_tile or use "
            "sharded_topk (dense)"
        )
        raise ValueError(msg)
    fetch = min(fetch_target, pool)

    has_exclusions = exclude_positions is not None
    if not has_exclusions:
        exclude_positions = jnp.zeros((batch, 1), dtype=jnp.int32)
    has_scales = scales is not None
    if not has_scales:
        scales = jnp.zeros((1, num_model), dtype=jnp.float32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(qspec, P(MODEL_AXIS, None), qspec, P(None, MODEL_AXIS)),
        out_specs=(qspec, qspec),
        check_vma=False,
    )
    def inner(q, corpus_local, excl, scales_local):
        pad = -local_n % ct
        corpus_padded = (
            jnp.pad(corpus_local, ((0, pad), (0, 0))) if pad else corpus_local
        )
        scales_padded = None
        if has_scales:
            scales_padded = (
                jnp.pad(scales_local, ((0, 0), (0, pad)))
                if pad
                else scales_local
            )
        local_keys, local_pos, _ = tk.packed_certified_parts(
            q,
            corpus_padded,
            fetch,
            score_bound=score_bound,
            batch_tile=bt,
            corpus_tile=ct,
            idx_bits=idx_bits,
            merge_levels=merge_levels,
            merge_keep=merge_keep,
            # lax.top_k selection by default — measured best for the
            # no-certificate exclusion contract (BENCH_NOTES exclusion
            # table), same default as packed_topk_excluding
            selector=selector,
            true_num_items=local_n if pad else None,
            scales=scales_padded,
            track_discards=False,
            interpret=interpret,
        )
        offset = jax.lax.axis_index(MODEL_AXIS) * local_n
        local_pos = offset + local_pos
        if true_num_items is not None:
            local_keys = jnp.where(local_pos < true_num_items, local_keys, 0)
        # full merged pool (B, m*fetch) — exclusions mask BEFORE the
        # final top-k, so _gather_merge's early cut can't apply here
        all_keys = jax.lax.all_gather(local_keys, MODEL_AXIS)
        all_pos = jax.lax.all_gather(local_pos, MODEL_AXIS)
        all_keys = all_keys.transpose(1, 0, 2).reshape(q.shape[0], -1)
        all_pos = all_pos.transpose(1, 0, 2).reshape(q.shape[0], -1)
        if has_exclusions:
            hit = jnp.any(
                all_pos[:, :, None] == excl[:, None, :], axis=-1
            )
            all_keys = jnp.where(hit, 0, all_keys)
        top_keys, sel = jax.lax.top_k(all_keys, k)
        top_pos = jnp.take_along_axis(all_pos, sel, axis=-1)
        # masked/exhausted keys are 0; stamped padding keys can reach
        # (1 << merge_levels) - 1 — both below any real key
        real = top_keys > (1 << merge_levels) - 1
        scores = jnp.where(
            real,
            tk.decode_scores(
                top_keys,
                idx_bits=idx_bits,
                score_bound=score_bound,
                reserve_bits=merge_levels,
            ),
            NEG_INF,
        )
        return scores, top_pos

    return inner(queries, corpus, exclude_positions, scales)
