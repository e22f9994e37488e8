"""IVF-partitioned MIPS for latency-optimized small-batch queries.

Capability parity with the reference's LanceDB IVF index surface
(/root/reference/xfmr_rec/data/lightning.py:202-254: nlist ~= 4*sqrt(n),
`nprobes`, `refine_factor`), redesigned TPU-first:

- Clustering runs as jitted Lloyd iterations ON DEVICE: assignment is a
  lax.scan over corpus tiles (tile-local (T, K) score matrix on the
  MXU, argmax per row), the centroid update is a one-hot matmul
  (segment-sum as MXU work, not scatter).
- The inverted lists are a CLUSTER-MAJOR DENSE layout: items sorted by
  cluster into a (K, bucket, D) array zero-padded per cluster, plus a
  parallel (K, bucket) position map. No ragged lists, no pointer
  chasing — a probe is one gather of `nprobe` buckets followed by one
  einsum, both static-shape.
- In-bucket scores are EXACT dot products (the corpus is not
  product-quantized), so the reference's `refine_factor` re-ranking
  stage is unnecessary — `nprobe` is the single recall knob. Recall
  loss comes only from the true neighbor living in an unprobed
  cluster.

When to use which index: the exhaustive packed scan (mips.py) wins for
large query batches (reads the corpus once per ~512 queries, 277k QPS
at 1M x 64); the IVF probe wins for latency-bound single/small-batch
serving (touches nprobe/K of the corpus: ~1 MB instead of 128 MB per
query at the defaults).
"""

from __future__ import annotations

import functools
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

NEG_INF = float("-inf")
# RELATIVE certificate slack coefficient for bf16-stored buckets: the
# probe scores fl(cast_bf16(q) . x_served) with f32 accumulation, so
# the computed score can sit up to ~||q||*||x||*2^-9 from the exact f32
# dot against the served vectors (bf16 elementwise cast is a <=2^-9
# relative perturbation of q). The certificate therefore uses
#   slack = CERT_SLACK * ||q|| * max_row_norm
# per query (4x margin; max_row_norm is measured over the served
# vectors at build time) — an ABSOLUTE 2^-7 would be sound only for
# ~unit-norm data, while the engine's ivf_certified path runs on
# bias/CF-extended corpora where ||q||*||x|| can exceed 2-4 (round-4
# advisor medium finding). The f32-bucket path is tighter; the same
# coefficient stays sound.
CERT_SLACK = 2.0**-7


def kmeans(
    corpus: Array,
    num_clusters: int,
    *,
    iters: int = 10,
    seed: int = 0,
    tile: int = 4096,
) -> tuple[Array, Array]:
    """Device Lloyd iterations -> (centroids (K, D) f32, assign (N,) i32).

    Cosine/MIPS clustering for unit-norm corpora: assignment by max dot
    product, centroids re-normalized each round (spherical k-means).
    All `iters` rounds run in ONE jitted dispatch (a lax.scan over
    iterations of a lax.scan over corpus tiles); the corpus is a jit
    ARGUMENT, never a closure constant (a captured corpus is baked into
    the executable and, on remote-compile setups, shipped with every
    compile request). Memory is bounded at (tile, K) per scan step.
    """
    num_items, dim = corpus.shape
    rng = np.random.default_rng(seed)
    init = rng.choice(num_items, size=num_clusters, replace=False)
    corpus_f = jnp.asarray(corpus, jnp.float32)
    centroids0 = corpus_f[jnp.asarray(init)]
    pad = -num_items % tile
    if pad:
        corpus_f = jnp.pad(corpus_f, ((0, pad), (0, 0)))
    tiles = corpus_f.reshape(-1, tile, dim)

    @functools.partial(jax.jit, static_argnames=("n_iters",))
    def run(tiles, centroids, n_iters):
        def assign_pass(centroids):
            def body(carry, ctile):
                sums, counts = carry
                scores = jnp.dot(
                    ctile, centroids.T, preferred_element_type=jnp.float32
                )
                assign = jnp.argmax(scores, axis=-1)
                onehot = jax.nn.one_hot(
                    assign, num_clusters, dtype=jnp.float32
                )
                # zero-padding rows assign arbitrarily but have zero
                # embeddings: they move counts, not directions — masked
                valid = (
                    jnp.abs(ctile).sum(axis=-1) > 0
                ).astype(jnp.float32)
                onehot = onehot * valid[:, None]
                sums = sums + jnp.dot(
                    onehot.T, ctile, preferred_element_type=jnp.float32
                )
                counts = counts + onehot.sum(axis=0)
                return (sums, counts), assign

            (sums, counts), assigns = jax.lax.scan(
                body,
                (
                    jnp.zeros((num_clusters, dim), jnp.float32),
                    jnp.zeros((num_clusters,), jnp.float32),
                ),
                tiles,
            )
            # empty clusters keep their previous centroid
            new = jnp.where(
                counts[:, None] > 0,
                sums / jnp.maximum(counts[:, None], 1.0),
                centroids,
            )
            norm = jnp.linalg.norm(new, axis=-1, keepdims=True)
            return new / jnp.maximum(norm, 1e-12), assigns.reshape(-1)

        def one_iter(centroids, _):
            new, _ = assign_pass(centroids)
            return new, None

        centroids, _ = jax.lax.scan(
            one_iter, centroids, None, length=n_iters
        )
        # final assignments consistent with the FINAL centroids
        _, assigns = assign_pass(centroids)
        return centroids, assigns

    centroids, assigns = run(tiles, centroids0, iters)
    return centroids, assigns[:num_items]


def assign_with_spill(
    corpus: Array,
    centroids: Array,
    cap: int,
    *,
    prefs: int = 8,
    tile: int = 4096,
) -> np.ndarray:
    """Capacity-capped assignment: each item goes to its nearest centroid
    with room, trying its top-`prefs` centroids in order (classic IVF
    balancing). Skewed clusters otherwise set the dense bucket width for
    the WHOLE layout (one hot cluster of 50k items = 50k-wide padded
    buckets everywhere), which bloats probe gathers; spilled items land
    in a near-by list, where a multi-cluster probe still finds them.

    Returns the (N,) int32 placement. Items whose `prefs` preferred
    clusters are all full stay with their fullest-preferred cluster
    (soft overflow — the final bucket width absorbs it).
    """
    num_items, dim = corpus.shape
    num_clusters = centroids.shape[0]
    prefs = min(prefs, num_clusters)
    pad = -num_items % tile
    corpus_f = jnp.asarray(corpus, jnp.float32)
    if pad:
        corpus_f = jnp.pad(corpus_f, ((0, pad), (0, 0)))
    tiles = corpus_f.reshape(-1, tile, dim)

    @functools.partial(jax.jit, static_argnames=("k",))
    def topk_centroids(tiles, centroids, k):
        def body(_, ctile):
            scores = jnp.dot(
                ctile, centroids.T, preferred_element_type=jnp.float32
            )
            _, ids = jax.lax.top_k(scores, k)
            return None, ids

        _, ids = jax.lax.scan(body, None, tiles)
        return ids.reshape(-1, k)

    pref_ids = np.asarray(topk_centroids(tiles, centroids, prefs))[
        :num_items
    ]
    # round-based vectorized greedy: at round r every still-unplaced item
    # bids for its r-th preference; each cluster admits up to its
    # remaining capacity in item order (no python-per-item loop — the
    # sequential version took minutes at 1M items)
    placement = np.full(num_items, -1, dtype=np.int32)
    counts = np.zeros(num_clusters, dtype=np.int64)
    for r in range(prefs):
        unplaced = np.flatnonzero(placement < 0)
        if unplaced.size == 0:
            break
        cand = pref_ids[unplaced, r]
        order = np.argsort(cand, kind="stable")
        sorted_c = cand[order]
        # rank of each bid within its cluster group
        first = np.r_[True, sorted_c[1:] != sorted_c[:-1]]
        group_start = np.maximum.accumulate(
            np.where(first, np.arange(sorted_c.size), 0)
        )
        rank = np.arange(sorted_c.size) - group_start
        fits = rank < (cap - counts[sorted_c])
        rows = unplaced[order[fits]]
        placement[rows] = sorted_c[fits]
        counts += np.bincount(
            sorted_c[fits], minlength=num_clusters
        )
    leftovers = placement < 0
    if leftovers.any():
        # every preferred cluster full: soft overflow into the first
        # choice (the final bucket width absorbs it)
        placement[leftovers] = pref_ids[leftovers, 0]
    return placement


class IVFIndex:
    """Probe-based MIPS over a cluster-major bucket layout."""

    def __init__(
        self,
        embeddings: np.ndarray,
        ids: np.ndarray,
        *,
        num_clusters: int | None = None,
        nprobe: int = 8,
        kmeans_iters: int = 10,
        spill_factor: float | None = 4.0,
        seed: int = 0,
        dtype: str = "bfloat16",
        _restore: dict | None = None,
    ) -> None:
        embeddings = np.asarray(embeddings, np.float32)
        self.ids = np.asarray(ids)
        num_items, dim = embeddings.shape
        self.nprobe = nprobe
        # keep the build-time f32 corpus: save() persists these exact
        # vectors (the bucket layout stores the serving dtype — re-saving
        # from buckets would quantize the persisted corpus to bf16,
        # ADVICE round 2) and recall_probe() scores against them
        self._embeddings_f32 = embeddings
        if _restore is not None:
            centroids = _restore["centroids"]
            assign = _restore["assign"]
            self.num_clusters = centroids.shape[0]
        else:
            if num_clusters is None:
                # reference heuristic: nlist ~= 4 * sqrt(n)
                # (data/lightning.py:202-203), floored at 4
                num_clusters = max(4, int(4 * np.sqrt(num_items)))
            num_clusters = min(num_clusters, num_items)
            self.num_clusters = num_clusters
            centroids, assign = kmeans(
                jnp.asarray(embeddings),
                num_clusters,
                iters=kmeans_iters,
                seed=seed,
            )
            centroids = np.asarray(centroids)
            assign = np.asarray(assign)
            if spill_factor is not None:
                # cap the dense bucket width at spill_factor x the mean
                # cluster size; overflow spills to next-nearest centroids
                cap = max(
                    1,
                    int(np.ceil(spill_factor * num_items / num_clusters)),
                )
                counts = np.bincount(assign, minlength=num_clusters)
                if counts.max() > cap:
                    assign = assign_with_spill(
                        jnp.asarray(embeddings),
                        jnp.asarray(centroids),
                        cap,
                    )
        self._assign = assign
        counts = np.bincount(assign, minlength=self.num_clusters)
        bucket = max(int(counts.max()), 1)
        order = np.argsort(assign, kind="stable")
        buckets = np.zeros(
            (self.num_clusters, bucket, dim), dtype=np.float32
        )
        positions = np.full(
            (self.num_clusters, bucket), num_items, dtype=np.int32
        )
        offsets = np.zeros(self.num_clusters, dtype=np.int64)
        for row in order:
            c = assign[row]
            buckets[c, offsets[c]] = embeddings[row]
            positions[c, offsets[c]] = row
            offsets[c] += 1
        self.bucket_size = bucket
        self.fill = float(counts.sum() / (self.num_clusters * bucket))
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.buckets = jnp.asarray(buckets, dtype=dtype)
        self.positions = jnp.asarray(positions)
        self._ids_dev = jnp.asarray(self.ids.astype(np.int64))
        self._num_items = num_items
        # per-cluster covering radii over the SERVING-dtype vectors (the
        # vectors the probe actually scores): r_c = max ||x_served - mu||.
        # These power the certified search's triangle bound
        #   q . x <= q . mu_c + ||q|| * r_c   for every x in cluster c,
        # so a probe can PROVE no unprobed cluster holds a top-k item.
        served = np.asarray(self.buckets, np.float32)
        diff_sq = (
            (served**2).sum(-1)
            - 2.0 * np.einsum("kbd,kd->kb", served, centroids)
            + (centroids**2).sum(-1)[:, None]
        )
        slot_valid = np.asarray(positions) < num_items
        diff_sq = np.where(slot_valid, np.maximum(diff_sq, 0.0), 0.0)
        self.radii = jnp.asarray(
            np.sqrt(diff_sq.max(axis=1)), jnp.float32
        )
        # max served row norm: scales the certificate slack relatively
        # (see CERT_SLACK) so certification stays sound on corpora with
        # extra scoring columns (bias / CF factors / popularity) whose
        # row norms exceed 1
        row_norm_sq = np.where(slot_valid, (served**2).sum(-1), 0.0)
        self.max_row_norm = float(
            np.sqrt(row_norm_sq.max()) if num_items else 1.0
        )
        max_row_norm = max(self.max_row_norm, 1e-12)

        def probe(q, k, nprobe, centroids, buckets, positions, excl):
            q = q.astype(jnp.float32)
            cluster_scores = jnp.dot(
                q, centroids.T, preferred_element_type=jnp.float32
            )
            _, probe_ids = jax.lax.top_k(cluster_scores, nprobe)  # (B, P)
            cand = buckets[probe_ids]  # (B, P, bucket, D)
            cand_pos = positions[probe_ids]  # (B, P, bucket)
            scores = jnp.einsum(
                "bd,bpcd->bpc",
                q.astype(cand.dtype),
                cand,
                preferred_element_type=jnp.float32,
            )
            batch = q.shape[0]
            scores = scores.reshape(batch, -1)
            cand_pos = cand_pos.reshape(batch, -1)
            scores = jnp.where(cand_pos < num_items, scores, NEG_INF)
            if excl is not None:
                # reference `id NOT IN (...)` prefilter parity
                # (data/lightning.py:237-259): mask candidates whose
                # global position appears in the row's exclusion list
                hit = jnp.any(
                    cand_pos[:, :, None] == excl[:, None, :], axis=-1
                )
                scores = jnp.where(hit, NEG_INF, scores)
            k_eff = min(k, scores.shape[1])
            top_scores, arg = jax.lax.top_k(scores, k_eff)
            top_pos = jnp.take_along_axis(cand_pos, arg, axis=-1)
            return top_scores, top_pos

        def probe_certified(
            q, k, nprobe, centroids, radii, buckets, positions, excl
        ):
            qf = q.astype(jnp.float32)
            cluster_scores = jnp.dot(
                qf, centroids.T, preferred_element_type=jnp.float32
            )
            _, probe_ids = jax.lax.top_k(cluster_scores, nprobe)
            cand = buckets[probe_ids]
            cand_pos = positions[probe_ids]
            scores = jnp.einsum(
                "bd,bpcd->bpc",
                q.astype(cand.dtype),
                cand,
                preferred_element_type=jnp.float32,
            )
            batch = qf.shape[0]
            scores = scores.reshape(batch, -1)
            cand_pos = cand_pos.reshape(batch, -1)
            scores = jnp.where(cand_pos < num_items, scores, NEG_INF)
            if excl is not None:
                hit = jnp.any(
                    cand_pos[:, :, None] == excl[:, None, :], axis=-1
                )
                scores = jnp.where(hit, NEG_INF, scores)
            k_eff = min(k, scores.shape[1])
            top_scores, arg = jax.lax.top_k(scores, k_eff)
            top_pos = jnp.take_along_axis(cand_pos, arg, axis=-1)
            # triangle bound per (query, cluster); probed clusters are
            # out of the max (their items were scored exactly)
            q_norm = jnp.linalg.norm(qf, axis=-1, keepdims=True)
            upper = cluster_scores + q_norm * radii[None, :]
            n_clusters = centroids.shape[0]
            probed = jnp.any(
                jax.lax.broadcasted_iota(
                    jnp.int32, (batch, n_clusters), 1
                )[:, :, None]
                == probe_ids[:, None, :],
                axis=-1,
            )
            unprobed_max = jnp.max(
                jnp.where(probed, NEG_INF, upper), axis=-1
            )
            # relative slack CERT_SLACK * ||q|| * max_row_norm covers
            # the bf16 cast of q inside the bucket einsum (the bound
            # itself is f32): served scores sit within the slack of the
            # exact dot against the served vectors, at any corpus scale
            slack = CERT_SLACK * q_norm[:, 0] * max_row_norm
            exact = top_scores[:, k_eff - 1] >= unprobed_max + slack
            if k_eff < k:
                # fewer candidates than requested: the certificate only
                # proves the k_eff found items dominate unprobed
                # clusters — it is NOT an exhaustive top-k, so never
                # claim exactness (callers would skip their fallback
                # and silently truncate the result list)
                exact = jnp.zeros_like(exact)
            return top_scores, top_pos, exact

        # None excl traces as an empty pytree: the no-exclusion and
        # exclusion variants each get one cache entry
        self._probe_fn = jax.jit(probe, static_argnames=("k", "nprobe"))
        self._probe_certified_fn = jax.jit(
            probe_certified, static_argnames=("k", "nprobe")
        )
        self._id_to_pos = {int(i): p for p, i in enumerate(self.ids)}

    def __len__(self) -> int:
        return self._num_items

    def positions_of(
        self, id_lists: list[list[int]], width: int | None = None
    ) -> np.ndarray:
        """Per-row id lists -> padded corpus positions (pad = N).

        Pad width rounds up to a power of two for stable jit shapes
        (same convention as RetrievalIndex.positions_of).
        """
        if width is None:
            longest = max((len(x) for x in id_lists), default=1) or 1
            width = max(8, 1 << (longest - 1).bit_length())
        out = np.full((len(id_lists), width), self._num_items, np.int32)
        for row, id_list in enumerate(id_lists):
            for col, id_val in enumerate(id_list[:width]):
                out[row, col] = self._id_to_pos.get(
                    int(id_val), self._num_items
                )
        return out

    def search(
        self,
        queries: np.ndarray | Array,
        *,
        top_k: int,
        nprobe: int | None = None,
        exclude_ids: list[list[int]] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Probe search -> (scores (B, k), item_ids (B, k)).

        Results are exact within the probed clusters (no quantization);
        recall vs exhaustive search rises with `nprobe` (reference
        default 8, data/lightning.py:165). `exclude_ids` mirrors the
        reference's NOT-IN prefilter.
        """
        queries = jnp.asarray(queries)
        if queries.ndim == 1:
            queries = queries[None, :]
        nprobe = min(
            nprobe if nprobe is not None else self.nprobe,
            self.num_clusters,
        )
        excl = (
            jnp.asarray(self.positions_of(exclude_ids))
            if exclude_ids is not None
            else None
        )
        scores, positions = self._probe_fn(
            queries,
            top_k,
            nprobe,
            self.centroids,
            self.buckets,
            self.positions,
            excl,
        )
        positions = np.asarray(positions)
        # padding positions (empty bucket slots) only surface when the
        # probed lists hold fewer than k real items; map them to id -1
        valid = positions < self._num_items
        item_ids = np.where(
            valid, self.ids[np.clip(positions, 0, self._num_items - 1)], -1
        )
        return np.asarray(scores), item_ids

    def search_certified(
        self,
        queries: np.ndarray | Array,
        *,
        top_k: int,
        nprobe: int | None = None,
        exclude_ids: list[list[int]] | None = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Probe search WITH a per-row exactness certificate.

        Returns (scores, item_ids, exact). `exact[b]` is True when the
        triangle bound proves no unprobed cluster can hold an item
        scoring above row b's k-th found score: for every item x of
        cluster c, q.x <= q.mu_c + ||q||*r_c (Cauchy-Schwarz over the
        covering radius of the SERVED vectors), so

            kth_found >= max_{c unprobed} (q.mu_c + ||q||*r_c) + slack

        means the probed top-k IS the exhaustive top-k over the served
        corpus (slack = CERT_SLACK * ||q|| * max_row_norm covers the
        bf16 query cast in the bucket scoring at any corpus/query norm —
        the same "exact at a declared quantum" contract as the packed
        scan's certificates). When the probed candidate pool is smaller
        than top_k, `exact` is forced False: the certificate cannot
        prove an exhaustive top-k it did not materialize. On corpora that cluster
        (real embedding manifolds) certification fires at practical
        nprobe; on adversarial uniform-random corpora the bound is
        vacuous and `exact` stays False — callers fall back to the
        exhaustive guaranteed scan for those rows (the serving engine's
        `ivf_certified` mode does exactly that). Exclusions only make
        the certificate conservative, never unsound: excluded items can
        only LOWER what an unprobed cluster could contribute.
        """
        queries = jnp.asarray(queries)
        if queries.ndim == 1:
            queries = queries[None, :]
        nprobe = min(
            nprobe if nprobe is not None else self.nprobe,
            self.num_clusters,
        )
        excl = (
            jnp.asarray(self.positions_of(exclude_ids))
            if exclude_ids is not None
            else None
        )
        scores, positions, exact = self._probe_certified_fn(
            queries,
            top_k,
            nprobe,
            self.centroids,
            self.radii,
            self.buckets,
            self.positions,
            excl,
        )
        positions = np.asarray(positions)
        valid = positions < self._num_items
        item_ids = np.where(
            valid, self.ids[np.clip(positions, 0, self._num_items - 1)], -1
        )
        return np.asarray(scores), item_ids, np.asarray(exact)

    def recall_probe(
        self,
        *,
        top_k: int = 10,
        nprobe: int | None = None,
        num_queries: int = 256,
        seed: int = 0,
    ) -> float:
        """Measured recall@k of the probe path vs exhaustive search.

        Samples corpus points, perturbs them slightly (realistic
        near-duplicate queries), and compares the probe's top-k position
        sets against an exact dense top-k over the build-time f32
        corpus. Cheap (one dense matmul over `num_queries` rows) and
        runs at build/load time so an unclusterable corpus can't
        silently serve 0.2-recall results (uniform random corpora
        measure ~0.21 at the reference-default nprobe=8 —
        BENCH_NOTES round 2).
        """
        rng = np.random.default_rng(seed)
        n = self._num_items
        num_queries = min(num_queries, n)
        take = rng.choice(n, num_queries, replace=False)
        queries = self._embeddings_f32[take]
        noise = rng.normal(scale=0.1, size=queries.shape).astype(np.float32)
        queries = queries + noise * np.linalg.norm(
            queries, axis=-1, keepdims=True
        )
        queries /= np.maximum(
            np.linalg.norm(queries, axis=-1, keepdims=True), 1e-12
        )
        k = min(top_k, n)
        exact_scores = queries @ self._embeddings_f32.T
        exact_top = np.argpartition(-exact_scores, k - 1, axis=1)[:, :k]
        _, got_ids = self.search(queries, top_k=k, nprobe=nprobe)
        exact_ids = self.ids[exact_top]
        hits = sum(
            len(np.intersect1d(got_ids[i], exact_ids[i], assume_unique=False))
            for i in range(num_queries)
        )
        return hits / (num_queries * k)

    # -- persistence ------------------------------------------------------
    def save(self, path: str | pathlib.Path) -> None:
        path = pathlib.Path(path)
        path.mkdir(parents=True, exist_ok=True)
        # the build-time f32 corpus, NOT a reconstruction from the
        # serving-dtype buckets (which would persist bf16-rounded rows)
        np.savez(
            path / "ivf.npz",
            embeddings=self._embeddings_f32,
            ids=self.ids,
            centroids=np.asarray(self.centroids),
            assign=self._assign,
        )
        meta = {"nprobe": self.nprobe, "dtype": str(self.buckets.dtype)}
        (path / "ivf.json").write_text(json.dumps(meta))

    @classmethod
    def load(cls, path: str | pathlib.Path) -> IVFIndex:
        path = pathlib.Path(path)
        arrays = np.load(path / "ivf.npz", allow_pickle=False)
        meta = json.loads((path / "ivf.json").read_text())
        return cls(
            arrays["embeddings"],
            arrays["ids"],
            nprobe=meta["nprobe"],
            dtype=meta["dtype"],
            _restore={
                "centroids": arrays["centroids"],
                "assign": arrays["assign"],
            },
        )
