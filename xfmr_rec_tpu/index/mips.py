"""Exact maximum-inner-product retrieval over a TPU-HBM-resident corpus.

This replaces the reference's LanceDB IVF-HNSW-PQ ANN index
(/root/reference/xfmr_rec/data/lightning.py:183-259). The reference needs
an approximate CPU index; on TPU the idiomatic design is *exhaustive*
scoring — the corpus lives in HBM as one (N, D) matrix, a query batch is a
single (B, D) @ (D, N) matmul on the MXU, and top-k streams over corpus
tiles. Exact search means recall@k of the scoring model itself, with no
nprobes/refine_factor tuning surface.

Score semantics match the reference (data/lightning.py:237-259): for
unit-norm embeddings, score = 1 - cosine_distance = dot product.
Exclusion filters (the reference's `id NOT IN (...)` prefilter) are
per-row scatter masks of -inf applied before top-k.

Two jit paths:
- `exact_topk`: one dense (B, N) score matrix + lax.top_k — best for
  corpora that fit comfortably (the ML-1M corpus trivially does).
- chunked mode (`chunk_size=...`): lax.scan over corpus tiles carrying a
  running (B, k) top-k — bounds memory at (B, chunk) for corpora of tens
  of millions of items, and is the shape the Pallas kernel optimizes.
"""

from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

NEG_INF = float("-inf")  # plain float: no backend init at import time


def _apply_exclusions(scores: Array, exclude_positions: Array | None) -> Array:
    """Scatter -inf at excluded corpus positions per row.

    exclude_positions: (B, E) int32, padded with any out-of-range value
    (>= N or < 0) — padding is dropped by the scatter.
    """
    if exclude_positions is None:
        return scores
    batch = scores.shape[0]
    rows = jnp.arange(batch)[:, None]
    return scores.at[rows, exclude_positions].set(NEG_INF, mode="drop")


def exact_topk(
    queries: Array,
    corpus: Array,
    k: int,
    *,
    exclude_positions: Array | None = None,
    chunk_size: int | None = None,
) -> tuple[Array, Array]:
    """Exhaustive top-k MIPS.

    Args:
        queries: (B, D)
        corpus: (N, D)
        k: number of results (static)
        exclude_positions: (B, E) padded int32 positions to mask, or None
        chunk_size: if set, stream over corpus tiles of this size with a
            running top-k (memory O(B * chunk) instead of O(B * N)).

    Returns:
        (scores (B, k) f32 descending, positions (B, k) int32)
    """
    num_items = corpus.shape[0]
    if chunk_size is None or chunk_size >= num_items:
        scores = jnp.dot(
            queries, corpus.T, preferred_element_type=jnp.float32
        )
        scores = _apply_exclusions(scores, exclude_positions)
        return jax.lax.top_k(scores, k)

    if num_items % chunk_size != 0:
        msg = f"{num_items=} must be divisible by {chunk_size=}"
        raise ValueError(msg)
    num_chunks = num_items // chunk_size
    corpus_tiles = corpus.reshape(num_chunks, chunk_size, corpus.shape[1])
    batch = queries.shape[0]

    def scan_body(carry, tile_args):
        best_scores, best_pos = carry
        tile, tile_idx = tile_args
        scores = jnp.dot(queries, tile.T, preferred_element_type=jnp.float32)
        positions = tile_idx * chunk_size + jnp.arange(chunk_size)[None, :]
        positions = jnp.broadcast_to(positions, scores.shape)
        if exclude_positions is not None:
            hit = jnp.any(
                positions[:, :, None] == exclude_positions[:, None, :],
                axis=-1,
            )
            scores = jnp.where(hit, NEG_INF, scores)
        # merge running top-k with this tile's top-k
        tile_scores, tile_arg = jax.lax.top_k(scores, min(k, chunk_size))
        tile_pos = jnp.take_along_axis(positions, tile_arg, axis=-1)
        merged_scores = jnp.concatenate([best_scores, tile_scores], axis=-1)
        merged_pos = jnp.concatenate([best_pos, tile_pos], axis=-1)
        new_scores, merge_arg = jax.lax.top_k(merged_scores, k)
        new_pos = jnp.take_along_axis(merged_pos, merge_arg, axis=-1)
        return (new_scores, new_pos), None

    init = (
        jnp.full((batch, k), NEG_INF, dtype=jnp.float32),
        jnp.zeros((batch, k), dtype=jnp.int32),
    )
    (scores, positions), _ = jax.lax.scan(
        scan_body, init, (corpus_tiles, jnp.arange(num_chunks))
    )
    return scores, positions


class BM25Index:
    """Host-side BM25 over metadata rows (the reference's LanceDB FTS
    capability, data/lightning.py:221,298 — built for BOTH item and user
    tables there; LanceDB's FTS is native Rust — here the build and
    search run in C++ (native/bm25.cpp) with this Python implementation
    as the semantics oracle and fallback). Reusable:
    RetrievalIndex.search_text rides it for items; the serving engine
    builds one over user rows.
    """

    K1 = 1.2
    B = 0.75

    def __init__(
        self,
        metadata: list[dict],
        *,
        text_col: str | None = None,
        native: bool | None = None,
    ) -> None:
        import re

        self.metadata = metadata
        if text_col is None:
            sample = next((m for m in metadata if m), {})
            text_col = next(
                (k for k, v in sample.items() if isinstance(v, str)), None
            )
        self.text_col = text_col
        self._tokenize = re.compile(r"[a-z0-9]+").findall
        texts = [str(m.get(text_col, "")) for m in metadata]
        self._native = None
        if native is not False and text_col is not None:
            from xfmr_rec_tpu.native import bm25_native

            if bm25_native.available():
                self._native = bm25_native.NativeBM25(texts)
            elif native:  # explicitly requested
                msg = "native BM25 requested but unavailable"
                raise RuntimeError(msg)
        if self._native is not None:
            return
        docs = [self._tokenize(text.lower()) for text in texts]
        postings: dict[str, dict[int, int]] = {}
        for row, toks in enumerate(docs):
            for tok in toks:
                bucket = postings.setdefault(tok, {})
                bucket[row] = bucket.get(row, 0) + 1
        self._postings = postings
        self._doc_lens = np.array(
            [len(t) or 1 for t in docs], dtype=np.float32
        )

    def search(self, query: str, *, top_k: int = 10) -> list[tuple[int, float]]:
        """Top matching (row, score) pairs, positive scores only."""
        if self.text_col is None:
            return []
        if self._native is not None:
            return self._native.search(query, top_k=top_k)
        n_docs = len(self._doc_lens)
        avg_len = float(self._doc_lens.mean()) if n_docs else 1.0
        scores = np.zeros(n_docs, dtype=np.float32)
        for tok in self._tokenize(query.lower()):
            plist = self._postings.get(tok)
            if not plist:
                continue
            idf = np.log(
                1.0 + (n_docs - len(plist) + 0.5) / (len(plist) + 0.5)
            )
            for row, tf in plist.items():
                denom = tf + self.K1 * (
                    1 - self.B + self.B * self._doc_lens[row] / avg_len
                )
                scores[row] += idf * tf * (self.K1 + 1) / denom
        order = np.argsort(-scores, kind="stable")[:top_k]
        return [(int(r), float(scores[r])) for r in order if scores[r] > 0]


class CorpusMetadata:
    """Host-side id/metadata surface shared by every index kind.

    Mirrors the reference LanceDbProcessor lookup surface
    (data/lightning.py:145-151 get_id, :221 FTS). Subclasses set
    `self.ids`, `self._id_to_pos`, `self.metadata`, `self.id_col`.
    """

    def __len__(self) -> int:
        return len(self.ids)

    def positions_of(
        self, id_lists: list[list[int]], width: int | None = None
    ) -> np.ndarray:
        """Map per-row id lists to padded corpus positions (pad = N).

        The pad width is rounded up to a power of two so the jitted
        search sees a few stable exclusion shapes instead of recompiling
        per request.
        """
        num_items = len(self.ids)
        if width is None:
            longest = max((len(x) for x in id_lists), default=1) or 1
            width = 1 << (longest - 1).bit_length()
            width = max(width, 8)
        out = np.full((len(id_lists), width), num_items, dtype=np.int32)
        for row, id_list in enumerate(id_lists):
            for col, id_val in enumerate(id_list[:width]):
                out[row, col] = self._id_to_pos.get(int(id_val), num_items)
        return out

    def search_text(
        self, query: str, *, top_k: int = 10, text_col: str | None = None
    ) -> list[dict]:
        """Keyword (BM25) search over item metadata text.

        Capability parity with the reference's full-text indexes
        (data/lightning.py:221,298 create LanceDB FTS indexes on the
        text columns — no reference code path queries them, but the
        capability is part of its index surface). Host-side BM25 with a
        lazily-built inverted index; corpus text fits host memory by
        construction (it is the metadata store).

        Returns the top matching metadata rows (with id and score).
        """
        if getattr(self, "_fts_col", None) != text_col or not hasattr(
            self, "_fts"
        ):
            self._fts = BM25Index(self.metadata, text_col=text_col)
            self._fts_col = text_col
        out = []
        for row, score in self._fts.search(query, top_k=top_k):
            entry = dict(self.metadata[row])
            entry[self.id_col] = int(self.ids[row])
            entry["score"] = score
            out.append(entry)
        return out

    def get_id(self, id_val: int | None) -> dict:
        """Metadata row for one id ({} on miss) — reference get_id parity."""
        if id_val is None:
            return {}
        pos = self._id_to_pos.get(int(id_val))
        if pos is None:
            return {}
        row = dict(self.metadata[pos])
        row[self.id_col] = int(self.ids[pos])
        return row


class RetrievalIndex(CorpusMetadata):
    """Host-facing index: corpus embeddings + item metadata + jitted search.

    Capability parity with the reference ItemProcessor index surface
    (data/lightning.py:183-259 get_index/search and :145-151 get_id), with
    exact instead of approximate search.
    """

    def __init__(
        self,
        embeddings: np.ndarray,
        ids: np.ndarray,
        metadata: list[dict] | None = None,
        *,
        id_col: str = "id",
        dtype: str = "bfloat16",
        chunk_size: int | None = None,
        method: str = "dense",
        scan_kernel: str = "packed",
    ) -> None:
        if embeddings.shape[0] != len(ids):
            msg = "embeddings and ids must align"
            raise ValueError(msg)
        if method == "auto":
            # the fused scan kernel wins once the (B, N) score matrix
            # stops fitting comfortably; small corpora are faster dense
            method = "scan" if embeddings.shape[0] >= 65536 else "dense"
        if method not in ("dense", "scan"):
            msg = f"unknown search method {method!r}"
            raise ValueError(msg)
        self.id_col = id_col
        self.ids = np.asarray(ids)
        self.metadata = metadata or [{} for _ in self.ids]
        self._id_to_pos = {int(i): p for p, i in enumerate(self.ids)}
        self.chunk_size = chunk_size
        self.dtype = dtype
        if dtype == "int8":
            # per-item symmetric quantization: c_i ~= scale_i * q_i.
            # Halves HBM per item vs bf16 (2x catalog capacity per chip);
            # the kernel dequantizes tiles in VMEM and multiplies scores
            # by scale_i. Search is exact over the QUANTIZED corpus —
            # certificates still hold; quantization error vs the f32
            # embeddings is ~sqrt(D)*max|c|/254 (<1% for unit-norm rows).
            emb = np.asarray(embeddings, dtype=np.float32)
            scale = np.abs(emb).max(axis=1) / 127.0
            scale = np.maximum(scale, 1e-12)
            quant = np.clip(
                np.round(emb / scale[:, None]), -127, 127
            ).astype(np.int8)
            self.corpus = jnp.asarray(quant)
            self._scales = jnp.asarray(scale.reshape(1, -1))
            self._query_dtype = jnp.bfloat16
            method = "scan"  # int8 rides the Pallas dequantizing kernel
            # packed-path score bound: max dequantized row norm
            self._corpus_maxnorm = float(
                (np.linalg.norm(quant.astype(np.float32), axis=1) * scale)
                .max(initial=0.0)
            )
        else:
            # bf16 corpus in device memory: halves HBM traffic vs f32.
            # maxnorm reduces ON DEVICE so a device-resident embeddings
            # array (Trainer.build_index keeps the re-embed on device)
            # never round-trips to host here
            self.corpus = jnp.asarray(embeddings, dtype=dtype)
            self._scales = None
            self._query_dtype = self.corpus.dtype
            if self.corpus.shape[0]:
                self._corpus_maxnorm = float(
                    jnp.max(
                        jnp.linalg.norm(
                            jnp.asarray(embeddings, jnp.float32), axis=1
                        )
                    )
                )
            else:
                self._corpus_maxnorm = 0.0
        self.method = method
        self._ids_dev = jnp.asarray(self.ids.astype(np.int32))
        # NOTE: the corpus is always passed as a jit ARGUMENT, never a
        # closure capture — captured arrays become compile-time constants
        # baked into the executable (and, on remote-compile setups, into
        # the compile request itself: a 1M x 64 bf16 corpus adds 128 MB
        # per compile; >= 4M items exceeds the compiler's request limit).
        if scan_kernel not in ("f32", "packed"):
            msg = f"unknown scan_kernel {scan_kernel!r}"
            raise ValueError(msg)
        self.scan_kernel = scan_kernel
        self._build_search_fn()

    def _build_search_fn(self) -> None:
        """(Re)build the jitted search entry for the current corpus.

        Called from __init__ and after catalog mutations
        (add_items/remove_items) — the scan closures bake the padded
        geometry (corpus_tile, true_num_items) as compile-time
        constants, so a corpus length change needs fresh closures (and
        a recompile on the next search).
        """
        method = self.method
        if method == "scan":
            from xfmr_rec_tpu.ops.topk_pallas import (
                packed_topk_excluding,
                scan_topk_excluding,
            )

            corpus_padded, scales_padded, tile, true_n, interpret = (
                self._scan_setup()
            )
            self._corpus_arg = corpus_padded
            self._scales_arg = scales_padded
            if self.scan_kernel == "packed":
                # ~40% faster sweep; scores are quantum-floor decodes
                # (see _search_certified_packed's precision notes)
                self._search_fn = jax.jit(
                    lambda q, excl, k, bound, c, s: packed_topk_excluding(
                        q,
                        c,
                        k,
                        exclude_positions=excl,
                        score_bound=bound,
                        true_num_items=true_n,
                        corpus_tile=tile,
                        scales=s,
                        interpret=interpret,
                    ),
                    static_argnames=("k",),
                )
            else:
                self._search_fn = jax.jit(
                    lambda q, excl, k, c, s: scan_topk_excluding(
                        q,
                        c,
                        k,
                        exclude_positions=excl,
                        true_num_items=true_n,
                        corpus_tile=tile,
                        scales=s,
                        interpret=interpret,
                    ),
                    static_argnames=("k",),
                )
        else:
            self._corpus_arg = self.corpus
            self._scales_arg = None
            self._search_fn = jax.jit(
                lambda q, excl, k, c, s: exact_topk(
                    q,
                    c,
                    k,
                    exclude_positions=excl,
                    chunk_size=self.chunk_size,
                ),
                static_argnames=("k",),
            )

    def _scan_setup(self):
        """Padded corpus (+ scales) + tile geometry for the scan paths.

        Cached so the scan search fn and the certified search fn share
        ONE padded corpus copy in device memory.
        """
        if not hasattr(self, "_scan_state"):
            from xfmr_rec_tpu.ops.topk_pallas import pick_corpus_tile

            true_n = self.corpus.shape[0]
            tile = pick_corpus_tile(true_n, self.corpus.shape[1])
            pad = -true_n % tile
            corpus_padded = (
                jnp.pad(self.corpus, ((0, pad), (0, 0)))
                if pad
                else self.corpus
            )
            scales_padded = self._scales
            if scales_padded is not None and pad:
                scales_padded = jnp.pad(scales_padded, ((0, 0), (0, pad)))
            # Pallas compiles on TPU; CPU (tests) runs the interpreter
            interpret = jax.default_backend() == "cpu"
            self._scan_state = (
                corpus_padded, scales_padded, tile, true_n, interpret
            )
        return self._scan_state

    @property
    def dim(self) -> int:
        return self.corpus.shape[1]

    def _ensure_dense_fn(self):
        """Jitted dense-exact fallback shared by the certified paths."""
        import jax

        if hasattr(self, "_dense_fn"):
            return

        def dense_exact(q, k, c, s):
            if c.dtype == jnp.int8:
                # dequantized dense scoring for the int8 fallback
                scores = jnp.dot(
                    q,
                    c.T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ) * s[0][None, :]
                return jax.lax.top_k(scores, k)
            return exact_topk(q, c, k, chunk_size=self.chunk_size)

        self._dense_fn = jax.jit(dense_exact, static_argnames=("k",))

    def search_certified(
        self,
        queries: np.ndarray | Array,
        *,
        top_k: int,
        method: str = "f32",
        exact_scores: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Guaranteed-exact batched search (no exclusions).

        Three escalating passes, each certifying per row:
        1. fused Pallas sweep with discard-max certificates
           (ops/topk_pallas.py certified_topk_parts) — ~96% of rows;
        2. for uncertified rows, one retry sweep with a shuffled
           position->lane mapping (lane_shuffle=1 decorrelates every
           pass-1 collision); the merged candidate pool certifies when
           min(dmax_1, dmax_2) < merged tau — catches ~all the rest;
        3. dense exact fallback for anything still uncertified (ties).

        Returns (scores (B, k), item_ids (B, k)); every row is provably
        the exact top-k by score multiset.

        method="packed" rides the packed-key scan instead (~40% faster at
        large batch x 1M corpus): the k-set is exact w.r.t. scores
        quantized at the key quantum (membership ties within ~1e-4 of
        the k-th score may swap); scores are quantum-floor decodes by
        default, or exact f32 with `exact_scores=True`. See
        `_search_certified_packed`.

        method="fused" (round 3, fastest): the same guarantee as
        "packed" but the whole escalation — pass 1, lane-shuffled
        retries, pool merges — runs as ONE jit dispatch on device
        (`packed_guaranteed_topk`), with the dense path only for the
        ~(1-0.96)^3 residual. This is the benched guaranteed-exact
        configuration.
        """
        import jax

        from xfmr_rec_tpu.ops.topk_pallas import certified_topk_parts

        if method == "packed":
            return self._search_certified_packed(
                queries, top_k=top_k, exact_scores=exact_scores
            )
        if method == "fused":
            return self._search_certified_fused(
                queries, top_k=top_k, exact_scores=exact_scores
            )
        if method != "f32":
            msg = f"unknown certified search method {method!r}"
            raise ValueError(msg)
        queries = jnp.asarray(queries, dtype=self._query_dtype)
        if queries.ndim == 1:
            queries = queries[None, :]
        corpus_padded, scales_padded, tile, true_n, interpret = (
            self._scan_setup()
        )
        if not hasattr(self, "_certified_fn"):
            # corpus as jit argument, not closure constant (see __init__)
            self._certified_fn = jax.jit(
                lambda q, k, shuffle, c, s: certified_topk_parts(
                    q,
                    c,
                    k,
                    corpus_tile=tile,
                    true_num_items=true_n,
                    lane_shuffle=shuffle,
                    scales=s,
                    interpret=interpret,
                ),
                static_argnames=("k", "shuffle"),
            )
            self._ensure_dense_fn()
        # pad the batch to a lane_max_scan-tileable width (pow2, >= 8,
        # stable shapes for the jit cache); padding rows are dropped at
        # the end and zero queries certify trivially
        true_batch = queries.shape[0]
        width = max(8, 1 << (true_batch - 1).bit_length())
        if width != true_batch:
            queries = jnp.pad(queries, ((0, width - true_batch), (0, 0)))
        vals1, pos1, dmax1 = self._certified_fn(
            queries, top_k, 0, corpus_padded, scales_padded
        )
        # np.array copies: device buffers are read-only views and the
        # retry/fallback stages write into these
        scores = np.array(vals1)
        positions = np.array(pos1)
        # per-row min of dmax over passes: an element above the merged
        # tau missing from the candidate union must have been evicted in
        # EVERY pass, so min(dmax_i) <= tau certifies the union's top-k
        best_dmax = np.array(dmax1)
        # <=: score-multiset exactness (see certified_topk docstring);
        # batch-padding rows are excluded from the retry set outright
        uncertified = ~(best_dmax <= scores[:, top_k - 1])
        uncertified[true_batch:] = False
        bad = np.nonzero(uncertified)[0]
        stats = {"batch": true_batch, "pass1_bad": int(bad.size)}
        queries_np = np.asarray(queries, dtype=np.float32)
        pools: dict[int, tuple[np.ndarray, np.ndarray]] = {
            int(b): (positions[b], scores[b]) for b in bad
        }
        for shuffle in (1, 3, 5):
            if not bad.size:
                break
            # pad retry batches to stable power-of-two jit shapes
            width = max(128, 1 << (int(bad.size) - 1).bit_length())
            retry = np.zeros((width, self.dim), dtype=np.float32)
            retry[: bad.size] = queries_np[bad]
            v, p, d = self._certified_fn(
                jnp.asarray(retry, dtype=self._query_dtype),
                top_k,
                shuffle,
                corpus_padded,
                scales_padded,
            )
            v = np.asarray(v)[: bad.size]
            p = np.asarray(p)[: bad.size]
            d = np.asarray(d)[: bad.size]
            still_bad = []
            for row, b in enumerate(bad):
                b = int(b)
                best_dmax[b] = min(best_dmax[b], d[row])
                pool_pos = np.concatenate([pools[b][0], p[row]])
                pool_val = np.concatenate([pools[b][1], v[row]])
                # dedupe the merged pool by position, keep best k
                _, first = np.unique(pool_pos, return_index=True)
                order = first[np.argsort(-pool_val[first], kind="stable")]
                take = order[:top_k]
                pools[b] = (pool_pos[take], pool_val[take])
                tau = pool_val[take[-1]]
                if best_dmax[b] <= tau and len(take) == top_k:
                    scores[b] = pool_val[take]
                    positions[b] = pool_pos[take]
                else:
                    still_bad.append(b)
            bad = np.asarray(still_bad, dtype=np.int64)
        stats["retry_bad"] = int(bad.size)
        if bad.size:
            width = max(8, 1 << (int(bad.size) - 1).bit_length())
            retry = np.zeros((width, self.dim), dtype=np.float32)
            retry[: bad.size] = queries_np[bad]
            s3, p3 = self._dense_fn(
                jnp.asarray(retry, dtype=self._query_dtype),
                top_k,
                self.corpus,
                self._scales,
            )
            scores[bad] = np.asarray(s3)[: bad.size]
            positions[bad] = np.asarray(p3)[: bad.size]
        self.last_certified_stats = stats
        scores = scores[:true_batch]
        positions = positions[:true_batch]
        return scores, self.ids[positions]

    def _search_certified_fused(
        self,
        queries: np.ndarray | Array,
        *,
        top_k: int,
        exact_scores: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Guaranteed search as ONE device dispatch (round 3).

        Rides `packed_guaranteed_topk`: pass-1 sweep + in-graph
        lane-shuffled retries + device-side key-space pool merges, so
        the whole escalation is a single jit call with no host
        round-trips between passes (method="packed" transfers the
        (B, k) keys/positions to host after EVERY pass). The rare
        residual rows the pipeline cannot certify (expected
        ~(1 - 0.96)^3 with 2 retries) re-run through the dense exact
        path, preserving the same guarantee contract: every returned
        row is the exact top-k of the packed (quantized-score) order.
        """
        import jax

        from xfmr_rec_tpu.ops.topk_pallas import packed_guaranteed_topk

        queries_f32 = np.asarray(
            jnp.asarray(queries, jnp.float32)
            if isinstance(queries, Array)
            else np.asarray(queries, np.float32)
        )
        if queries_f32.ndim == 1:
            queries_f32 = queries_f32[None, :]
        corpus_padded, scales_padded, tile, true_n, interpret = (
            self._scan_setup()
        )
        if not hasattr(self, "_guaranteed_fn"):
            self._guaranteed_fn = jax.jit(
                lambda q, k, bound, exact_sc, c, s: packed_guaranteed_topk(
                    q,
                    c,
                    k,
                    score_bound=bound,
                    batch_tile=512,
                    corpus_tile=tile,
                    merge_levels=1,
                    merge_keep=3,
                    true_num_items=true_n,
                    scales=s,
                    retries=3,
                    recompute_scores=exact_sc,
                    interpret=interpret,
                ),
                static_argnames=("k", "exact_sc"),
            )
            self._ensure_dense_fn()
        qnorm = float(np.linalg.norm(queries_f32, axis=-1).max())
        bound = jnp.float32(max(self._corpus_maxnorm * qnorm * 1.05, 1e-6))
        true_batch = queries_f32.shape[0]
        width = max(8, 1 << (true_batch - 1).bit_length())
        queries_dev = jnp.asarray(
            np.pad(queries_f32, ((0, width - true_batch), (0, 0))),
            dtype=self._query_dtype,
        )
        scores, positions, exact = self._guaranteed_fn(
            queries_dev, top_k, bound, exact_scores,
            corpus_padded, scales_padded,
        )
        scores = np.array(scores)[:true_batch]
        positions = np.array(positions)[:true_batch]
        exact = np.asarray(exact)[:true_batch]
        bad = np.nonzero(~exact)[0]
        self.last_certified_stats = {
            "batch": true_batch,
            "pipeline_bad": int(bad.size),
        }
        if bad.size:
            rw = max(8, 1 << (int(bad.size) - 1).bit_length())
            retry = np.zeros((rw, self.dim), dtype=np.float32)
            retry[: bad.size] = queries_f32[bad]
            s3, p3 = self._dense_fn(
                jnp.asarray(retry, dtype=self._query_dtype),
                top_k,
                self.corpus,
                self._scales,
            )
            scores[bad] = np.asarray(s3)[: bad.size]
            positions[bad] = np.asarray(p3)[: bad.size]
        return scores, self.ids[positions]

    def _search_certified_packed(
        self,
        queries: np.ndarray | Array,
        *,
        top_k: int,
        exact_scores: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Guaranteed search on the packed-key scan (the turbo path).

        Same escalation as method="f32" — pass-1 sweep, lane-shuffled
        retries, dense fallback — but selection and the retry merges run
        in int32 KEY space (keys from passes sharing one score_bound are
        directly comparable; see ops/topk_pallas.py packed_lane_scan).
        Guarantee: the returned k-set is the exact top-k of the packed
        (quantized-score) order; membership ties within one key quantum
        (~score_bound * 2^(idx_bits-21), ~1e-4 unit score at 1M x 64) of
        the k-th score may swap vs the f32 order.

        Scores: by default, decoded from the keys (floor of the true
        score at the key quantum, zero extra device work). The quantum
        (~2e-4 at bench geometry) is an order of magnitude BELOW the
        bf16 scoring noise of every search path (~4e-3), so decoded
        scores are not meaningfully less exact — but pass
        `exact_scores=True` to recompute f32 scores for the selected
        items via a (B, k) gather+dot epilogue (+~4.5 ms at B=2048,
        which returns the path to f32-method latency).

        Measured on v5e at B=2048, k=100 over 1,048,576 x 64 bf16:
        ~10.2 ms vs ~14.5 ms for method="f32" (+42% QPS).
        """
        import jax

        from xfmr_rec_tpu.ops.topk_pallas import (
            exact_scores_at,
            packed_certified_parts,
        )

        queries_f32 = np.asarray(
            jnp.asarray(queries, jnp.float32)
            if isinstance(queries, Array)
            else np.asarray(queries, np.float32)
        )
        if queries_f32.ndim == 1:
            queries_f32 = queries_f32[None, :]
        corpus_padded, scales_padded, tile, true_n, interpret = (
            self._scan_setup()
        )
        num_tiles = corpus_padded.shape[0] // tile
        idx_bits = max((num_tiles - 1).bit_length(), 1)
        # one KEEP-3 lane-pair merge (round 3) cuts the top_k selection
        # width to 1.5ct at ~zero certification cost: a pair fails only
        # holding >= 4 of a row's top-k, expected rows ~ k^4/(24 pairs^3)
        # (vs k^3/(6 pairs^2) for the old keep-2 merge, measured
        # 96% -> 87%). Gate on pairs^3 >= k^4 (~4% extra failures max).
        pairs = tile >> 1
        merge_levels = 1 if pairs**3 >= top_k**4 else 0
        if not hasattr(self, "_packed_fn"):
            self._packed_fn = jax.jit(
                lambda q, k, shuffle, ml, bound, c, s: (
                    packed_certified_parts(
                        q,
                        c,
                        k,
                        score_bound=bound,
                        batch_tile=512,
                        corpus_tile=tile,
                        idx_bits=idx_bits,
                        merge_levels=ml,
                        merge_keep=3,
                        true_num_items=true_n,
                        lane_shuffle=shuffle,
                        scales=s,
                        interpret=interpret,
                    )
                ),
                static_argnames=("k", "shuffle", "ml"),
            )
            self._exact_at_fn = jax.jit(
                lambda q, pos, c, s: exact_scores_at(q, c, pos, scales=s)
            )
            self._ensure_dense_fn()
        # sound per-call score bound: max||q|| * max over items of the
        # DEQUANTIZED row norm (precomputed at build). The kernel adds
        # its own 0.25 safety factor; 5% here covers bf16 rounding.
        qnorm = float(np.linalg.norm(queries_f32, axis=-1).max())
        bound = jnp.float32(max(self._corpus_maxnorm * qnorm * 1.05, 1e-6))

        true_batch = queries_f32.shape[0]
        width = max(8, 1 << (true_batch - 1).bit_length())
        queries_dev = jnp.asarray(
            np.pad(queries_f32, ((0, width - true_batch), (0, 0))),
            dtype=self._query_dtype,
        )
        keys1, pos1, dmax1 = self._packed_fn(
            queries_dev, top_k, 0, merge_levels, bound,
            corpus_padded, scales_padded,
        )
        keys = np.array(keys1)
        positions = np.array(pos1)
        best_dmax = np.array(dmax1)
        tau = keys[:, top_k - 1]
        # padding keys are 0 but merge stamps can raise them to
        # (1 << merge_levels) - 1; real keys are >= bitcast(1.25)
        min_real = (1 << merge_levels) - 1
        uncertified = ~((best_dmax <= tau) & (tau > min_real))
        uncertified[true_batch:] = False
        bad = np.nonzero(uncertified)[0]
        stats = {"batch": true_batch, "pass1_bad": int(bad.size)}
        pools: dict[int, tuple[np.ndarray, np.ndarray]] = {
            int(b): (positions[b], keys[b]) for b in bad
        }
        for shuffle in (1, 3, 5):
            if not bad.size:
                break
            rw = max(128, 1 << (int(bad.size) - 1).bit_length())
            retry = np.zeros((rw, self.dim), dtype=np.float32)
            retry[: bad.size] = queries_f32[bad]
            kv, p, d = self._packed_fn(
                jnp.asarray(retry, dtype=self._query_dtype),
                top_k,
                shuffle,
                merge_levels,
                bound,
                corpus_padded,
                scales_padded,
            )
            kv = np.asarray(kv)[: bad.size]
            p = np.asarray(p)[: bad.size]
            d = np.asarray(d)[: bad.size]
            still_bad = []
            for row, b in enumerate(bad):
                b = int(b)
                best_dmax[b] = min(best_dmax[b], d[row])
                pool_pos = np.concatenate([pools[b][0], p[row]])
                pool_key = np.concatenate([pools[b][1], kv[row]])
                _, first = np.unique(pool_pos, return_index=True)
                order = first[np.argsort(-pool_key[first], kind="stable")]
                take = order[:top_k]
                pools[b] = (pool_pos[take], pool_key[take])
                row_tau = pool_key[take[-1]]
                if (
                    best_dmax[b] <= row_tau
                    and row_tau > min_real
                    and len(take) == top_k
                ):
                    keys[b] = pool_key[take]
                    positions[b] = pool_pos[take]
                else:
                    still_bad.append(b)
            bad = np.asarray(still_bad, dtype=np.int64)
        stats["retry_bad"] = int(bad.size)
        dense_scores = None
        if bad.size:
            rw = max(8, 1 << (int(bad.size) - 1).bit_length())
            retry = np.zeros((rw, self.dim), dtype=np.float32)
            retry[: bad.size] = queries_f32[bad]
            s3, p3 = self._dense_fn(
                jnp.asarray(retry, dtype=self._query_dtype),
                top_k,
                self.corpus,
                self._scales,
            )
            positions[bad] = np.asarray(p3)[: bad.size]
            dense_scores = np.asarray(s3)[: bad.size]
        self.last_certified_stats = stats
        if exact_scores:
            # exact-score epilogue over the whole (padded) batch, then
            # re-sort rows descending (quantum ties are key-misordered)
            exact = np.asarray(
                self._exact_at_fn(
                    queries_dev,
                    jnp.asarray(positions),
                    self.corpus,
                    self._scales,
                )
            )
            order = np.argsort(-exact, axis=-1, kind="stable")
            scores = np.take_along_axis(exact, order, axis=-1)
            positions = np.take_along_axis(positions, order, axis=-1)
        else:
            # zero-cost decode: host bitcast of the (already descending)
            # keys back to quantized-floor scores; dense-fallback rows
            # keep their exact dense scores
            idx_mask = np.int32((1 << (idx_bits + merge_levels)) - 1)
            keyf = (keys & ~idx_mask).view(np.float32)
            scores = (keyf - 1.5) * (float(bound) / 0.25)
            if dense_scores is not None:
                scores[bad] = dense_scores
        scores = scores[:true_batch]
        positions = positions[:true_batch]
        return scores, self.ids[positions]

    def search(
        self,
        queries: np.ndarray | Array,
        *,
        top_k: int,
        exclude_ids: list[list[int]] | None = None,
        exclude_positions: np.ndarray | Array | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched search. Returns (scores (B, k), item_ids (B, k))."""
        queries = jnp.asarray(queries, dtype=self._query_dtype)
        if queries.ndim == 1:
            queries = queries[None, :]
        if exclude_positions is None:
            if exclude_ids is not None:
                exclude_positions = jnp.asarray(self.positions_of(exclude_ids))
            else:
                exclude_positions = jnp.full(
                    (queries.shape[0], 1), len(self.ids), dtype=jnp.int32
                )
        if self.method == "scan" and self.scan_kernel == "packed":
            # score bound ON DEVICE: a host qnorm here would force a
            # device->host sync per call and serialize async eval
            # pipelines (queries often arrive as live device arrays)
            qnorm = jnp.max(
                jnp.linalg.norm(queries.astype(jnp.float32), axis=-1)
            )
            bound = jnp.maximum(
                self._corpus_maxnorm * qnorm * 1.05, 1e-6
            ).astype(jnp.float32)
            scores, positions = self._search_fn(
                queries,
                exclude_positions,
                top_k,
                bound,
                self._corpus_arg,
                self._scales_arg,
            )
        else:
            scores, positions = self._search_fn(
                queries,
                exclude_positions,
                top_k,
                self._corpus_arg,
                self._scales_arg,
            )
        item_ids = np.asarray(self._ids_dev)[np.asarray(positions)]
        return np.asarray(scores), item_ids

    # -- catalog mutation ---------------------------------------------------
    def _invalidate_compiled(self) -> None:
        """Drop every closure that baked the old corpus geometry.

        The scan/certified/guaranteed entry points capture
        (corpus_tile, true_num_items) as compile-time constants; after a
        catalog mutation they must be rebuilt (the next search pays one
        recompile). `_dense_fn` takes the corpus as a traced argument and
        is shape-polymorphic via retrace, so it survives. The lazy BM25
        index is rebuilt from the mutated metadata on next use.
        """
        for attr in (
            "_scan_state",
            "_certified_fn",
            "_guaranteed_fn",
            "_packed_fn",
            "_fts",
            "_fts_col",
        ):
            self.__dict__.pop(attr, None)
        self._build_search_fn()

    def _check_mutated_length(self, new_len: int) -> None:
        """Fail loud at MUTATION time when a chunked dense index would be
        left unsearchable: `exact_topk` requires num_items % chunk_size == 0
        (mips.py:79-81, only enforced when chunk_size < num_items), so an
        indivisible post-mutation length would succeed here and then raise
        on the next search. Batch adds/removes in multiples of chunk_size,
        or rebuild with chunk_size=None."""
        if (
            self.chunk_size is not None
            and new_len > self.chunk_size
            and new_len % self.chunk_size != 0
        ):
            msg = (
                f"mutation would leave {new_len} items, not divisible by "
                f"chunk_size={self.chunk_size}; the next chunked search "
                "would fail. Batch mutations to a multiple of chunk_size "
                "or rebuild the index with chunk_size=None."
            )
            raise ValueError(msg)

    def add_items(
        self,
        embeddings: np.ndarray,
        ids: np.ndarray | list[int],
        metadata: list[dict] | None = None,
    ) -> None:
        """Append items to the live index (mutable-catalog capability).

        The reference's LanceDB tables are mutable stores (its code
        rebuilds them wholesale at data/lightning.py:183-235, but the
        capability exists); the TPU-native equivalent appends rows to
        the HBM corpus and rebuilds the jitted search closures. Cost
        model: one device concat now + ONE XLA recompile on the next
        search (the padded corpus length is a compile-time constant) —
        amortize by batching catalog updates, not by calling this
        per item. int8 corpora quantize the new rows independently
        (per-item scales), so existing rows are untouched bit-for-bit.

        New ids must not collide with existing ones (fail-loud).

        Single-writer contract: mutation rebuilds the compiled closures
        in place and is NOT safe against searches running concurrently
        in other threads — quiesce traffic first, or mutate through
        `RecommenderEngine.add_items`, which publishes by atomic index
        swap instead.
        """
        emb = np.asarray(embeddings, dtype=np.float32)
        ids = np.asarray(ids)
        if emb.ndim != 2 or emb.shape[0] != len(ids):
            msg = "embeddings and ids must align"
            raise ValueError(msg)
        if emb.shape[0] == 0:
            return
        if emb.shape[1] != self.dim:
            msg = f"dim mismatch: corpus {self.dim}, new {emb.shape[1]}"
            raise ValueError(msg)
        if metadata is not None and len(metadata) != len(ids):
            msg = "metadata and ids must align"
            raise ValueError(msg)
        new_ids = [int(i) for i in ids.tolist()]
        if len(set(new_ids)) != len(new_ids):
            msg = "duplicate ids within the added batch"
            raise ValueError(msg)
        clashes = [i for i in new_ids if i in self._id_to_pos]
        if clashes:
            msg = f"ids already in the index: {clashes[:8]}"
            raise ValueError(msg)
        self._check_mutated_length(len(self.ids) + len(new_ids))
        if self.dtype == "int8":
            scale = np.maximum(np.abs(emb).max(axis=1) / 127.0, 1e-12)
            quant = np.clip(
                np.round(emb / scale[:, None]), -127, 127
            ).astype(np.int8)
            self.corpus = jnp.concatenate(
                [self.corpus, jnp.asarray(quant)], axis=0
            )
            self._scales = jnp.concatenate(
                [self._scales, jnp.asarray(scale.reshape(1, -1))], axis=1
            )
            added_maxnorm = float(
                (np.linalg.norm(quant.astype(np.float32), axis=1) * scale)
                .max(initial=0.0)
            )
        else:
            self.corpus = jnp.concatenate(
                [self.corpus, jnp.asarray(emb, dtype=self.corpus.dtype)],
                axis=0,
            )
            added_maxnorm = float(
                np.linalg.norm(emb, axis=1).max(initial=0.0)
            )
        self._corpus_maxnorm = max(self._corpus_maxnorm, added_maxnorm)
        base = len(self.ids)
        self.ids = np.concatenate([self.ids, ids])
        self.metadata = list(self.metadata) + (
            list(metadata) if metadata is not None else [{} for _ in new_ids]
        )
        for off, id_val in enumerate(new_ids):
            self._id_to_pos[id_val] = base + off
        self._ids_dev = jnp.asarray(self.ids.astype(np.int32))
        self._invalidate_compiled()

    def remove_items(self, ids: list[int] | np.ndarray) -> None:
        """Delete items from the live index by id (fail-loud on misses).

        Compacts the corpus (no tombstones: every remaining row stays a
        live scan candidate, positions shift). One host round-trip of
        the corpus + one recompile on the next search — same cost model
        as add_items, batch your deletes.
        """
        drop = {int(i) for i in np.asarray(ids).tolist()}
        missing = sorted(i for i in drop if i not in self._id_to_pos)
        if missing:
            msg = f"ids not in the index: {missing[:8]}"
            raise ValueError(msg)
        if not drop:
            return
        self._check_mutated_length(len(self.ids) - len(drop))
        keep = np.array(
            [int(i) not in drop for i in self.ids], dtype=bool
        )
        corpus_np = np.asarray(self.corpus)[keep]
        self.corpus = jnp.asarray(corpus_np)
        if self._scales is not None:
            self._scales = jnp.asarray(np.asarray(self._scales)[:, keep])
        # _corpus_maxnorm stays: removal cannot raise the max, so the old
        # value remains a valid upper bound — and keeping it bit-identical
        # keeps the packed-key quantum (bound/2^23) identical, so surviving
        # rows keep their exact keys (recomputing from the bf16-rounded
        # corpus would shift the quantum by ~1e-3 and swap near-ties)
        self.ids = self.ids[keep]
        self.metadata = [
            m for m, k in zip(self.metadata, keep, strict=True) if k
        ]
        self._id_to_pos = {int(i): p for p, i in enumerate(self.ids)}
        self._ids_dev = jnp.asarray(self.ids.astype(np.int32))
        self._invalidate_compiled()

    # -- persistence ------------------------------------------------------
    def save(self, path: str | pathlib.Path) -> None:
        path = pathlib.Path(path)
        path.mkdir(parents=True, exist_ok=True)
        if self._scales is not None:
            # dequantize: re-quantizing these exact values reproduces the
            # same int8 corpus (round is idempotent at the grid points)
            embeddings = np.asarray(
                self.corpus, dtype=np.float32
            ) * np.asarray(self._scales)[0][:, None]
        else:
            embeddings = np.asarray(self.corpus, dtype=np.float32)
        np.savez(
            path / "corpus.npz",
            embeddings=embeddings,
            ids=self.ids,
        )
        meta = {
            "id_col": self.id_col,
            "dtype": self.dtype,
            "chunk_size": self.chunk_size,
            "method": self.method,
            "scan_kernel": self.scan_kernel,
            "metadata": self.metadata,
        }
        (path / "index.json").write_text(json.dumps(meta))

    @classmethod
    def load(cls, path: str | pathlib.Path) -> RetrievalIndex:
        path = pathlib.Path(path)
        arrays = np.load(path / "corpus.npz", allow_pickle=False)
        meta = json.loads((path / "index.json").read_text())
        return cls(
            arrays["embeddings"],
            arrays["ids"],
            metadata=meta["metadata"],
            id_col=meta["id_col"],
            dtype=meta["dtype"],
            chunk_size=meta["chunk_size"],
            method=meta.get("method", "dense"),
            scan_kernel=meta.get("scan_kernel", "f32"),
        )
