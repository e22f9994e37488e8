"""Retrieval index: exact top-k, exclusions, chunked streaming, persistence."""

import numpy as np
import pytest

from xfmr_rec_tpu.index import RetrievalIndex, exact_topk


def make_corpus(n=64, d=8, seed=0):
    rng = np.random.default_rng(seed)
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    return corpus


class TestInt8Index:
    def _data(self, n=300, d=16, seed=21):
        rng = np.random.default_rng(seed)
        corpus = rng.normal(size=(n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
        queries = rng.normal(size=(8, d)).astype(np.float32)
        return corpus, queries

    def test_int8_matches_f32_ranking(self):
        corpus, queries = self._data()
        ids = np.arange(1, 301)
        f32 = RetrievalIndex(corpus, ids, dtype="float32", method="scan")
        i8 = RetrievalIndex(corpus, ids, dtype="int8")
        assert i8.method == "scan"
        assert i8.corpus.dtype == np.int8
        _, ids_f = f32.search(queries, top_k=10)
        _, ids_q = i8.search(queries, top_k=10)
        # quantization error ~<1%: near-total top-k overlap
        overlap = np.mean(
            [
                len(set(a.tolist()) & set(b.tolist())) / 10
                for a, b in zip(ids_f, ids_q)
            ]
        )
        assert overlap >= 0.9

    def test_int8_scores_match_dequantized_oracle(self):
        corpus, queries = self._data()
        i8 = RetrievalIndex(corpus, np.arange(1, 301), dtype="int8")
        scores, got_ids = i8.search(queries[:2], top_k=5)
        dequant = (
            np.asarray(i8.corpus, dtype=np.float32)
            * np.asarray(i8._scales)[0][:, None]
        )
        ref = queries[:2].astype(np.float32) @ dequant.T
        for b in range(2):
            want = np.sort(ref[b])[::-1][:5]
            np.testing.assert_allclose(scores[b], want, rtol=2e-2)

    def test_int8_certified_exact_over_quantized(self):
        corpus, queries = self._data()
        i8 = RetrievalIndex(corpus, np.arange(1, 301), dtype="int8")
        scores, ids_q = i8.search_certified(queries, top_k=7)
        dequant = (
            np.asarray(i8.corpus, dtype=np.float32)
            * np.asarray(i8._scales)[0][:, None]
        )
        ref = queries @ dequant.T
        for b in range(8):
            want = np.sort(ref[b])[::-1][:7]
            np.testing.assert_allclose(scores[b], want, rtol=2e-2)

    def test_int8_exclusions(self):
        corpus, queries = self._data()
        i8 = RetrievalIndex(corpus, np.arange(1, 301), dtype="int8")
        _, base_ids = i8.search(queries[:4], top_k=5)
        exclude = [row[:2].tolist() for row in base_ids]
        _, ids2 = i8.search(queries[:4], top_k=5, exclude_ids=exclude)
        for b in range(4):
            assert not set(exclude[b]) & set(ids2[b].tolist())

    def test_int8_retry_path_certifies_collisions(self):
        """Plant identity-lane collisions so the shuffled retry pass runs
        with scales; results must match the dequantized oracle."""
        rng = np.random.default_rng(23)
        corpus = rng.normal(size=(256, 8)).astype(np.float32) * 0.01
        queries = rng.normal(size=(8, 8)).astype(np.float32)
        for i in range(8):
            corpus[i] = queries[i] * 10
            corpus[i + 128] = queries[i] * 9  # same lane at ct=128
        i8 = RetrievalIndex(corpus, np.arange(1, 257), dtype="int8")
        scores, ids = i8.search_certified(queries, top_k=5)
        dequant = (
            np.asarray(i8.corpus, dtype=np.float32)
            * np.asarray(i8._scales)[0][:, None]
        )
        ref = queries @ dequant.T
        for b in range(8):
            want = np.sort(ref[b])[::-1][:5]
            np.testing.assert_allclose(scores[b], want, rtol=2e-2)

    def test_int8_dense_fallback_branch(self):
        """Exercise the int8 dequantizing dense path directly (the live
        escalation almost never reaches it)."""
        corpus, queries = self._data()
        i8 = RetrievalIndex(corpus, np.arange(1, 301), dtype="int8")
        i8.search_certified(queries[:2], top_k=3)  # builds _dense_fn
        import jax.numpy as jnp

        s, p = i8._dense_fn(
            jnp.asarray(queries[:2], dtype=i8._query_dtype),
            3,
            i8.corpus,
            i8._scales,
        )
        dequant = (
            np.asarray(i8.corpus, dtype=np.float32)
            * np.asarray(i8._scales)[0][:, None]
        )
        ref = queries[:2].astype(np.float32) @ dequant.T
        for b in range(2):
            np.testing.assert_allclose(
                np.asarray(s[b]), np.sort(ref[b])[::-1][:3], rtol=2e-2
            )

    def test_int8_save_load_roundtrip(self, tmp_path):
        corpus, queries = self._data()
        idx = RetrievalIndex(corpus, np.arange(1, 301), dtype="int8")
        idx.save(tmp_path / "i8")
        loaded = RetrievalIndex.load(tmp_path / "i8")
        assert loaded.corpus.dtype == np.int8
        # requantizing the dequantized artifact is lossless
        np.testing.assert_array_equal(
            np.asarray(idx.corpus), np.asarray(loaded.corpus)
        )
        np.testing.assert_array_equal(
            idx.search(queries, top_k=5)[1],
            loaded.search(queries, top_k=5)[1],
        )


class TestPackedCertified:
    """search_certified(method='packed'): key-space escalation."""

    def _data(self, n=512, d=16, b=16, seed=31):
        rng = np.random.default_rng(seed)
        corpus = rng.normal(size=(n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
        queries = rng.normal(size=(b, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
        return corpus, queries

    def test_matches_dense_top_k_decoded(self):
        corpus, queries = self._data()
        idx = RetrievalIndex(
            corpus, np.arange(1, 513), dtype="float32", method="scan"
        )
        scores, ids = idx.search_certified(queries, top_k=7, method="packed")
        ref = queries @ corpus.T
        for b in range(queries.shape[0]):
            pos = ids[b] - 1
            # decoded scores: quantum floor of the true score
            np.testing.assert_allclose(scores[b], ref[b][pos], atol=1e-4)
            assert (scores[b] <= ref[b][pos] + 1e-6).all()
            assert (np.diff(scores[b]) <= 1e-6).all()
            # score multiset == dense top-k within the key quantum
            want = np.sort(ref[b])[::-1][:7]
            np.testing.assert_allclose(scores[b], want, atol=1e-4)

    def test_matches_dense_top_k_exact_scores(self):
        corpus, queries = self._data(seed=32)
        idx = RetrievalIndex(
            corpus, np.arange(1, 513), dtype="float32", method="scan"
        )
        scores, ids = idx.search_certified(
            queries, top_k=7, method="packed", exact_scores=True
        )
        ref = queries @ corpus.T
        for b in range(queries.shape[0]):
            pos = ids[b] - 1
            # exact f32 scores for the returned items
            np.testing.assert_allclose(
                scores[b], ref[b][pos], rtol=1e-5, atol=1e-5
            )
            assert (np.diff(scores[b]) <= 1e-6).all()
            want = np.sort(ref[b])[::-1][:7]
            np.testing.assert_allclose(scores[b], want, atol=1e-4)

    def test_planted_collisions_still_exact(self):
        """Force identity-lane collisions so retries (and possibly the
        dense fallback) run; result must still match dense."""
        rng = np.random.default_rng(33)
        corpus = rng.normal(size=(256, 8)).astype(np.float32) * 0.01
        queries = rng.normal(size=(8, 8)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
        for i in range(8):
            corpus[i] = queries[i] * 0.9
            corpus[i + 128] = queries[i] * 0.8  # same lane at ct=128
        idx = RetrievalIndex(
            corpus, np.arange(1, 257), dtype="float32", method="scan"
        )
        scores, ids = idx.search_certified(queries, top_k=5, method="packed")
        ref = queries @ corpus.T
        for b in range(8):
            want = np.sort(ref[b])[::-1][:5]
            np.testing.assert_allclose(scores[b], want, atol=1e-4)

    def test_int8_packed_matches_dequantized_oracle(self):
        corpus, queries = self._data(n=256, b=8, seed=35)
        i8 = RetrievalIndex(corpus, np.arange(1, 257), dtype="int8")
        scores, ids = i8.search_certified(queries, top_k=5, method="packed")
        dequant = (
            np.asarray(i8.corpus, dtype=np.float32)
            * np.asarray(i8._scales)[0][:, None]
        )
        ref = queries @ dequant.T
        for b in range(8):
            want = np.sort(ref[b])[::-1][:5]
            np.testing.assert_allclose(scores[b], want, rtol=2e-2)

    def test_unnormalized_embeddings_bound(self):
        """Non-unit norms exercise the max-norm score bound."""
        rng = np.random.default_rng(37)
        corpus = rng.normal(size=(256, 8)).astype(np.float32) * 3.0
        queries = rng.normal(size=(4, 8)).astype(np.float32) * 2.0
        idx = RetrievalIndex(
            corpus, np.arange(1, 257), dtype="float32", method="scan"
        )
        scores, ids = idx.search_certified(queries, top_k=5, method="packed")
        ref = queries @ corpus.T
        for b in range(4):
            want = np.sort(ref[b])[::-1][:5]
            # bf16 queries/corpus: ~0.8% relative matmul error at d=8
            np.testing.assert_allclose(scores[b], want, rtol=3e-2)

    def test_unknown_method_raises(self):
        corpus, queries = self._data(n=64, b=2)
        idx = RetrievalIndex(corpus, np.arange(1, 65), dtype="float32")
        with pytest.raises(ValueError, match="method"):
            idx.search_certified(queries, top_k=3, method="nope")


class TestTextSearch:
    def _index(self):
        corpus = make_corpus(4, 8)
        meta = [
            {"movie_text": "Toy Story animation children comedy"},
            {"movie_text": "Heat crime thriller"},
            {"movie_text": "Toy soldiers war drama"},
            {"movie_text": "Story of a crime family drama"},
        ]
        return RetrievalIndex(
            corpus, np.arange(1, 5), meta, id_col="movie_id", dtype="float32"
        )

    def test_bm25_ranks_full_match_first(self):
        idx = self._index()
        out = idx.search_text("toy story", top_k=4)
        assert out[0]["movie_id"] == 1  # matches both terms
        got_ids = [r["movie_id"] for r in out]
        assert set(got_ids) >= {1, 3, 4}  # partial matches follow
        assert all(
            a["score"] >= b["score"] for a, b in zip(out, out[1:])
        )

    def test_no_match_returns_empty(self):
        idx = self._index()
        assert idx.search_text("zebra") == []

    def test_rare_term_beats_common(self):
        idx = self._index()
        out = idx.search_text("thriller drama", top_k=4)
        # 'thriller' appears once in the corpus -> higher idf than 'drama'
        assert out[0]["movie_id"] == 2


class TestExactTopK:
    def test_matches_numpy_argsort(self):
        corpus = make_corpus()
        queries = make_corpus(5, 8, seed=1)
        scores, positions = exact_topk(queries, corpus, 10)
        ref_scores = queries @ corpus.T
        for i in range(5):
            want = np.argsort(-ref_scores[i])[:10]
            np.testing.assert_array_equal(np.asarray(positions[i]), want)
            np.testing.assert_allclose(
                np.asarray(scores[i]), ref_scores[i][want], rtol=1e-5
            )

    def test_exclusions(self):
        corpus = make_corpus()
        queries = make_corpus(3, 8, seed=2)
        full_scores = queries @ corpus.T
        best = np.argmax(full_scores, axis=-1)
        exclude = np.stack([best, np.full(3, 64)], axis=1).astype(np.int32)
        _, positions = exact_topk(
            queries, corpus, 10, exclude_positions=exclude
        )
        for i in range(3):
            assert best[i] not in np.asarray(positions[i])

    def test_padding_position_is_noop(self):
        corpus = make_corpus()
        queries = make_corpus(3, 8, seed=3)
        pad = np.full((3, 4), 64, dtype=np.int32)  # all out-of-range
        s1, p1 = exact_topk(queries, corpus, 5, exclude_positions=pad)
        s2, p2 = exact_topk(queries, corpus, 5)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    @pytest.mark.parametrize("chunk", [16, 32])
    def test_chunked_matches_dense(self, chunk):
        corpus = make_corpus(64, 8)
        queries = make_corpus(4, 8, seed=4)
        exclude = np.array(
            [[0, 64], [5, 64], [64, 64], [10, 11]], dtype=np.int32
        )
        s_dense, p_dense = exact_topk(
            queries, corpus, 7, exclude_positions=exclude
        )
        s_chunk, p_chunk = exact_topk(
            queries, corpus, 7, exclude_positions=exclude, chunk_size=chunk
        )
        np.testing.assert_array_equal(np.asarray(p_dense), np.asarray(p_chunk))
        np.testing.assert_allclose(
            np.asarray(s_dense), np.asarray(s_chunk), rtol=1e-5
        )


class TestRetrievalIndex:
    @pytest.fixture(scope="class")
    def index(self):
        corpus = make_corpus(32, 8)
        ids = np.arange(1, 33)  # item ids start at 1
        meta = [{"text": f"item-{i}"} for i in ids]
        return RetrievalIndex(corpus, ids, meta, id_col="movie_id")

    def test_search_returns_ids(self, index):
        queries = make_corpus(2, 8, seed=5)
        scores, item_ids = index.search(queries, top_k=5)
        assert scores.shape == (2, 5)
        assert item_ids.shape == (2, 5)
        assert (item_ids >= 1).all() and (item_ids <= 32).all()
        # descending scores
        assert (np.diff(scores, axis=-1) <= 1e-6).all()

    def test_search_excludes_by_id(self, index):
        queries = make_corpus(2, 8, seed=6)
        _, base = index.search(queries, top_k=3)
        exclude = [list(base[0]), []]
        _, got = index.search(queries, top_k=3, exclude_ids=exclude)
        assert not set(base[0]) & set(got[0])
        np.testing.assert_array_equal(got[1], base[1])

    def test_single_query_vector(self, index):
        scores, ids = index.search(make_corpus(1, 8, seed=7)[0], top_k=4)
        assert scores.shape == (1, 4)

    def test_get_id(self, index):
        row = index.get_id(3)
        assert row["movie_id"] == 3
        assert row["text"] == "item-3"
        assert index.get_id(999) == {}
        assert index.get_id(None) == {}

    def test_save_load_roundtrip(self, index, tmp_path):
        index.save(tmp_path / "idx")
        loaded = RetrievalIndex.load(tmp_path / "idx")
        queries = make_corpus(2, 8, seed=8)
        s1, i1 = index.search(queries, top_k=5)
        s2, i2 = loaded.search(queries, top_k=5)
        np.testing.assert_array_equal(i1, i2)
        assert loaded.get_id(3)["text"] == "item-3"


class TestMetrics:
    def test_perfect_predictions(self):
        from xfmr_rec_tpu.training.metrics import retrieval_metrics

        # user 0: targets [1,2] predicted first — perfect
        pred = np.array([[1, 2, 9, 8, 7]])
        tgt = np.array([[1, 2, 0]])
        ratings = np.array([[5.0, 4.0, 0.0]])
        m = retrieval_metrics(pred, tgt, ratings, top_k=5)
        assert float(m["RetrievalRecall"]) == 1.0
        assert float(m["RetrievalHitRate"]) == 1.0
        assert float(m["RetrievalMRR"]) == 1.0
        np.testing.assert_allclose(float(m["RetrievalNormalizedDCG"]), 1.0)
        np.testing.assert_allclose(float(m["RetrievalMAP"]), 1.0)
        np.testing.assert_allclose(float(m["RetrievalPrecision"]), 0.4)

    def test_no_hits(self):
        from xfmr_rec_tpu.training.metrics import retrieval_metrics

        pred = np.array([[7, 8, 9]])
        tgt = np.array([[1, 2, 0]])
        ratings = np.array([[5.0, 4.0, 0.0]])
        m = retrieval_metrics(pred, tgt, ratings, top_k=3)
        for name in ("RetrievalRecall", "RetrievalNormalizedDCG",
                     "RetrievalMRR", "RetrievalMAP", "RetrievalHitRate"):
            assert float(m[name]) == 0.0

    def test_hand_computed_case(self):
        from xfmr_rec_tpu.training.metrics import retrieval_metrics

        # k=3; targets {1 (r=3), 4 (r=1)}; preds [9, 1, 4]
        pred = np.array([[9, 1, 4]])
        tgt = np.array([[1, 4, 0, 0]])
        ratings = np.array([[3.0, 1.0, 0.0, 0.0]])
        m = retrieval_metrics(pred, tgt, ratings, top_k=3)
        # DCG = 3/log2(3) + 1/log2(4) = 3/1.58496 + 0.5
        dcg = 3 / np.log2(3) + 1 / np.log2(4)
        idcg = 3 / np.log2(2) + 1 / np.log2(3)
        np.testing.assert_allclose(
            float(m["RetrievalNormalizedDCG"]), dcg / idcg, rtol=1e-5
        )
        np.testing.assert_allclose(float(m["RetrievalRecall"]), 1.0)
        np.testing.assert_allclose(float(m["RetrievalPrecision"]), 2 / 3)
        np.testing.assert_allclose(float(m["RetrievalMRR"]), 0.5)
        # AP = (prec@2 * 1 + prec@3 * 1) / min(3, 2) = (1/2 + 2/3)/2
        np.testing.assert_allclose(
            float(m["RetrievalMAP"]), (0.5 + 2 / 3) / 2, rtol=1e-5
        )

    def test_invalid_users_excluded_from_mean(self):
        from xfmr_rec_tpu.training.metrics import retrieval_metrics

        pred = np.array([[1, 2], [3, 4]])
        tgt = np.array([[1, 0], [0, 0]])  # user 1 has no targets
        ratings = np.array([[5.0, 0.0], [0.0, 0.0]])
        m = retrieval_metrics(pred, tgt, ratings, top_k=2)
        assert float(m["RetrievalRecall"]) == 1.0  # only user 0 counts

    def test_prefix(self):
        from xfmr_rec_tpu.training.metrics import retrieval_metrics

        m = retrieval_metrics(
            np.array([[1]]), np.array([[1]]), np.array([[1.0]]),
            top_k=1, prefix="val/",
        )
        assert "val/RetrievalNormalizedDCG" in m


class TestPackedScanKernel:
    """RetrievalIndex(scan_kernel='packed'): the search hot path on the
    packed sweep."""

    def _data(self, n=512, d=16, b=8, seed=61):
        rng = np.random.default_rng(seed)
        corpus = rng.normal(size=(n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
        queries = rng.normal(size=(b, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
        return corpus, queries

    def test_matches_f32_kernel_sets(self):
        corpus, queries = self._data()
        ids = np.arange(1, 513)
        f32 = RetrievalIndex(corpus, ids, dtype="float32", method="scan")
        pk = RetrievalIndex(
            corpus, ids, dtype="float32", method="scan",
            scan_kernel="packed",
        )
        _, want = f32.search(queries, top_k=7)
        scores, got = pk.search(queries, top_k=7)
        ref = queries @ corpus.T
        for b in range(8):
            # same id sets modulo quantum ties: compare true-score sets
            ws = np.sort(ref[b][want[b] - 1])
            gs = np.sort(ref[b][got[b] - 1])
            np.testing.assert_allclose(gs, ws, atol=1e-4)
            # decoded scores are quantum floors of the true scores
            assert (
                np.sort(scores[b])[::-1]
                <= np.sort(ref[b][got[b] - 1])[::-1] + 1e-6
            ).all()

    def test_exclusions_respected(self):
        corpus, queries = self._data(seed=62)
        pk = RetrievalIndex(
            corpus, np.arange(1, 513), dtype="float32", method="scan",
            scan_kernel="packed",
        )
        _, base = pk.search(queries[:4], top_k=5)
        exclude = [row[:3].tolist() for row in base]
        _, got = pk.search(queries[:4], top_k=5, exclude_ids=exclude)
        for b in range(4):
            assert not set(exclude[b]) & set(got[b].tolist())

    def test_int8_packed_scan(self):
        corpus, queries = self._data(seed=63)
        pk = RetrievalIndex(
            corpus, np.arange(1, 513), dtype="int8",
            scan_kernel="packed",
        )
        scores, ids = pk.search(queries, top_k=5)
        dequant = (
            np.asarray(pk.corpus, np.float32)
            * np.asarray(pk._scales)[0][:, None]
        )
        ref = queries @ dequant.T
        for b in range(8):
            want = np.sort(ref[b])[::-1][:5]
            got = np.sort(ref[b][ids[b] - 1])[::-1]
            np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-3)

    def test_unknown_scan_kernel_raises(self):
        corpus, _ = self._data()
        with pytest.raises(ValueError, match="scan_kernel"):
            RetrievalIndex(
                corpus, np.arange(1, 513), scan_kernel="magic"
            )

    def test_scan_kernel_persists_through_save_load(self, tmp_path):
        corpus, queries = self._data(seed=64)
        pk = RetrievalIndex(
            corpus, np.arange(1, 513), dtype="float32", method="scan",
            scan_kernel="packed",
        )
        pk.save(tmp_path / "pk")
        loaded = RetrievalIndex.load(tmp_path / "pk")
        assert loaded.scan_kernel == "packed"
        np.testing.assert_array_equal(
            pk.search(queries, top_k=5)[1],
            loaded.search(queries, top_k=5)[1],
        )


class TestMutableCatalog:
    """add_items/remove_items: the live index must equal a fresh build."""

    def _data(self, n=200, extra=40, d=16, seed=33):
        rng = np.random.default_rng(seed)
        corpus = rng.normal(size=(n + extra, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
        queries = rng.normal(size=(6, d)).astype(np.float32)
        return corpus[:n], corpus[n:], queries

    @pytest.mark.parametrize("dtype,method", [
        ("bfloat16", "dense"),
        ("float32", "scan"),
        ("int8", "scan"),
    ])
    def test_add_matches_fresh_build(self, dtype, method):
        base, extra, queries = self._data()
        n = len(base)
        idx = RetrievalIndex(
            base, np.arange(1, n + 1), dtype=dtype, method=method
        )
        idx.search(queries, top_k=5)  # compile + cache the old geometry
        idx.add_items(
            extra,
            np.arange(n + 1, n + 1 + len(extra)),
            metadata=[{"title": f"new-{i}"} for i in range(len(extra))],
        )
        fresh = RetrievalIndex(
            np.concatenate([base, extra]),
            np.arange(1, n + 1 + len(extra)),
            dtype=dtype,
            method=method,
        )
        s_mut, ids_mut = idx.search(queries, top_k=10)
        s_ref, ids_ref = fresh.search(queries, top_k=10)
        np.testing.assert_array_equal(ids_mut, ids_ref)
        np.testing.assert_allclose(s_mut, s_ref, rtol=1e-3, atol=1e-3)
        # metadata surface reflects the mutation
        assert idx.get_id(n + 1)["title"] == "new-0"
        assert len(idx) == n + len(extra)

    def test_added_items_are_retrievable(self):
        base, extra, _ = self._data()
        n = len(base)
        idx = RetrievalIndex(base, np.arange(1, n + 1), dtype="float32")
        idx.add_items(extra, np.arange(n + 1, n + 1 + len(extra)))
        # query WITH an added item's own embedding: it must rank first
        s, ids = idx.search(extra[:3], top_k=1)
        np.testing.assert_array_equal(ids[:, 0], [n + 1, n + 2, n + 3])

    def test_remove_matches_fresh_build(self):
        base, _, queries = self._data()
        n = len(base)
        idx = RetrievalIndex(
            base, np.arange(1, n + 1), dtype="float32", method="scan"
        )
        idx.search(queries, top_k=5)
        drop = [3, 50, 199]
        idx.remove_items(drop)
        keep = np.array([i not in drop for i in range(1, n + 1)])
        fresh = RetrievalIndex(
            base[keep], np.arange(1, n + 1)[keep],
            dtype="float32", method="scan",
        )
        s_mut, ids_mut = idx.search(queries, top_k=10)
        s_ref, ids_ref = fresh.search(queries, top_k=10)
        np.testing.assert_array_equal(ids_mut, ids_ref)
        np.testing.assert_allclose(s_mut, s_ref, rtol=1e-3, atol=1e-3)
        assert idx.get_id(3) == {}
        assert len(idx) == n - 3

    def test_remove_int8_keeps_scales_aligned(self):
        base, _, queries = self._data()
        n = len(base)
        idx = RetrievalIndex(base, np.arange(1, n + 1), dtype="int8")
        idx.remove_items([1, 2])
        fresh = RetrievalIndex(
            base[2:], np.arange(3, n + 1), dtype="int8"
        )
        np.testing.assert_array_equal(
            idx.search(queries, top_k=8)[1],
            fresh.search(queries, top_k=8)[1],
        )

    def test_certified_search_after_add(self):
        base, extra, queries = self._data()
        n = len(base)
        idx = RetrievalIndex(
            base, np.arange(1, n + 1), dtype="float32", method="scan",
            scan_kernel="packed",
        )
        idx.search_certified(queries, top_k=5, method="packed")
        idx.add_items(extra, np.arange(n + 1, n + 1 + len(extra)))
        s, ids = idx.search_certified(
            queries, top_k=5, method="packed", exact_scores=True
        )
        ref = queries @ np.concatenate([base, extra]).T
        for b in range(len(queries)):
            np.testing.assert_allclose(
                np.sort(s[b])[::-1], np.sort(ref[b])[::-1][:5],
                rtol=1e-2, atol=1e-2,
            )

    def test_fail_loud(self):
        base, extra, _ = self._data()
        n = len(base)
        idx = RetrievalIndex(base, np.arange(1, n + 1))
        with pytest.raises(ValueError, match="already in the index"):
            idx.add_items(extra[:1], [1])
        with pytest.raises(ValueError, match="duplicate ids"):
            idx.add_items(extra[:2], [n + 1, n + 1])
        with pytest.raises(ValueError, match="dim mismatch"):
            idx.add_items(extra[:1, :8], [n + 1])
        with pytest.raises(ValueError, match="not in the index"):
            idx.remove_items([99999])
        with pytest.raises(ValueError, match="must align"):
            idx.add_items(extra[:2], [n + 1, n + 2], metadata=[{}])

    def test_chunked_mutation_guard(self):
        """Mutating a chunked dense index must fail at MUTATION time when
        the new length is indivisible by chunk_size (the next search
        would otherwise raise, leaving a live index unsearchable)."""
        base, extra, queries = self._data()
        n = len(base)  # 200; chunked path needs num_items % chunk == 0
        chunk = len(extra)  # 40 divides 200 and 240
        idx = RetrievalIndex(base, np.arange(1, n + 1), chunk_size=chunk)
        with pytest.raises(ValueError, match="chunk_size"):
            idx.add_items(extra[:1], [n + 1])
        with pytest.raises(ValueError, match="chunk_size"):
            idx.remove_items([1])
        # index untouched and still searchable after the refusals
        assert len(idx) == n
        idx.search(queries, top_k=4)
        # a divisible mutation is allowed
        idx.add_items(
            extra[:chunk], np.arange(n + 1, n + 1 + chunk)
        )
        assert len(idx) == n + chunk
        idx.search(queries, top_k=4)

    def test_save_load_after_mutation(self, tmp_path):
        base, extra, queries = self._data()
        n = len(base)
        idx = RetrievalIndex(base, np.arange(1, n + 1), dtype="bfloat16")
        idx.add_items(extra, np.arange(n + 1, n + 1 + len(extra)))
        idx.remove_items([5])
        idx.save(tmp_path / "mut")
        loaded = RetrievalIndex.load(tmp_path / "mut")
        assert len(loaded) == n + len(extra) - 1
        np.testing.assert_array_equal(
            idx.search(queries, top_k=10)[1],
            loaded.search(queries, top_k=10)[1],
        )

    def test_bm25_rebuilds_after_add(self):
        base, extra, _ = self._data()
        n = len(base)
        idx = RetrievalIndex(
            base,
            np.arange(1, n + 1),
            metadata=[{"text": f"movie number {i}"} for i in range(n)],
        )
        assert idx.search_text("zebra", top_k=3) == []
        idx.add_items(
            extra[:1], [n + 1], metadata=[{"text": "the zebra film"}]
        )
        hits = idx.search_text("zebra", top_k=3)
        assert hits and hits[0]["id"] == n + 1
