"""IVF probe index: clustering, recall-vs-nprobe, exactness at full probe."""

import numpy as np
import pytest

from xfmr_rec_tpu.index.ivf import IVFIndex, kmeans


def normed(n, d, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestKMeans:
    def test_separable_clusters_recovered(self):
        rng = np.random.default_rng(1)
        centers = normed(3, 16, seed=2) * 10
        points = np.concatenate(
            [
                centers[i] + 0.05 * rng.normal(size=(40, 16))
                for i in range(3)
            ]
        ).astype(np.float32)
        points /= np.linalg.norm(points, axis=-1, keepdims=True)
        import jax.numpy as jnp

        _, assign = kmeans(jnp.asarray(points), 3, iters=8, tile=64)
        assign = np.asarray(assign)
        # every ground-truth group lands in one cluster
        for i in range(3):
            group = assign[i * 40 : (i + 1) * 40]
            assert (group == group[0]).all()

    def test_empty_cluster_keeps_centroid(self):
        import jax.numpy as jnp

        pts = normed(8, 8, seed=3)
        cents, assign = kmeans(jnp.asarray(pts), 8, iters=3, tile=8)
        assert np.isfinite(np.asarray(cents)).all()


class TestIVFIndex:
    @pytest.fixture(scope="class")
    def data(self):
        corpus = normed(512, 16, seed=4)
        queries = normed(16, 16, seed=5)
        return corpus, queries

    def test_full_probe_matches_exact(self, data):
        from xfmr_rec_tpu.index import exact_topk

        corpus, queries = data
        idx = IVFIndex(
            corpus, np.arange(1, 513), num_clusters=16, dtype="float32"
        )
        scores, ids = idx.search(queries, top_k=10, nprobe=16)
        want_s, want_p = exact_topk(queries, corpus, 10)
        for b in range(16):
            np.testing.assert_array_equal(
                ids[b], np.asarray(want_p[b]) + 1
            )
            np.testing.assert_allclose(
                scores[b], np.asarray(want_s[b]), rtol=1e-5, atol=1e-5
            )

    def test_recall_rises_with_nprobe(self, data):
        from xfmr_rec_tpu.index import exact_topk

        corpus, queries = data
        idx = IVFIndex(
            corpus, np.arange(1, 513), num_clusters=32, dtype="float32"
        )
        _, want_p = exact_topk(queries, corpus, 10)
        want_sets = [
            set((np.asarray(want_p[b]) + 1).tolist()) for b in range(16)
        ]

        def recall(nprobe):
            _, ids = idx.search(queries, top_k=10, nprobe=nprobe)
            return np.mean(
                [
                    len(set(ids[b].tolist()) & want_sets[b]) / 10
                    for b in range(16)
                ]
            )

        r2, r8, r32 = recall(2), recall(8), recall(32)
        assert r2 <= r8 + 1e-9 <= r32 + 2e-9
        assert r32 == 1.0
        assert r8 >= 0.6  # reference default nprobe

    def test_single_query_vector(self, data):
        corpus, queries = data
        idx = IVFIndex(
            corpus, np.arange(1, 513), num_clusters=16, dtype="float32"
        )
        scores, ids = idx.search(queries[0], top_k=5)
        assert scores.shape == (1, 5)
        assert (np.diff(scores[0]) <= 1e-6).all()

    def test_padding_surfaces_as_minus_one(self):
        corpus = normed(6, 8, seed=6)
        idx = IVFIndex(
            corpus, np.arange(1, 7), num_clusters=4, dtype="float32"
        )
        scores, ids = idx.search(normed(2, 8, seed=7), top_k=5, nprobe=1)
        # a single probed cluster holds < 5 items: padding rows are -1
        # with -inf scores, real rows lead
        for b in range(2):
            real = ids[b] != -1
            assert real.any()
            assert np.isneginf(scores[b][~real]).all()

    def test_save_load_roundtrip(self, data, tmp_path):
        corpus, queries = data
        idx = IVFIndex(
            corpus, np.arange(1, 513), num_clusters=16, dtype="float32"
        )
        idx.save(tmp_path / "ivf")
        loaded = IVFIndex.load(tmp_path / "ivf")
        s1, i1 = idx.search(queries, top_k=5, nprobe=16)
        s2, i2 = loaded.search(queries, top_k=5, nprobe=16)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, rtol=1e-5)

    def test_default_nlist_heuristic(self):
        corpus = normed(400, 8, seed=8)
        idx = IVFIndex(corpus, np.arange(400), dtype="float32")
        # 4 * sqrt(400) = 80
        assert idx.num_clusters == 80

    def test_exclusions_not_in_prefilter(self, data):
        corpus, queries = data
        idx = IVFIndex(
            corpus, np.arange(1, 513), num_clusters=16, dtype="float32"
        )
        _, base = idx.search(queries[:4], top_k=3, nprobe=16)
        exclude = [row.tolist() for row in base]
        _, got = idx.search(
            queries[:4], top_k=3, nprobe=16, exclude_ids=exclude
        )
        for b in range(4):
            assert not set(exclude[b]) & set(got[b].tolist())

    def test_exclusion_unknown_ids_noop(self, data):
        corpus, queries = data
        idx = IVFIndex(
            corpus, np.arange(1, 513), num_clusters=16, dtype="float32"
        )
        _, base = idx.search(queries[:2], top_k=3, nprobe=16)
        _, got = idx.search(
            queries[:2], top_k=3, nprobe=16,
            exclude_ids=[[99999], []],
        )
        np.testing.assert_array_equal(base, got)

    def test_spill_caps_bucket_on_skewed_corpus(self):
        """One dominant direction -> one hot cluster; spill keeps the
        dense bucket width near the cap and full probe stays exact."""
        from xfmr_rec_tpu.index import exact_topk

        rng = np.random.default_rng(9)
        hot = normed(1, 16, seed=10)[0]
        corpus = np.concatenate(
            [
                hot + 0.02 * rng.normal(size=(300, 16)),
                rng.normal(size=(100, 16)),
            ]
        ).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
        idx = IVFIndex(
            corpus, np.arange(400), num_clusters=16, dtype="float32"
        )
        cap = int(np.ceil(4.0 * 400 / 16))  # spill_factor * mean
        assert idx.bucket_size <= cap
        queries = normed(8, 16, seed=11)
        scores, ids = idx.search(queries, top_k=10, nprobe=16)
        want_s, _ = exact_topk(queries, corpus, 10)
        np.testing.assert_allclose(
            scores, np.asarray(want_s), rtol=1e-5, atol=1e-5
        )

    def test_spill_disabled_keeps_raw_assignment(self):
        rng = np.random.default_rng(12)
        hot = normed(1, 8, seed=13)[0]
        corpus = np.concatenate(
            [
                hot + 0.02 * rng.normal(size=(60, 8)),
                rng.normal(size=(20, 8)),
            ]
        ).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
        capped = IVFIndex(
            corpus, np.arange(80), num_clusters=8, dtype="float32"
        )
        raw = IVFIndex(
            corpus, np.arange(80), num_clusters=8, dtype="float32",
            spill_factor=None,
        )
        assert raw.bucket_size >= capped.bucket_size


def clustered(n, d, centers=8, seed=0):
    rng = np.random.default_rng(seed)
    mu = normed(centers, d, seed=seed + 1)
    pts = mu[rng.integers(0, centers, n)] + 0.15 * rng.normal(
        size=(n, d)
    ).astype(np.float32)
    pts = pts.astype(np.float32)
    return pts / np.linalg.norm(pts, axis=-1, keepdims=True)


class TestRecallGuardrail:
    def test_recall_probe_high_on_clustered_corpus(self):
        corpus = clustered(600, 16, centers=6, seed=3)
        index = IVFIndex(
            corpus, np.arange(1, 601), num_clusters=12, nprobe=4, seed=0
        )
        recall = index.recall_probe(top_k=10, num_queries=64, seed=0)
        assert recall > 0.85

    def test_recall_probe_detects_unclusterable_corpus(self):
        corpus = normed(800, 32, seed=4)  # uniform: worst case for IVF
        index = IVFIndex(corpus, np.arange(1, 801), nprobe=1, seed=0)
        recall = index.recall_probe(top_k=10, num_queries=64, seed=0)
        # full probe would be 1.0; nprobe=1 on uniform must fall well below
        assert recall < 0.8

    def test_recall_probe_full_nprobe_is_perfect(self):
        corpus = normed(300, 16, seed=5)
        index = IVFIndex(
            corpus, np.arange(1, 301), nprobe=4, spill_factor=None, seed=0,
            dtype="float32",  # bf16 buckets re-order near-ties vs exact
        )
        recall = index.recall_probe(
            top_k=10, nprobe=index.num_clusters, num_queries=32, seed=1
        )
        assert recall == pytest.approx(1.0)


class TestSavedEmbeddingsPrecision:
    def test_save_persists_f32_not_bucket_dtype(self, tmp_path):
        corpus = normed(200, 24, seed=6)
        index = IVFIndex(corpus, np.arange(1, 201), dtype="bfloat16")
        index.save(tmp_path / "ivf")
        arrays = np.load(tmp_path / "ivf" / "ivf.npz")
        # byte-identical to the build-time f32 corpus (a reconstruction
        # from the bf16 buckets would round ~half the mantissa away)
        np.testing.assert_array_equal(arrays["embeddings"], corpus)


class TestCertifiedIVF:
    """Triangle-bound exactness certificates (index/ivf.py
    search_certified): on clustered corpora the probe PROVES
    exhaustive-exactness; on adversarial random corpora the bound is
    vacuous and rows stay uncertified — and every certified row must
    match the dense oracle regardless."""

    @staticmethod
    def _clustered_corpus(n=2000, d=16, centers=16, sigma=0.08, seed=0):
        rng = np.random.default_rng(seed)
        mus = rng.normal(size=(centers, d))
        mus /= np.linalg.norm(mus, axis=1, keepdims=True)
        assign = rng.integers(0, centers, n)
        x = mus[assign] + sigma * rng.normal(size=(n, d))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(np.float32), mus

    def test_certified_rows_match_dense_oracle_clustered(self):
        corpus, mus = self._clustered_corpus()
        index = IVFIndex(
            corpus, np.arange(len(corpus)), num_clusters=16, nprobe=4
        )
        rng = np.random.default_rng(1)
        queries = mus[rng.integers(0, len(mus), 32)] + 0.05 * rng.normal(
            size=(32, corpus.shape[1])
        )
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        queries = queries.astype(np.float32)
        scores, ids, exact = index.search_certified(queries, top_k=5)
        assert exact.any(), "tight clusters must certify some rows"
        dense = queries @ corpus.T
        from xfmr_rec_tpu.index.ivf import CERT_SLACK

        for b in np.flatnonzero(exact):
            kth_dense = np.sort(dense[b])[-5]
            got = dense[b, ids[b]]
            # every returned item within the declared slack of the
            # dense top-5 threshold
            assert (got >= kth_dense - 2 * CERT_SLACK).all(), (
                b, got, kth_dense,
            )

    def test_random_corpus_certifies_nothing(self):
        rng = np.random.default_rng(0)
        corpus = rng.normal(size=(1500, 16)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        index = IVFIndex(
            corpus, np.arange(1500), num_clusters=16, nprobe=4
        )
        queries = rng.normal(size=(16, 16)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        _, _, exact = index.search_certified(queries, top_k=5)
        # radii ~ sqrt(2): the bound exceeds any achievable score
        assert not exact.any()

    def test_full_probe_certifies_everything(self):
        corpus, mus = self._clustered_corpus(n=500, centers=8)
        index = IVFIndex(
            corpus, np.arange(len(corpus)), num_clusters=8, nprobe=8
        )
        queries = mus.astype(np.float32)
        scores, ids, exact = index.search_certified(
            queries, top_k=3, nprobe=8
        )
        assert exact.all()  # nprobe == num_clusters: nothing unprobed

    def test_exclusions_stay_sound(self):
        corpus, mus = self._clustered_corpus()
        index = IVFIndex(
            corpus, np.arange(len(corpus)), num_clusters=16, nprobe=16
        )
        queries = mus[:8].astype(np.float32)
        dense = queries @ corpus.T
        banned = np.argsort(-dense, axis=1)[:, :2]
        _, ids, exact = index.search_certified(
            queries,
            top_k=5,
            exclude_ids=[row.tolist() for row in banned],
        )
        for b in range(8):
            assert not set(banned[b].tolist()) & set(ids[b].tolist())

    def test_small_candidate_pool_never_certifies(self):
        """k_eff = nprobe*bucket_size < top_k: the probe cannot
        materialize an exhaustive top-k, so `exact` must stay False
        even when the triangle bound holds for the items it found —
        otherwise callers skip their fallback and silently truncate
        the result list (round-4 advisor low finding)."""
        corpus, mus = self._clustered_corpus(n=64, centers=8, sigma=0.02)
        index = IVFIndex(
            corpus, np.arange(len(corpus)), num_clusters=8, nprobe=1
        )
        top_k = index.bucket_size * 1 + 4  # provably > candidate pool
        queries = mus[:4].astype(np.float32)
        scores, ids, exact = index.search_certified(
            queries, top_k=top_k, nprobe=1
        )
        assert not exact.any()

    def test_scaled_corpus_certificates_stay_sound(self):
        """Certificates on a corpus with row norms >> 1 (the engine's
        bias/CF-extended corpora): the slack must scale with
        ||q|| * max_row_norm (round-4 advisor medium finding — an
        absolute slack is only sound for ~unit-norm data). Certified
        rows must still match the dense oracle within the declared
        relative quantum."""
        corpus, mus = self._clustered_corpus()
        corpus = corpus * 4.0  # row norms 4, not 1
        index = IVFIndex(
            corpus, np.arange(len(corpus)), num_clusters=16, nprobe=8
        )
        # measured over the SERVED (bf16-cast) vectors: ~4 within cast
        np.testing.assert_allclose(index.max_row_norm, 4.0, rtol=1e-2)
        rng = np.random.default_rng(7)
        queries = (
            mus[rng.integers(0, len(mus), 32)]
            + 0.05 * rng.normal(size=(32, corpus.shape[1]))
        ) * 2.0  # query norms ~2
        queries = queries.astype(np.float32)
        scores, ids, exact = index.search_certified(queries, top_k=5)
        assert exact.any(), "tight clusters must certify some rows"
        dense = queries @ corpus.T
        from xfmr_rec_tpu.index.ivf import CERT_SLACK

        q_norms = np.linalg.norm(queries, axis=1)
        for b in np.flatnonzero(exact):
            slack = CERT_SLACK * q_norms[b] * index.max_row_norm
            kth_dense = np.sort(dense[b])[-5]
            got = dense[b, ids[b]]
            assert (got >= kth_dense - 2 * slack).all(), (
                b, got, kth_dense,
            )

    def test_engine_certified_mode_matches_exact(self, tmp_path_factory):
        from tests.test_serving import build_artifact
        from xfmr_rec_tpu.serving.engine import RecommenderEngine
        from xfmr_rec_tpu.serving.schemas import Query

        artifact = build_artifact(tmp_path_factory)
        exact_engine = RecommenderEngine(artifact, warmup=False)
        cert_engine = RecommenderEngine(
            artifact, warmup=False, index_kind="ivf", nprobe=4,
            ivf_certified=True,
        )
        for text in ("comedy drama", "action 1995", "toy story"):
            want = exact_engine.search_items(Query(text=text), top_k=5)
            got = cert_engine.search_items(Query(text=text), top_k=5)
            np.testing.assert_allclose(
                [c.score for c in got],
                [c.score for c in want],
                atol=2e-2,  # certificate slack + bf16 index rounding
            )
