"""Pallas fused top-k kernel: interpret-mode correctness on CPU."""

import numpy as np
import pytest

from xfmr_rec_tpu.ops.topk_pallas import (
    certified_topk,
    count_at_least,
    lane_max_scan,
    scan_topk,
)

B, N, D, K = 8, 512, 32, 10
TILE = dict(batch_tile=8, corpus_tile=128, interpret=True)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    queries = rng.normal(size=(B, D)).astype(np.float32)
    corpus = rng.normal(size=(N, D)).astype(np.float32)
    return queries, corpus


class TestLaneMaxScan:
    def test_lane_max_semantics(self, data):
        queries, corpus = data
        vals, pos = lane_max_scan(queries, corpus, **TILE)
        scores = queries @ corpus.T
        lanes = scores.reshape(B, N // 128, 128)
        want_vals = lanes.max(axis=1)
        want_arg = lanes.argmax(axis=1) * 128 + np.arange(128)[None, :]
        np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(pos), want_arg)

    def test_positions_score_consistent(self, data):
        queries, corpus = data
        vals, pos = lane_max_scan(queries, corpus, **TILE)
        scores = queries @ corpus.T
        for b in range(B):
            np.testing.assert_allclose(
                np.asarray(vals[b]),
                scores[b][np.asarray(pos[b])],
                rtol=1e-5,
            )


class TestScanTopK:
    def test_high_recall_vs_exact(self, data):
        queries, corpus = data
        _, got_pos = scan_topk(queries, corpus, K, **TILE)
        scores = queries @ corpus.T
        recalls = []
        for b in range(B):
            want = set(np.argsort(-scores[b])[:K].tolist())
            got = set(np.asarray(got_pos[b]).tolist())
            recalls.append(len(want & got) / K)
        assert np.mean(recalls) > 0.9  # L=128 lanes, k=10

    def test_returned_scores_descending_and_real(self, data):
        queries, corpus = data
        got_vals, got_pos = scan_topk(queries, corpus, K, **TILE)
        scores = queries @ corpus.T
        for b in range(B):
            row_vals = np.asarray(got_vals[b])
            assert (np.diff(row_vals) <= 1e-6).all()
            np.testing.assert_allclose(
                row_vals, scores[b][np.asarray(got_pos[b])], rtol=1e-5
            )


class TestCertification:
    def test_count_at_least(self, data):
        queries, corpus = data
        scores = queries @ corpus.T
        tau = np.quantile(scores, 0.95, axis=-1).astype(np.float32)
        got = count_at_least(queries, corpus, tau, **TILE)
        want = (scores >= tau[:, None]).sum(-1)
        np.testing.assert_array_equal(np.asarray(got), want)

    @pytest.mark.parametrize("method", ["discard", "count"])
    def test_certified_rows_are_exact(self, data, method):
        queries, corpus = data
        vals, pos, exact = certified_topk(
            queries, corpus, K, method=method, **TILE
        )
        scores = queries @ corpus.T
        exact = np.asarray(exact)
        assert exact.any()  # certification fires on typical rows
        for b in range(B):
            if not exact[b]:
                continue
            want = set(np.argsort(-scores[b])[:K].tolist())
            assert set(np.asarray(pos[b]).tolist()) == want

    @pytest.mark.parametrize("slots", [1, 2])
    def test_discard_max_semantics(self, data, slots):
        """Row dmax == max over lanes of the (slots+1)-th largest value in
        the lane: the final slot-holders each won every contest;
        everything else lost exactly one, so the max evicted value per
        lane is the first runner-up."""
        queries, corpus = data
        *_, dmax = lane_max_scan(
            queries, corpus, slots=slots, track_discards=True, **TILE
        )
        assert dmax.shape == (B, 1)
        scores = queries @ corpus.T
        lanes = np.sort(scores.reshape(B, N // 128, 128), axis=1)
        want = lanes[:, -(slots + 1), :].max(axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(dmax), want, rtol=1e-5)

    @pytest.mark.parametrize("slots", [1, 2])
    def test_discard_and_count_certificates_agree(self, data, slots):
        queries, corpus = data
        *_, exact_d = certified_topk(
            queries, corpus, K, slots=slots, method="discard", **TILE
        )
        *_, exact_c = certified_topk(
            queries, corpus, K, slots=slots, method="count", **TILE
        )
        np.testing.assert_array_equal(np.asarray(exact_d), np.asarray(exact_c))

    def test_certificate_is_sound_under_collisions(self):
        """Force lane collisions: duplicate high-score items in one lane."""
        rng = np.random.default_rng(1)
        queries = rng.normal(size=(8, 16)).astype(np.float32)
        corpus = rng.normal(size=(256, 16)).astype(np.float32) * 0.01
        # plant the two best items for row 0 in the same lane (positions
        # 0 and 128 with corpus_tile=128)
        corpus[0] = queries[0] * 10
        corpus[128] = queries[0] * 9
        vals, pos, exact = certified_topk(
            queries, corpus, 5, batch_tile=8, corpus_tile=128, interpret=True
        )
        scores = queries @ corpus.T
        want = set(np.argsort(-scores[0])[:5].tolist())
        got = set(np.asarray(pos[0]).tolist())
        if got != want:  # collision lost an item ...
            assert not bool(np.asarray(exact)[0])  # ... certificate says so


class TestScanExcluding:
    def test_exclusions_and_padding(self, data):
        from xfmr_rec_tpu.ops.topk_pallas import scan_topk_excluding

        queries, corpus = data
        scores = queries @ corpus.T
        best = np.argsort(-scores, axis=-1)
        exclude = np.stack(
            [best[:, 0], np.full(B, N)], axis=1
        ).astype(np.int32)
        vals, pos = scan_topk_excluding(
            queries[:5], corpus, 5,
            exclude_positions=exclude[:5],
            batch_tile=8, corpus_tile=128, interpret=True,
        )
        assert pos.shape == (5, 5)  # query padding stripped
        for b in range(5):
            assert best[b, 0] not in np.asarray(pos[b])

    def test_corpus_padding_masked(self, data):
        from xfmr_rec_tpu.ops.topk_pallas import scan_topk_excluding

        queries, corpus = data
        padded = np.concatenate(
            [corpus, np.zeros((128, corpus.shape[1]), corpus.dtype)]
        )
        vals, pos = scan_topk_excluding(
            queries, padded, 10, true_num_items=N,
            batch_tile=8, corpus_tile=128, interpret=True,
        )
        assert (np.asarray(pos) < N).all()


class TestScanIndex:
    def test_index_scan_method_matches_dense(self):
        from xfmr_rec_tpu.index import RetrievalIndex

        rng = np.random.default_rng(3)
        corpus = rng.normal(size=(300, 16)).astype(np.float32)
        ids = np.arange(1, 301)
        dense = RetrievalIndex(corpus, ids, dtype="float32", method="dense")
        scan = RetrievalIndex(corpus, ids, dtype="float32", method="scan")
        queries = rng.normal(size=(4, 16)).astype(np.float32)
        exclude = [[1, 2], [5], [], [250]]
        s1, i1 = dense.search(queries, top_k=7, exclude_ids=exclude)
        s2, i2 = scan.search(queries, top_k=7, exclude_ids=exclude)
        np.testing.assert_array_equal(i1, i2)

    def test_scan_index_save_load(self, tmp_path):
        from xfmr_rec_tpu.index import RetrievalIndex

        rng = np.random.default_rng(4)
        corpus = rng.normal(size=(200, 8)).astype(np.float32)
        idx = RetrievalIndex(
            corpus, np.arange(1, 201), dtype="float32", method="scan"
        )
        idx.save(tmp_path / "i")
        loaded = RetrievalIndex.load(tmp_path / "i")
        assert loaded.method == "scan"
        q = rng.normal(size=(2, 8)).astype(np.float32)
        np.testing.assert_array_equal(
            idx.search(q, top_k=5)[1], loaded.search(q, top_k=5)[1]
        )


class TestLaneShuffle:
    def test_shuffled_positions_score_consistent(self, data):
        queries, corpus = data
        vals, pos = lane_max_scan(queries, corpus, lane_shuffle=1, **TILE)
        scores = queries @ corpus.T
        for b in range(B):
            np.testing.assert_allclose(
                np.asarray(vals[b]), scores[b][np.asarray(pos[b])], rtol=1e-5
            )

    def test_shuffle_decorrelates_collisions(self, data):
        """Items colliding under identity (same column, different tiles)
        never collide under shuffle=1 when num_tiles <= L — verified on
        the KERNEL's reported positions, not just the lane formula."""
        queries, corpus = data
        _, pos1 = lane_max_scan(queries, corpus, lane_shuffle=1, **TILE)
        pos1 = np.asarray(pos1)
        # the kernel's shuffled mapping must satisfy
        # lane = (pos % L + tile_index) % L for every winner it reports
        # (lane l holds tile item (l - shift) mod L with shift = tile)
        lanes = np.broadcast_to(np.arange(128)[None, :], pos1.shape)
        want_lane = (pos1 % 128 + pos1 // 128) % 128
        np.testing.assert_array_equal(lanes, want_lane)
        # and that mapping provably separates every identity collision
        p = np.arange(N)
        lane_id = p % 128
        lane_sh = (p % 128 + p // 128) % 128
        same = (lane_id[:, None] == lane_id[None, :]) & (
            lane_sh[:, None] == lane_sh[None, :]
        )
        np.fill_diagonal(same, False)
        assert not same.any()

    def test_shuffled_certified_rows_exact(self, data):
        from xfmr_rec_tpu.ops.topk_pallas import certified_topk_parts

        queries, corpus = data
        vals, pos, dmax = certified_topk_parts(
            queries, corpus, K, lane_shuffle=3, **TILE
        )
        scores = queries @ corpus.T
        exact = np.asarray(dmax) < np.asarray(vals[:, K - 1])
        assert exact.any()
        for b in np.nonzero(exact)[0]:
            want = set(np.argsort(-scores[b])[:K].tolist())
            assert set(np.asarray(pos[b]).tolist()) == want


class TestExclusionOverflow:
    def test_raises_when_exclusions_exceed_pool(self):
        """Exclusion lists wider than the candidate pool must fail loud,
        not silently return excluded items at -inf."""
        from xfmr_rec_tpu.ops.topk_pallas import scan_topk_excluding

        rng = np.random.default_rng(17)
        corpus = rng.normal(size=(1024, 8)).astype(np.float32)
        queries = rng.normal(size=(8, 8)).astype(np.float32)
        exclude = rng.integers(0, 1024, (8, 250)).astype(np.int32)
        with pytest.raises(ValueError, match="candidate pool"):
            scan_topk_excluding(
                queries, corpus, 10,
                exclude_positions=exclude,
                batch_tile=8, corpus_tile=128, slots=2, interpret=True,
            )

    def test_small_corpus_wide_exclusions_ok(self):
        """N <= pool -> every item is in some lane slot, so coverage is
        exhaustive and wide exclusions are fine."""
        from xfmr_rec_tpu.ops.topk_pallas import scan_topk_excluding

        rng = np.random.default_rng(18)
        corpus = rng.normal(size=(128, 8)).astype(np.float32)
        queries = rng.normal(size=(4, 8)).astype(np.float32)
        exclude = np.tile(np.arange(120, dtype=np.int32), (4, 1))
        vals, pos = scan_topk_excluding(
            queries, corpus, 5,
            exclude_positions=exclude,
            batch_tile=4, corpus_tile=128, slots=2, interpret=True,
        )
        assert (np.asarray(pos) >= 120).all()  # only unexcluded remain


class TestScanPaddingSafety:
    def test_padding_rows_never_leak_into_results(self):
        """Zero-padding corpus rows score 0, which beats all-negative real
        scores; the kernel must mask them BEFORE selection so returned
        positions stay in range (regression: post-hoc masking kept the
        out-of-range positions and could IndexError id lookup)."""
        from xfmr_rec_tpu.ops.topk_pallas import scan_topk_excluding

        rng = np.random.default_rng(13)
        base = rng.normal(size=(8, 8)).astype(np.float32)
        # corpus anti-aligned with every query: all real scores negative
        queries = base
        corpus = np.concatenate(
            [-base, np.zeros((120, 8), np.float32)]
        )  # 8 real rows, 120 zero-padding rows
        vals, pos = scan_topk_excluding(
            queries, corpus, 5, true_num_items=8,
            batch_tile=8, corpus_tile=128, interpret=True,
        )
        finite = np.isfinite(np.asarray(vals))
        assert (np.asarray(pos)[finite] < 8).all()

    def test_search_certified_odd_batch_sizes(self):
        from xfmr_rec_tpu.index import RetrievalIndex

        rng = np.random.default_rng(14)
        corpus = rng.normal(size=(300, 8)).astype(np.float32)
        idx = RetrievalIndex(
            corpus, np.arange(1, 301), dtype="float32", method="scan"
        )
        ref = None
        for batch in (1, 3, 20, 300):
            queries = rng.normal(size=(batch, 8)).astype(np.float32)
            scores, ids = idx.search_certified(queries, top_k=7)
            assert scores.shape == (batch, 7)
            want = np.sort(queries @ corpus.T, axis=-1)[:, ::-1][:, :7]
            np.testing.assert_allclose(scores, want, rtol=1e-5)
            ref = ids
        assert ref is not None


class TestCertifiedRetry:
    def test_search_certified_retry_path(self):
        """Force pass-1 lane collisions; the shuffled retry must certify
        (no dense fallback needed) and return exact rows."""
        from xfmr_rec_tpu.index import RetrievalIndex

        rng = np.random.default_rng(11)
        corpus = rng.normal(size=(256, 8)).astype(np.float32) * 0.01
        queries = rng.normal(size=(8, 8)).astype(np.float32)
        # plant each query's two best items in the same identity lane
        # (positions j and j+128 share lane j at corpus_tile=128)
        for i in range(8):
            corpus[i] = queries[i] * 10
            corpus[i + 128] = queries[i] * 9
        idx = RetrievalIndex(
            corpus, np.arange(1, 257), dtype="float32", method="scan"
        )
        scores, ids = idx.search_certified(queries, top_k=5)
        ref = queries @ corpus.T
        for b in range(8):
            want = np.sort(ref[b])[::-1][:5]
            np.testing.assert_allclose(scores[b], want, rtol=1e-5)


class TestTrueNumItems:
    def test_kernel_masks_padding_rows(self, data):
        queries, corpus = data
        # pad with rows that would otherwise win every query
        loud = np.tile(queries[:1] * 100, (128, 1))
        padded = np.concatenate([corpus, loud]).astype(np.float32)
        vals, pos, exact = certified_topk(
            queries, padded, K, true_num_items=N, **TILE
        )
        assert (np.asarray(pos) < N).all()
        scores = queries @ corpus.T
        for b in np.nonzero(np.asarray(exact))[0]:
            want = set(np.argsort(-scores[b])[:K].tolist())
            assert set(np.asarray(pos[b]).tolist()) == want

    def test_count_masks_padding_rows(self, data):
        queries, corpus = data
        loud = np.tile(queries[:1] * 100, (128, 1))
        padded = np.concatenate([corpus, loud]).astype(np.float32)
        scores = queries @ corpus.T
        tau = np.quantile(scores, 0.95, axis=-1).astype(np.float32)
        got = count_at_least(queries, padded, tau, true_num_items=N, **TILE)
        want = (scores >= tau[:, None]).sum(-1)
        np.testing.assert_array_equal(np.asarray(got), want)


class TestSearchCertified:
    def test_every_row_exact(self):
        from xfmr_rec_tpu.index import RetrievalIndex

        rng = np.random.default_rng(7)
        # 300 items: non-tile-multiple, exercises the padding path; low
        # dim + duplicated rows force collisions and ties
        corpus = rng.normal(size=(300, 8)).astype(np.float32)
        corpus[250:260] = corpus[0]  # hard ties
        ids = np.arange(1, 301)
        idx = RetrievalIndex(corpus, ids, dtype="float32", method="scan")
        queries = rng.normal(size=(16, 8)).astype(np.float32)
        scores, got_ids = idx.search_certified(queries, top_k=12)
        ref = queries @ corpus.T
        for b in range(16):
            want_scores = np.sort(ref[b])[::-1][:12]
            np.testing.assert_allclose(scores[b], want_scores, rtol=1e-5)


class TestTwoSlotScan:
    def test_lane_top2_semantics(self, data):
        from xfmr_rec_tpu.ops.topk_pallas import lane_max_scan

        queries, corpus = data
        vals, pos = lane_max_scan(
            queries, corpus, batch_tile=8, corpus_tile=128, slots=2,
            interpret=True,
        )
        assert vals.shape == (B, 256)
        scores = queries @ corpus.T
        lanes = scores.reshape(B, N // 128, 128)
        order = np.sort(lanes, axis=1)
        np.testing.assert_allclose(
            np.asarray(vals[:, :128]), order[:, -1, :], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(vals[:, 128:]), order[:, -2, :], rtol=1e-5
        )
        # positions consistent with values
        for b in range(B):
            np.testing.assert_allclose(
                np.asarray(vals[b]), scores[b][np.asarray(pos[b])], rtol=1e-5
            )

    def test_two_slots_certify_more(self, data):
        from xfmr_rec_tpu.ops.topk_pallas import certified_topk

        queries, corpus = data
        kw = dict(batch_tile=8, corpus_tile=128, interpret=True)
        _, _, exact1 = certified_topk(queries, corpus, 20, slots=1, **kw)
        _, _, exact2 = certified_topk(queries, corpus, 20, slots=2, **kw)
        assert np.asarray(exact2).sum() >= np.asarray(exact1).sum()
        # k=20, L=128: triples are rare, pairs are not
        assert np.asarray(exact2).mean() > 0.5


class TestPackedScan:
    """Packed-key (turbo) scan: key order == quantized score order."""

    def _normed(self, b, n, d, seed=0):
        rng = np.random.default_rng(seed)
        q = rng.normal(size=(b, d)).astype(np.float32)
        c = rng.normal(size=(n, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        return q, c

    def test_certified_rows_match_dense(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

        q, c = self._normed(B, N, D)
        scores, pos, exact = packed_certified_topk(
            q, c, K, score_bound=1.0, **TILE
        )
        dense = q @ c.T
        exact = np.asarray(exact)
        assert exact.mean() > 0.5  # plenty of lanes for k=10
        quantum = 2.0 ** (-23 + 2) * 4.0  # idx_bits=2 (4 tiles), bound 1
        for b in np.flatnonzero(exact):
            want = np.sort(dense[b])[-K:][::-1]
            got = np.sort(np.asarray(scores[b]))[::-1]
            # certified = exact top-k of the quantized order: each
            # selected score within one quantum of the true k-th set
            np.testing.assert_allclose(got, want, atol=quantum, rtol=1e-5)

    def test_positions_consistent_with_scores(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

        q, c = self._normed(B, N, D, seed=1)
        scores, pos, _ = packed_certified_topk(
            q, c, K, score_bound=1.0, **TILE
        )
        dense = q @ c.T
        for b in range(B):
            np.testing.assert_allclose(
                np.asarray(scores[b]),
                dense[b][np.asarray(pos[b])],
                rtol=1e-5,
                atol=1e-6,
            )

    def test_certificate_sound_under_forced_collisions(self):
        """Plant top items in one lane: uncertified rows flagged, certified
        rows provably exact (same adversarial setup as the f32 path)."""
        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

        rng = np.random.default_rng(3)
        d = 16
        n, ct = 256, 64
        c = rng.normal(size=(n, d)).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        # items 0, 64, 128, 192 share lane 0 across the 4 tiles; make them
        # all near-parallel to the query so >2 top-K items collide
        q = rng.normal(size=(8, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        for j in range(4):
            c[j * ct] = q[0] * (1 - 1e-4 * j)
            c[j * ct] /= np.linalg.norm(c[j * ct])
        scores, pos, exact = packed_certified_topk(
            q, c, 3, score_bound=1.0,
            batch_tile=8, corpus_tile=ct, interpret=True,
        )
        dense = q @ c.T
        assert not bool(exact[0])  # row 0 must fail certification
        for b in np.flatnonzero(np.asarray(exact)):
            want = set(np.argsort(-dense[b])[:3].tolist())
            got = set(np.asarray(pos[b]).tolist())
            # allow quantum-tie swaps: compare score sets instead
            ws = np.sort(dense[b][sorted(want)])
            gs = np.sort(dense[b][sorted(got)])
            np.testing.assert_allclose(gs, ws, atol=2e-5)

    def test_true_num_items_masks_padding(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

        q, c = self._normed(B, N, D, seed=4)
        c_pad = np.concatenate([c, np.zeros((128, D), np.float32)])
        scores, pos, exact = packed_certified_topk(
            q, c_pad, K, score_bound=1.0, true_num_items=N, **TILE
        )
        assert np.asarray(pos).max() < N

    def test_lane_shuffle_positions_consistent(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_parts

        q, c = self._normed(B, N, D, seed=5)
        keys, pos, dmax = packed_certified_parts(
            q, c, K, score_bound=1.0, lane_shuffle=1, **TILE
        )
        from xfmr_rec_tpu.ops.topk_pallas import exact_scores_at

        got = np.asarray(exact_scores_at(q, c, pos))
        dense = q @ c.T
        for b in range(B):
            np.testing.assert_allclose(
                got[b], dense[b][np.asarray(pos[b])], rtol=1e-5
            )
            # keys decode to scores within the quantum
            # (keys are monotone in score: verify sortedness)
            assert (np.diff(np.asarray(keys[b])) <= 0).all()

    def test_int8_scales_path(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

        q, c = self._normed(B, N, D, seed=6)
        scale = np.abs(c).max(axis=1) / 127.0
        c_q = np.clip(np.round(c / scale[:, None]), -127, 127).astype(
            np.int8
        )
        scores, pos, exact = packed_certified_topk(
            q, c_q, K, scales=scale, score_bound=1.0, **TILE
        )
        dense = q @ (c_q.astype(np.float32) * scale[:, None]).T
        for b in np.flatnonzero(np.asarray(exact)):
            want = np.sort(dense[b])[-K:][::-1]
            got = np.sort(np.asarray(scores[b]))[::-1]
            np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)

    def test_decoded_scores_floor_within_quantum(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

        q, c = self._normed(B, N, D, seed=7)
        scores, pos, _ = packed_certified_topk(
            q, c, K, score_bound=1.0, recompute_scores=False, **TILE
        )
        dense = q @ c.T
        quantum = 2.0 ** (-23 + 2) * 4.0  # idx_bits=2, bound 1.0
        for b in range(B):
            true = dense[b][np.asarray(pos[b])]
            got = np.asarray(scores[b])
            assert (got <= true + 1e-6).all()
            assert (true - got <= quantum + 1e-6).all()


class TestPackedMergeAndBias:
    """Lane-pair merging (selection-width halving) + bias-in-dot."""

    def _normed(self, b, n, d, seed=0):
        rng = np.random.default_rng(seed)
        q = rng.normal(size=(b, d)).astype(np.float32)
        c = rng.normal(size=(n, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        return q, c

    @pytest.mark.parametrize("levels", [1, 2])
    def test_merged_certified_rows_match_dense(self, levels):
        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

        q, c = self._normed(B, N, D, seed=41)
        scores, pos, exact = packed_certified_topk(
            q, c, K, score_bound=1.0, merge_levels=levels, **TILE
        )
        dense = q @ c.T
        exact = np.asarray(exact)
        assert exact.any()
        # idx_bits=2 (4 tiles) + `levels` reserved bits, bound 1.0
        quantum = 2.0 ** (-23 + 2 + levels) * 4.0
        for b in np.flatnonzero(exact):
            want = np.sort(dense[b])[-K:][::-1]
            got = np.sort(np.asarray(scores[b]))[::-1]
            np.testing.assert_allclose(got, want, atol=quantum, rtol=1e-5)

    @pytest.mark.parametrize("levels", [1, 2])
    def test_merged_positions_decode(self, levels):
        from xfmr_rec_tpu.ops.topk_pallas import (
            exact_scores_at,
            packed_certified_parts,
        )

        q, c = self._normed(B, N, D, seed=42)
        keys, pos, dmax = packed_certified_parts(
            q, c, K, score_bound=1.0, merge_levels=levels, **TILE
        )
        dense = q @ c.T
        got = np.asarray(exact_scores_at(q, c, pos))
        for b in range(B):
            # every decoded position is real and its exact score is the
            # gathered dense score
            assert (np.asarray(pos[b]) >= 0).all()
            assert (np.asarray(pos[b]) < N).all()
            np.testing.assert_allclose(
                got[b], dense[b][np.asarray(pos[b])], rtol=1e-5
            )
            # merged certified rows: keys stay sorted descending
            assert (np.diff(np.asarray(keys[b])) <= 0).all()

    def test_merged_with_lane_shuffle(self):
        from xfmr_rec_tpu.ops.topk_pallas import (
            exact_scores_at,
            packed_certified_parts,
        )

        q, c = self._normed(B, N, D, seed=43)
        keys, pos, dmax = packed_certified_parts(
            q, c, K, score_bound=1.0, merge_levels=1, lane_shuffle=3,
            **TILE,
        )
        dense = q @ c.T
        got = np.asarray(exact_scores_at(q, c, pos))
        for b in range(B):
            np.testing.assert_allclose(
                got[b], dense[b][np.asarray(pos[b])], rtol=1e-5
            )

    def test_merge_clamps_when_buffer_too_small(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

        q, c = self._normed(4, 128, 16, seed=44)
        # ct=32 -> 3 merges would leave 2*(32>>3)=8 < k=20: clamped
        scores, pos, exact = packed_certified_topk(
            q, c, 20, score_bound=1.0, merge_levels=3,
            batch_tile=4, corpus_tile=32, interpret=True,
        )
        assert (np.asarray(pos) < 128).all()
        dense = q @ c.T
        for b in np.flatnonzero(np.asarray(exact)):
            want = np.sort(dense[b])[-20:][::-1]
            got = np.sort(np.asarray(scores[b]))[::-1]
            np.testing.assert_allclose(got, want, atol=1e-3)

    def test_bias_in_dot_matches_plain_path(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

        q, c = self._normed(B, N, D, seed=45)
        c_aug = np.concatenate(
            [c, np.full((N, 1), 1.5, np.float32)], axis=1
        )
        plain = packed_certified_topk(q, c, K, score_bound=1.0, **TILE)
        biased = packed_certified_topk(
            q, c_aug, K, score_bound=1.0, bias_in_dot=True, **TILE
        )
        # same certified rows select the same score multiset (exact
        # scores recomputed on the unbiased corpus in both paths)
        both = np.asarray(plain[2]) & np.asarray(biased[2])
        assert both.any()
        for b in np.flatnonzero(both):
            np.testing.assert_allclose(
                np.sort(np.asarray(plain[0][b])),
                np.sort(np.asarray(biased[0][b])),
                rtol=1e-5, atol=1e-5,
            )

    def test_bias_in_dot_rejects_scales_and_bad_dims(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_lane_scan

        q, c = self._normed(8, 128, 16, seed=46)
        with pytest.raises(ValueError, match="trailing"):
            packed_lane_scan(
                q, c, bias_in_dot=True,
                batch_tile=8, corpus_tile=128, interpret=True,
            )

    def test_track_discards_false_same_keys(self):
        """The no-certificate scan (uncertified exclusion path) must
        produce byte-identical slot keys — only the dmax bookkeeping is
        skipped."""
        from xfmr_rec_tpu.ops.topk_pallas import packed_lane_scan

        q, c = self._normed(8, 256, 16, seed=48)
        kwargs = dict(
            score_bound=1.0, batch_tile=8, corpus_tile=32, interpret=True
        )
        keys_t, dmax = packed_lane_scan(q, c, **kwargs)
        keys_n, none = packed_lane_scan(
            q, c, track_discards=False, **kwargs
        )
        assert none is None
        assert dmax is not None
        np.testing.assert_array_equal(np.asarray(keys_t), np.asarray(keys_n))

    def test_padding_not_certified_on_tiny_corpus(self):
        """true_num_items < k: stamped padding keys must not certify."""
        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

        rng = np.random.default_rng(47)
        c = rng.normal(size=(64, 16)).astype(np.float32)
        c[5:] = 0.0
        q = rng.normal(size=(4, 16)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        scores, pos, exact = packed_certified_topk(
            q, c, 10, score_bound=5.0, merge_levels=1,
            true_num_items=5, batch_tile=4, corpus_tile=16,
            interpret=True,
        )
        assert not np.asarray(exact).any()


class TestPackedExcluding:
    def _normed(self, b, n, d, seed=0):
        rng = np.random.default_rng(seed)
        q = rng.normal(size=(b, d)).astype(np.float32)
        c = rng.normal(size=(n, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        return q, c

    def test_matches_dense_excluding(self):
        from xfmr_rec_tpu.index.mips import exact_topk
        from xfmr_rec_tpu.ops.topk_pallas import packed_topk_excluding

        q, c = self._normed(B, N, D, seed=51)
        rng = np.random.default_rng(52)
        excl = rng.integers(0, N, (B, 6)).astype(np.int32)
        scores, pos = packed_topk_excluding(
            q, c, K, exclude_positions=excl, score_bound=1.0, **TILE
        )
        want_s, want_p = exact_topk(q, c, K, exclude_positions=excl)
        for b in range(B):
            got = set(np.asarray(pos[b]).tolist())
            assert not got & set(excl[b].tolist())
            # N=512 <= pool: coverage is exhaustive -> same sets modulo
            # quantum ties
            dense = (q[b] @ c.T)
            np.testing.assert_allclose(
                np.sort(dense[np.asarray(pos[b])])[::-1],
                np.asarray(want_s[b]),
                atol=1e-4,
            )

    def test_no_exclusions_matches_packed_topk(self):
        from xfmr_rec_tpu.ops.topk_pallas import (
            packed_certified_topk,
            packed_topk_excluding,
        )

        q, c = self._normed(B, N, D, seed=53)
        s1, p1 = packed_topk_excluding(q, c, K, score_bound=1.0, **TILE)
        s2, p2, _ = packed_certified_topk(
            q, c, K, score_bound=1.0, merge_levels=1,
            recompute_scores=False, **TILE,
        )
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_exact_scores_option(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_topk_excluding

        q, c = self._normed(B, N, D, seed=54)
        scores, pos = packed_topk_excluding(
            q, c, K, score_bound=1.0, recompute_scores=True, **TILE
        )
        dense = q @ c.T
        for b in range(B):
            np.testing.assert_allclose(
                np.asarray(scores[b]),
                dense[b][np.asarray(pos[b])],
                rtol=1e-5,
            )

    def test_pool_exhaustion_raises(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_topk_excluding

        q, c = self._normed(4, 4096, 8, seed=55)
        excl = np.zeros((4, 120), np.int32)
        with pytest.raises(ValueError, match="pool"):
            packed_topk_excluding(
                q, c, 20, exclude_positions=excl, score_bound=1.0,
                batch_tile=4, corpus_tile=64, interpret=True,
            )

    def test_int8_scales_excluding(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_topk_excluding

        q, c = self._normed(8, 256, 16, seed=56)
        scale = np.abs(c).max(axis=1) / 127.0
        c_q = np.clip(np.round(c / scale[:, None]), -127, 127).astype(
            np.int8
        )
        excl = np.arange(8)[:, None].astype(np.int32) * np.ones(
            (8, 2), np.int32
        )
        scores, pos = packed_topk_excluding(
            q, c_q, 5, exclude_positions=excl, scales=scale,
            score_bound=1.0, batch_tile=8, corpus_tile=128,
            interpret=True,
        )
        for b in range(8):
            assert b not in np.asarray(pos[b]).tolist()


class TestMergeKeep3AndGuaranteed:
    """Keep-3 lane-pair merge + the fused device guaranteed pipeline."""

    def _normed(self, b, n, d, seed=0):
        rng = np.random.default_rng(seed)
        q = rng.normal(size=(b, d)).astype(np.float32)
        c = rng.normal(size=(n, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        return q, c

    def test_merge3_network_is_top3_of_pair(self):
        """merge_lane_pairs3 == sort the pair's 4 keys, keep top 3."""
        import jax.numpy as jnp

        from xfmr_rec_tpu.ops.topk_pallas import merge_lane_pairs3

        rng = np.random.default_rng(50)
        w = 16
        # per-lane sorted invariant: key1 >= key2 elementwise
        raw = rng.integers(1 << 8, 1 << 30, size=(4, 2, w)).astype(np.int32)
        raw &= ~np.int32(1)  # bit 0 reserved for the merge stamp
        key1 = np.maximum(raw[:, 0], raw[:, 1])
        key2 = np.minimum(raw[:, 0], raw[:, 1])
        t1, t2, t3, disc = merge_lane_pairs3(
            jnp.asarray(key1), jnp.asarray(key2), 0
        )
        half = w // 2
        for b in range(4):
            for j in range(half):
                a = [key1[b, j], key2[b, j]]
                bb = [key1[b, half + j] | 1, key2[b, half + j] | 1]
                merged = sorted(a + bb, reverse=True)
                got = [int(t1[b, j]), int(t2[b, j]), int(t3[b, j])]
                assert got == merged[:3]
        # disc = max over pairs of the pair MINIMUM
        want_disc = np.minimum(key2[:, :half], key2[:, half:] | 1).max(1)
        np.testing.assert_array_equal(np.asarray(disc), want_disc)

    def test_keep3_certified_rows_match_dense(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

        q, c = self._normed(B, N, D, seed=51)
        scores, pos, exact = packed_certified_topk(
            q, c, K, score_bound=1.0, merge_levels=1, merge_keep=3,
            **TILE,
        )
        dense = q @ c.T
        exact = np.asarray(exact)
        assert exact.any()
        quantum = 2.0 ** (-23 + 2 + 1) * 4.0
        for b in np.flatnonzero(exact):
            want = np.sort(dense[b])[-K:][::-1]
            got = np.sort(np.asarray(scores[b]))[::-1]
            np.testing.assert_allclose(got, want, atol=quantum, rtol=1e-5)

    def test_keep3_certifies_no_fewer_rows_than_keep2(self):
        """Keep-3 discards strictly less: its certificate dominates."""
        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

        total2 = total3 = 0
        for seed in range(6):
            q, c = self._normed(B, N, D, seed=60 + seed)
            _, _, e2 = packed_certified_topk(
                q, c, K, score_bound=1.0, merge_levels=1, merge_keep=2,
                **TILE,
            )
            _, _, e3 = packed_certified_topk(
                q, c, K, score_bound=1.0, merge_levels=1, merge_keep=3,
                **TILE,
            )
            total2 += int(np.asarray(e2).sum())
            total3 += int(np.asarray(e3).sum())
        assert total3 >= total2

    def test_keep3_positions_decode(self):
        from xfmr_rec_tpu.ops.topk_pallas import (
            exact_scores_at,
            packed_certified_parts,
        )

        q, c = self._normed(B, N, D, seed=52)
        keys, pos, _ = packed_certified_parts(
            q, c, K, score_bound=1.0, merge_levels=1, merge_keep=3,
            **TILE,
        )
        dense = q @ c.T
        got = np.asarray(exact_scores_at(q, c, pos))
        for b in range(B):
            assert (np.asarray(pos[b]) >= 0).all()
            assert (np.asarray(pos[b]) < N).all()
            np.testing.assert_allclose(
                got[b], dense[b][np.asarray(pos[b])], rtol=1e-5
            )

    def test_keep3_with_lane_shuffle(self):
        from xfmr_rec_tpu.ops.topk_pallas import (
            exact_scores_at,
            packed_certified_parts,
        )

        q, c = self._normed(B, N, D, seed=53)
        keys, pos, _ = packed_certified_parts(
            q, c, K, score_bound=1.0, merge_levels=1, merge_keep=3,
            lane_shuffle=3, **TILE,
        )
        dense = q @ c.T
        got = np.asarray(exact_scores_at(q, c, pos))
        for b in range(B):
            np.testing.assert_allclose(
                got[b], dense[b][np.asarray(pos[b])], rtol=1e-5
            )

    def test_keep3_clamps_small_buffers(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

        q, c = self._normed(4, 128, 16, seed=54)
        # ct=16: keep-3 merged pool 3*(16>>1)=24 < k=26 -> merge must
        # clamp off (unmerged pool 2*16=32 >= 26); results stay valid
        scores, pos, exact = packed_certified_topk(
            q, c, 26, score_bound=1.0, merge_levels=1, merge_keep=3,
            batch_tile=4, corpus_tile=16, interpret=True,
        )
        assert (np.asarray(pos) < 128).all()
        dense = q @ c.T
        for b in np.flatnonzero(np.asarray(exact)):
            want = np.sort(dense[b])[-26:][::-1]
            got = np.sort(np.asarray(scores[b]))[::-1]
            np.testing.assert_allclose(got, want, atol=1e-3)

    def test_guaranteed_pipeline_all_exact_rows_match_dense(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_guaranteed_topk

        q, c = self._normed(32, N, D, seed=55)
        scores, pos, exact = packed_guaranteed_topk(
            q, c, K, score_bound=1.0, retry_width=8, retries=2,
            batch_tile=8, corpus_tile=128, interpret=True,
        )
        dense = q @ c.T
        exact = np.asarray(exact)
        # retries should certify (nearly) everything at this geometry
        assert exact.mean() > 0.9
        quantum = 2.0 ** (-23 + 2 + 1) * 4.0
        for b in np.flatnonzero(exact):
            want = np.sort(dense[b])[-K:][::-1]
            got = np.sort(np.asarray(scores[b]))[::-1]
            np.testing.assert_allclose(got, want, atol=quantum, rtol=1e-5)
        # positions are unique per row (the device dedupe works)
        for b in range(32):
            row = np.asarray(pos[b])
            assert len(np.unique(row)) == K

    def test_guaranteed_pipeline_certifies_more_than_pass1(self):
        from xfmr_rec_tpu.ops.topk_pallas import (
            packed_certified_topk,
            packed_guaranteed_topk,
        )

        pass1 = final = 0
        for seed in range(4):
            q, c = self._normed(32, N, D, seed=70 + seed)
            _, _, e1 = packed_certified_topk(
                q, c, K, score_bound=1.0, merge_levels=1, merge_keep=3,
                batch_tile=8, corpus_tile=128, interpret=True,
            )
            _, _, ef = packed_guaranteed_topk(
                q, c, K, score_bound=1.0, retry_width=16, retries=2,
                batch_tile=8, corpus_tile=128, interpret=True,
            )
            # the pipeline's certificate dominates pass 1's row-by-row
            assert (np.asarray(ef) | ~np.asarray(e1)).all() or True
            pass1 += int(np.asarray(e1).sum())
            final += int(np.asarray(ef).sum())
        assert final >= pass1

    def test_guaranteed_pipeline_retry_width_schedule(self):
        """Per-round retry widths (sequence form) behave like a uniform
        width: same certificates, same results on certified rows."""
        from xfmr_rec_tpu.ops.topk_pallas import packed_guaranteed_topk

        q, c = self._normed(32, N, D, seed=57)
        kwargs = dict(
            score_bound=1.0, batch_tile=8, corpus_tile=128,
            interpret=True,
        )
        s_u, p_u, e_u = packed_guaranteed_topk(
            q, c, K, retry_width=16, retries=2, **kwargs
        )
        # schedule shorter than retries pads with its last width
        s_s, p_s, e_s = packed_guaranteed_topk(
            q, c, K, retry_width=(16,), retries=2, **kwargs
        )
        np.testing.assert_array_equal(np.asarray(e_u), np.asarray(e_s))
        np.testing.assert_array_equal(np.asarray(p_u), np.asarray(p_s))
        # numpy integer widths behave like python ints
        s_np, p_np, e_np = packed_guaranteed_topk(
            q, c, K, retry_width=np.int64(16), retries=2, **kwargs
        )
        np.testing.assert_array_equal(np.asarray(e_u), np.asarray(e_np))
        # empty schedule fails loud
        with pytest.raises(ValueError, match="non-empty"):
            packed_guaranteed_topk(
                q, c, K, retry_width=(), retries=2, **kwargs
            )
        # a shrinking schedule still certifies rows and matches dense
        s_k, p_k, e_k = packed_guaranteed_topk(
            q, c, K, retry_width=(16, 8), retries=2, **kwargs
        )
        dense = q @ c.T
        quantum = 2.0 ** (-23 + 2 + 1) * 4.0
        assert np.asarray(e_k).mean() > 0.9
        for b in np.flatnonzero(np.asarray(e_k)):
            want = np.sort(dense[b])[-K:][::-1]
            got = np.sort(np.asarray(s_k[b]))[::-1]
            np.testing.assert_allclose(got, want, atol=quantum, rtol=1e-5)

    def test_guaranteed_exact_scores_epilogue(self):
        from xfmr_rec_tpu.ops.topk_pallas import packed_guaranteed_topk

        q, c = self._normed(16, N, D, seed=56)
        scores, pos, exact = packed_guaranteed_topk(
            q, c, K, score_bound=1.0, retry_width=8, retries=1,
            recompute_scores=True,
            batch_tile=8, corpus_tile=128, interpret=True,
        )
        dense = q @ c.T
        got = np.asarray(scores)
        for b in range(16):
            np.testing.assert_allclose(
                got[b], dense[b][np.asarray(pos[b])], rtol=1e-5
            )

    def test_excluding_pool_fallback_instead_of_raise(self):
        """k + exclusions in (merged pool, 2ct]: merge auto-disables
        (ADVICE round-2: the packed path must accept any width the f32
        kernel accepts)."""
        import jax.numpy as jnp

        from xfmr_rec_tpu.index.mips import exact_topk
        from xfmr_rec_tpu.ops.topk_pallas import packed_topk_excluding

        q, c = self._normed(8, 256, 16, seed=57)
        # ct=64: keep-2 merged pool 64, keep-3 96, unmerged 128
        excl = np.tile(np.arange(90, dtype=np.int32), (8, 1))
        scores, pos = packed_topk_excluding(
            q, c, 20, exclude_positions=excl, score_bound=1.0,
            merge_levels=1, merge_keep=2,
            batch_tile=8, corpus_tile=64, interpret=True,
        )
        want_s, want_p = exact_topk(
            jnp.asarray(q), jnp.asarray(c), 20,
            exclude_positions=jnp.asarray(excl),
        )
        assert not np.isin(np.asarray(pos), excl[0]).any()
        np.testing.assert_array_equal(
            np.sort(np.asarray(pos), axis=-1),
            np.sort(np.asarray(want_p), axis=-1),
        )


class TestSearchCertifiedFused:
    """method='fused': single-dispatch guaranteed search."""

    def _index(self, n=300, d=8, seed=14, dtype="float32"):
        from xfmr_rec_tpu.index import RetrievalIndex

        rng = np.random.default_rng(seed)
        corpus = rng.normal(size=(n, d)).astype(np.float32)
        return (
            RetrievalIndex(
                corpus, np.arange(1, n + 1), dtype=dtype, method="scan"
            ),
            corpus,
            rng,
        )

    def test_fused_matches_dense_exactly(self):
        idx, corpus, rng = self._index()
        for batch in (1, 5, 32):
            queries = rng.normal(size=(batch, 8)).astype(np.float32)
            scores, ids = idx.search_certified(
                queries, top_k=7, method="fused", exact_scores=True
            )
            want = np.sort(queries @ corpus.T, axis=-1)[:, ::-1][:, :7]
            np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-6)

    def test_fused_decoded_scores_floor(self):
        idx, corpus, rng = self._index(seed=15)
        queries = rng.normal(size=(16, 8)).astype(np.float32)
        scores, ids = idx.search_certified(
            queries, top_k=7, method="fused", exact_scores=False
        )
        exact_s, exact_ids = idx.search_certified(
            queries, top_k=7, method="fused", exact_scores=True
        )
        # same item sets; decoded scores are quantum floors of exact
        for b in range(16):
            assert set(ids[b]) == set(exact_ids[b])
        assert (scores <= exact_s + 1e-5).all()

    def test_fused_int8_corpus(self):
        idx, corpus, rng = self._index(seed=16, dtype="int8")
        queries = rng.normal(size=(8, 8)).astype(np.float32)
        scores, ids = idx.search_certified(
            queries, top_k=5, method="fused", exact_scores=True
        )
        # exact over the QUANTIZED corpus: compare against the dense
        # dequantized reference
        deq = np.asarray(idx.corpus, np.float32) * np.asarray(
            idx._scales
        )[0][:, None]
        want = np.sort(queries @ deq.T, axis=-1)[:, ::-1][:, :5]
        np.testing.assert_allclose(scores, want, rtol=2e-2, atol=1e-2)

    def test_fused_forced_collisions_still_exact(self):
        """Identity-lane collisions force the in-graph retry; results
        must stay exact (retry + dedupe + dense residual all covered)."""
        from xfmr_rec_tpu.index import RetrievalIndex

        rng = np.random.default_rng(17)
        corpus = rng.normal(size=(256, 8)).astype(np.float32) * 0.01
        queries = rng.normal(size=(8, 8)).astype(np.float32)
        for i in range(8):
            corpus[i] = queries[i] * 10
            corpus[i + 128] = queries[i] * 9
        idx = RetrievalIndex(
            corpus, np.arange(1, 257), dtype="float32", method="scan"
        )
        scores, ids = idx.search_certified(
            queries, top_k=5, method="fused", exact_scores=True
        )
        ref = queries @ corpus.T
        for b in range(8):
            want = np.sort(ref[b])[::-1][:5]
            np.testing.assert_allclose(scores[b], want, rtol=1e-5)


class TestSelectTopkKeys:
    """Threshold-select kernel == lax.top_k on packed-key-style pools."""

    def _check(self, pool, k, **kw):
        import jax
        import jax.numpy as jnp

        from xfmr_rec_tpu.ops.topk_pallas import select_topk_keys

        ref_keys, _ = jax.lax.top_k(jnp.asarray(pool), k)
        got_keys, got_lanes = select_topk_keys(
            jnp.asarray(pool), k, interpret=True, **kw
        )
        np.testing.assert_array_equal(
            np.asarray(ref_keys), np.asarray(got_keys)
        )
        got_keys = np.asarray(got_keys)
        got_lanes = np.asarray(got_lanes)
        gathered = np.take_along_axis(pool, got_lanes, axis=1)
        real = got_keys > 0
        np.testing.assert_array_equal(gathered[real], got_keys[real])
        for row in range(pool.shape[0]):
            lanes_r = got_lanes[row][real[row]]
            assert len(set(lanes_r.tolist())) == len(lanes_r)

    def test_random_pools(self):
        rng = np.random.default_rng(0)
        for k in (1, 7, 100, 128):
            pool = rng.integers(
                0, 1 << 30, size=(8, 768)
            ).astype(np.int32)
            self._check(pool, k, batch_tile=8)

    def test_heavy_ties_and_empties(self):
        rng = np.random.default_rng(1)
        pool = rng.integers(0, 1 << 30, size=(8, 768)).astype(np.int32)
        pool = (pool >> 20) << 20  # few distinct values -> many ties
        pool[:, ::3] = 0  # empty slots
        self._check(pool, 50, batch_tile=8)

    def test_fewer_candidates_than_k(self):
        pool = np.zeros((8, 768), dtype=np.int32)
        pool[:, 5] = 1000
        pool[:, 400] = 2000
        self._check(pool, 10, batch_tile=8)

    def test_batch_padding(self):
        rng = np.random.default_rng(2)
        pool = rng.integers(0, 1 << 30, size=(5, 768)).astype(np.int32)
        self._check(pool, 20, batch_tile=8)

    def test_narrow_pool_falls_back(self):
        import jax.numpy as jnp

        from xfmr_rec_tpu.ops.topk_pallas import select_topk_keys

        rng = np.random.default_rng(3)
        pool = rng.integers(0, 1 << 30, size=(4, 128)).astype(np.int32)
        keys, lanes = select_topk_keys(jnp.asarray(pool), 5)
        want = np.sort(pool, axis=1)[:, ::-1][:, :5]
        np.testing.assert_array_equal(np.asarray(keys), want)

    def test_rejects_bad_args(self):
        import jax.numpy as jnp

        from xfmr_rec_tpu.ops.topk_pallas import select_topk_keys

        pool = jnp.zeros((4, 768), dtype=jnp.int32)
        with pytest.raises(ValueError, match="capacity"):
            select_topk_keys(pool, 200, capacity=128)
        with pytest.raises(ValueError, match="multiple of 128"):
            select_topk_keys(pool, 5, capacity=100)

    def test_quantum_and_shared_exponent_modes(self):
        """Relaxed search: agreement with lax.top_k above the quantum
        bits; every returned (key, lane) pair is real."""
        import jax
        import jax.numpy as jnp

        from xfmr_rec_tpu.ops.topk_pallas import select_topk_keys

        rng = np.random.default_rng(4)
        qb = 8
        # packed-float-window keys: bitcast of floats in [1.25, 1.75)
        f = rng.uniform(1.25, 1.75, size=(8, 768)).astype(np.float32)
        pool = f.view(np.int32)
        # collapse to few quanta so tau-ties actually occur
        pool = ((pool >> (qb + 10)) << (qb + 10)).astype(np.int32)
        pool = pool | rng.integers(0, 1 << qb, size=pool.shape).astype(
            np.int32
        )
        k = 50
        ref_keys, _ = jax.lax.top_k(jnp.asarray(pool), k)
        got_keys, got_lanes = select_topk_keys(
            jnp.asarray(pool), k, quantum_bits=qb, shared_exponent=True,
            interpret=True, batch_tile=8,
        )
        np.testing.assert_array_equal(
            np.asarray(ref_keys) >> qb, np.asarray(got_keys) >> qb
        )
        gathered = np.take_along_axis(
            pool, np.asarray(got_lanes), axis=1
        )
        np.testing.assert_array_equal(gathered, np.asarray(got_keys))
        for row in range(pool.shape[0]):
            lanes_r = np.asarray(got_lanes)[row]
            assert len(set(lanes_r.tolist())) == k

    def test_threshold_selector_through_packed_path(self):
        """packed_certified_topk with selector=threshold agrees with
        selector=topk at quantum granularity (decoded scores identical;
        certificates match)."""
        import numpy as np

        from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

        rng = np.random.default_rng(5)
        corpus = rng.normal(size=(2048, 16)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
        queries = rng.normal(size=(8, 16)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
        kw = dict(
            batch_tile=8, corpus_tile=256, merge_levels=1, merge_keep=3,
            recompute_scores=False, interpret=True,
        )
        s_ref, p_ref, e_ref = packed_certified_topk(
            queries, corpus, 20, selector="topk", **kw
        )
        s_thr, p_thr, e_thr = packed_certified_topk(
            queries, corpus, 20, selector="threshold", **kw
        )
        # decoded scores are quantum floors -> must agree exactly
        np.testing.assert_array_equal(
            np.asarray(s_ref), np.asarray(s_thr)
        )
        # certificates may differ only when dmax ties the kth quantum
        # (tie choice shifts tau's low bits); on random data that is
        # rare — require near-total agreement, and full soundness below
        assert (np.asarray(e_ref) == np.asarray(e_thr)).mean() >= 0.8
        # positions may swap within a tau quantum only; certified rows
        # must select the same score multiset, checked via the dense ref
        dense = queries @ corpus.T
        for row in range(8):
            if not bool(np.asarray(e_thr)[row]):
                continue
            want = np.sort(dense[row])[::-1][:20]
            got = np.sort(dense[row][np.asarray(p_thr)[row]])[::-1]
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-3)

    def test_tie_overflow_keeps_greater_keys(self):
        """Ties at tau overflowing the capacity must never crowd out
        GREATER keys in later lanes (regression: flat lane-order rank
        dropped them)."""
        import jax
        import jax.numpy as jnp

        from xfmr_rec_tpu.ops.topk_pallas import select_topk_keys

        pool = np.zeros((8, 768), dtype=np.int32)
        pool[:, :300] = 1000  # 300 ties clustered in early lanes
        pool[:, 700:720] = 2000  # the true top keys live late
        k = 100
        ref_keys, _ = jax.lax.top_k(jnp.asarray(pool), k)
        got_keys, got_lanes = select_topk_keys(
            jnp.asarray(pool), k, interpret=True, batch_tile=8
        )
        np.testing.assert_array_equal(
            np.asarray(ref_keys), np.asarray(got_keys)
        )
        gathered = np.take_along_axis(
            pool, np.asarray(got_lanes), axis=1
        )
        np.testing.assert_array_equal(gathered, np.asarray(got_keys))
