"""ShardedRetrievalIndex: one logical exact index over the device mesh.

Validates the multi-chip serving index (index/sharded.py) against the
single-device exhaustive reference on the 8-device virtual CPU mesh —
the TPU-native replacement for the reference's single-host LanceDB
serving index (data/lightning.py:183-259), which has no multi-machine
story at all.
"""

import jax
import numpy as np
import pytest

from xfmr_rec_tpu.index.mips import RetrievalIndex
from xfmr_rec_tpu.index.sharded import ShardedRetrievalIndex
from xfmr_rec_tpu.parallel.mesh import create_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

DIM = 16
# packed keys quantize scores; id sets may swap within one key quantum,
# so results compare by TRUE-score multiset (same convention as
# tests/test_index.py packed cases)
QUANTUM_ATOL = 1e-4


def make_corpus(n, seed=0, dim=DIM):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = rng.permutation(10 * n)[:n].astype(np.int64)
    metadata = [{"movie_text": f"item {int(i)}"} for i in ids]
    return emb, ids, metadata


def make_queries(b, seed=1, dim=DIM):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, dim)).astype(np.float32)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def dense_scores(queries, emb, exclude_pos=None):
    scores = queries.astype(np.float64) @ emb.astype(np.float64).T
    if exclude_pos is not None:
        for row, excl in enumerate(exclude_pos):
            valid = [int(p) for p in excl if 0 <= p < emb.shape[0]]
            scores[row, valid] = -np.inf
    return scores


def assert_topk_equiv(item_ids, ids, queries, emb, k, exclude_pos=None):
    """Returned id sets must equal the exact top-k by true-score
    multiset (quantum ties may swap ids, never scores)."""
    ref = dense_scores(queries, emb, exclude_pos)
    id_to_pos = {int(i): p for p, i in enumerate(ids)}
    for row in range(queries.shape[0]):
        got = [id_to_pos[int(i)] for i in item_ids[row] if int(i) != -1]
        assert len(got) == len(set(got)), "duplicate ids in one row"
        got_scores = np.sort(ref[row][got])[::-1]
        want = np.sort(ref[row])[::-1][: len(got)]
        np.testing.assert_allclose(got_scores, want, atol=QUANTUM_ATOL)


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(8, model_parallel=8)


class TestShardedSearch:
    def test_matches_dense_reference(self, mesh):
        emb, ids, metadata = make_corpus(1024)
        index = ShardedRetrievalIndex(
            emb, ids, metadata, mesh=mesh, dtype="float32"
        )
        queries = make_queries(16)
        scores, item_ids = index.search(queries, top_k=10)
        assert item_ids.shape == (16, 10)
        assert_topk_equiv(item_ids, ids, queries, emb, 10)
        # decoded scores are quantum floors of the true scores
        ref = dense_scores(queries, emb)
        id_to_pos = {int(i): p for p, i in enumerate(ids)}
        for row in range(16):
            true = ref[row][[id_to_pos[int(i)] for i in item_ids[row]]]
            np.testing.assert_allclose(scores[row], true, atol=1e-4)

    def test_unbalanced_corpus_pads_and_masks(self, mesh):
        """N not divisible by the shard count: zero pad rows must never
        surface as results."""
        emb, ids, metadata = make_corpus(1003)
        index = ShardedRetrievalIndex(
            emb, ids, metadata, mesh=mesh, dtype="float32"
        )
        queries = make_queries(8)
        scores, item_ids = index.search(queries, top_k=10)
        assert (item_ids >= 0).all()
        assert_topk_equiv(item_ids, ids, queries, emb, 10)

    def test_exclusions_respected(self, mesh):
        emb, ids, metadata = make_corpus(512)
        index = ShardedRetrievalIndex(
            emb, ids, metadata, mesh=mesh, dtype="float32"
        )
        queries = make_queries(4)
        # exclude each query's unexcluded top-3
        _, top_ids = index.search(queries, top_k=3)
        exclude = [list(map(int, row)) for row in top_ids]
        scores, item_ids = index.search(
            queries, top_k=10, exclude_ids=exclude
        )
        for row, banned in enumerate(exclude):
            assert not set(banned) & set(map(int, item_ids[row]))
        excl_pos = index.positions_of(exclude)
        assert_topk_equiv(item_ids, ids, queries, emb, 10, excl_pos)

    @pytest.mark.parametrize("method", ["fused", "packed"])
    def test_search_certified_exact(self, mesh, method):
        emb, ids, metadata = make_corpus(2048, seed=3)
        index = ShardedRetrievalIndex(
            emb, ids, metadata, mesh=mesh, dtype="float32"
        )
        queries = make_queries(8, seed=4)
        scores, item_ids = index.search_certified(
            queries, top_k=20, method=method
        )
        assert_topk_equiv(item_ids, ids, queries, emb, 20)
        assert index.last_certified_stats["batch"] == 8

    def test_guaranteed_pipeline_primitive(self, mesh):
        """sharded_packed_guaranteed_topk: certified rows match dense."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from xfmr_rec_tpu.parallel import sharded_packed_guaranteed_topk

        emb, ids, _ = make_corpus(2048, seed=21)
        corpus = jax.device_put(
            emb, NamedSharding(mesh, P("model", None))
        )
        queries = make_queries(16, seed=22)
        scores, positions, exact = sharded_packed_guaranteed_topk(
            queries, corpus, 10, mesh, corpus_tile=64, retry_width=16
        )
        exact = np.asarray(exact)
        positions = np.asarray(positions)
        ref = dense_scores(queries, emb)
        assert exact.any()
        for b in np.flatnonzero(exact):
            want = np.sort(ref[b])[::-1][:10]
            got = np.sort(ref[b][positions[b]])[::-1]
            np.testing.assert_allclose(got, want, atol=QUANTUM_ATOL)

    def test_metadata_surface(self, mesh):
        emb, ids, metadata = make_corpus(256)
        index = ShardedRetrievalIndex(emb, ids, metadata, mesh=mesh)
        assert len(index) == 256
        assert index.dim == DIM
        row = index.get_id(int(ids[7]))
        assert row["id"] == int(ids[7])
        assert index.get_id(999999999) == {}
        hits = index.search_text(f"item {int(ids[3])}", top_k=3)
        assert any(h["id"] == int(ids[3]) for h in hits)

    def test_save_load_roundtrip_and_cross_kind(self, mesh, tmp_path):
        """The sharded and single-chip indexes share one artifact layout:
        save sharded -> load single-chip and vice versa."""
        emb, ids, metadata = make_corpus(512, seed=5)
        index = ShardedRetrievalIndex(
            emb, ids, metadata, mesh=mesh, dtype="float32"
        )
        index.save(tmp_path / "idx")
        queries = make_queries(4, seed=6)

        again = ShardedRetrievalIndex.load(tmp_path / "idx", mesh=mesh)
        _, item_ids = again.search(queries, top_k=5)
        assert_topk_equiv(item_ids, ids, queries, emb, 5)
        assert again.get_id(int(ids[0]))["id"] == int(ids[0])

        single = RetrievalIndex.load(tmp_path / "idx")
        _, s_ids = single.search(queries, top_k=5)
        assert_topk_equiv(s_ids, ids, queries, emb, 5)

        single.save(tmp_path / "idx2")
        from_single = ShardedRetrievalIndex.load(tmp_path / "idx2", mesh=mesh)
        _, f_ids = from_single.search(queries, top_k=5)
        assert_topk_equiv(f_ids, ids, queries, emb, 5)

    def test_matches_single_chip_index(self, mesh):
        """Same corpus, same query -> score-equivalent ids from both
        kinds at the same storage dtype."""
        emb, ids, metadata = make_corpus(768, seed=7)
        sharded = ShardedRetrievalIndex(
            emb, ids, metadata, mesh=mesh, dtype="float32"
        )
        single = RetrievalIndex(emb, ids, metadata, dtype="float32")
        queries = make_queries(8, seed=8)
        _, ids_sharded = sharded.search(queries, top_k=10)
        _, ids_single = single.search(queries, top_k=10)
        assert_topk_equiv(ids_sharded, ids, queries, emb, 10)
        assert_topk_equiv(ids_single, ids, queries, emb, 10)

    def test_small_k_greater_than_local(self, mesh):
        """k larger than one shard's row count still merges correctly."""
        emb, ids, metadata = make_corpus(64, seed=9)
        index = ShardedRetrievalIndex(
            emb, ids, metadata, mesh=mesh, dtype="float32"
        )
        queries = make_queries(2, seed=10)
        _, item_ids = index.search(queries, top_k=16)
        assert_topk_equiv(item_ids, ids, queries, emb, 16)

    def test_int8_sharded_corpus(self, mesh, tmp_path):
        """int8 quantization composes with sharding: search is exact
        over the quantized corpus (same contract as the single-chip
        int8 index), artifacts round-trip, and the dequantized scores
        track the f32 reference within quantization error."""
        emb, ids, metadata = make_corpus(515, seed=11)  # unbalanced too
        RetrievalIndex(emb, ids, metadata, dtype="int8").save(tmp_path / "q")
        loaded = ShardedRetrievalIndex.load(tmp_path / "q", mesh=mesh)
        assert loaded.dtype == "int8"
        assert loaded.scales is not None
        queries = make_queries(8, seed=12)
        scores, item_ids = loaded.search(queries, top_k=10)
        assert (item_ids >= 0).all()
        # dequantization error for unit-norm rows is ~sqrt(D)/254
        ref = dense_scores(queries, emb)
        id_to_pos = {int(i): p for p, i in enumerate(ids)}
        for row in range(8):
            got = [id_to_pos[int(i)] for i in item_ids[row]]
            got_scores = np.sort(ref[row][got])[::-1]
            want = np.sort(ref[row])[::-1][:10]
            np.testing.assert_allclose(got_scores, want, atol=0.05)
        # certified path rides the dequantizing kernel too
        _, c_ids = loaded.search_certified(queries, top_k=10)
        assert (c_ids >= 0).all()
        # round-trip: save dequantizes, re-load re-quantizes identically
        loaded.save(tmp_path / "q2")
        again = ShardedRetrievalIndex.load(tmp_path / "q2", mesh=mesh)
        _, ids2 = again.search(queries, top_k=10)
        assert np.array_equal(ids2, item_ids)


class TestTwoDMesh:
    """2-D (data x model) mesh: queries shard over data, corpus over
    model — results must match the 1-D-mesh and dense references."""

    @pytest.fixture(scope="class", params=[(2, 4), (4, 2)])
    def mesh2d(self, request):
        data, model = request.param
        return create_mesh(8, model_parallel=model)

    def test_search_matches_dense(self, mesh2d):
        emb, ids, metadata = make_corpus(512, seed=13)
        index = ShardedRetrievalIndex(
            emb, ids, metadata, mesh=mesh2d, dtype="float32"
        )
        queries = make_queries(16, seed=14)
        _, item_ids = index.search(queries, top_k=10)
        assert_topk_equiv(item_ids, ids, queries, emb, 10)

    def test_odd_batch_pads_over_data_axis(self, mesh2d):
        """B not divisible by the data axis: zero-query pad rows are
        stripped and real rows still match."""
        emb, ids, metadata = make_corpus(256, seed=15)
        index = ShardedRetrievalIndex(
            emb, ids, metadata, mesh=mesh2d, dtype="float32"
        )
        queries = make_queries(7, seed=16)
        scores, item_ids = index.search(queries, top_k=5)
        assert item_ids.shape == (7, 5)
        assert_topk_equiv(item_ids, ids, queries, emb, 5)

    def test_exclusions_and_certified(self, mesh2d):
        emb, ids, metadata = make_corpus(512, seed=17)
        index = ShardedRetrievalIndex(
            emb, ids, metadata, mesh=mesh2d, dtype="float32"
        )
        queries = make_queries(8, seed=18)
        _, top_ids = index.search(queries, top_k=2)
        exclude = [list(map(int, row)) for row in top_ids]
        _, item_ids = index.search(queries, top_k=6, exclude_ids=exclude)
        for row, banned in enumerate(exclude):
            assert not set(banned) & set(map(int, item_ids[row]))
        excl_pos = index.positions_of(exclude)
        assert_topk_equiv(item_ids, ids, queries, emb, 6, excl_pos)

        for method in ("fused", "packed"):
            _, c_ids = index.search_certified(
                queries, top_k=10, method=method
            )
            assert_topk_equiv(c_ids, ids, queries, emb, 10)


class TestShardedEngine:
    def test_engine_index_kind_sharded(self, tmp_path_factory):
        """RecommenderEngine(index_kind='sharded') serves end-to-end."""
        from tests.test_serving import build_artifact

        path = build_artifact(tmp_path_factory)
        from xfmr_rec_tpu.serving.engine import RecommenderEngine
        from xfmr_rec_tpu.serving.schemas import Query

        engine = RecommenderEngine(
            path, warmup=False, index_kind="sharded", model_parallel=8
        )
        assert type(engine.index).__name__ == "ShardedRetrievalIndex"
        cands = engine.search_items(Query(text="toy story"), top_k=5)
        assert len(cands) == 5
        assert all(c.movie_id >= 0 for c in cands)
        # exclusions flow through the sharded path
        banned = [c.movie_id for c in cands[:2]]
        cands2 = engine.search_items(
            Query(text="toy story"), exclude_item_ids=banned, top_k=5
        )
        assert not set(banned) & {c.movie_id for c in cands2}
