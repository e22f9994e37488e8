"""Serving integration: artifact load, endpoint surface, HTTP transport."""

import json
import threading
import time

import numpy as np
import urllib.request

import pytest

from xfmr_rec_tpu.data import DataConfig, RecDataModule
from xfmr_rec_tpu.data.prepare import prepare_movielens
from xfmr_rec_tpu.data.synthetic import generate_movielens
from xfmr_rec_tpu.serving.engine import RecommenderEngine
from xfmr_rec_tpu.serving.prepare import test_queries
from xfmr_rec_tpu.serving.schemas import NotFoundError, Query
from xfmr_rec_tpu.serving.service import RecService, dispatch, make_server
from xfmr_rec_tpu.training.module import TrainConfig
from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

TINY_MODEL = dict(
    hidden_size=32,
    num_hidden_layers=1,
    num_attention_heads=4,
    intermediate_size=32,
    vocab_size=500,
    max_position_embeddings=32,
    max_length=16,
    compute_dtype="float32",
)


def build_artifact(tmp_path_factory):
    """Train a 3-step tiny model and export its artifact (shared with
    test_sharded_index.py's engine test)."""
    data_dir = tmp_path_factory.mktemp("servedata")
    generate_movielens(
        data_dir, num_users=30, num_movies=80, num_ratings=700, seed=2
    )
    prepare_movielens(str(data_dir), overwrite=True)
    dm = RecDataModule(
        DataConfig(
            data_dir=str(data_dir),
            batch_size=8,
            max_length=16,
            vocab_size=500,
        )
    )
    trainer = Trainer(
        TrainConfig(**TINY_MODEL),
        data=dm,
        trainer_config=TrainerConfig(
            max_steps=3,
            log_dir=str(tmp_path_factory.mktemp("serveruns")),
            limit_val_batches=1,
        ),
    )
    trainer.fit()
    path = tmp_path_factory.mktemp("artifact") / "model"
    trainer.save(path)
    return path


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    return build_artifact(tmp_path_factory)


@pytest.fixture(scope="module")
def service(artifact):
    return RecService(RecommenderEngine(artifact))


class TestEndpoints:
    def test_golden_values(self, service):
        test_queries(service)

    def test_not_found(self, service):
        with pytest.raises(NotFoundError):
            service.item_id(99999)
        with pytest.raises(NotFoundError):
            service.user_id(99999)

    def test_embed_deterministic(self, service):
        a = service.embed_query(Query(text="comedy drama"))
        b = service.embed_query(Query(text="comedy drama"))
        assert a.embedding == b.embedding

    def test_search_with_embedding_skips_encode(self, service):
        q = service.embed_query(Query(text="action"))
        result = service.search_items(q, top_k=3)
        assert len(result) == 3

    def test_exclusions_respected(self, service):
        base = service.recommend_with_query(Query(text="comedy"), top_k=5)
        exclude = [c.movie_id for c in base[:2]]
        got = service.recommend_with_query(
            Query(text="comedy"), exclude_item_ids=exclude, top_k=5
        )
        assert not set(exclude) & {c.movie_id for c in got}

    def test_dispatch_unknown_endpoint(self, service):
        with pytest.raises(KeyError):
            dispatch(service, "drop_tables", {})


class TestHTTP:
    @pytest.fixture(scope="class")
    def server(self, service):
        server = make_server(service, port=0)  # ephemeral port
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        yield server
        server.shutdown()

    def _post(self, server, endpoint, payload):
        port = server.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/{endpoint}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as err:
            return err.code, json.loads(err.read())

    def test_recommend_roundtrip(self, server):
        status, body = self._post(
            server, "recommend_with_user_id", {"user_id": 1, "top_k": 4}
        )
        assert status == 200
        assert len(body) == 4
        assert {"movie_id", "movie_text", "score"} <= set(body[0])

    def test_item_lookup(self, server):
        status, body = self._post(server, "item_id", {"item_id": 1})
        assert status == 200
        assert body["movie_id"] == 1

    def test_404_unknown_item(self, server):
        status, body = self._post(server, "item_id", {"item_id": 99999})
        assert status == 404
        assert "error" in body

    def test_404_unknown_endpoint(self, server):
        status, _ = self._post(server, "nope", {})
        assert status == 404

    def test_model_meta(self, server):
        status, body = self._post(server, "model_name", {})
        assert status == 200 and body == "xfmr_rec_tpu"


class TestMetricsEndpoint:
    @pytest.fixture(scope="class")
    def server(self, service):
        server = make_server(service, port=0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        yield server
        server.shutdown()

    def _get(self, server, path):
        port = server.server_address[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/{path}"
        ) as resp:
            return resp.status, resp.read().decode()

    def test_healthz(self, server):
        status, body = self._get(server, "healthz")
        assert status == 200
        assert json.loads(body) == {"status": "ok"}

    def test_metrics_counters_move(self, server):
        port = server.server_address[1]
        for _ in range(3):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/model_name",
                data=b"{}",
                method="POST",
            )
            urllib.request.urlopen(req).read()
        # one error request
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/item_id",
            data=json.dumps({"item_id": 99999}).encode(),
            method="POST",
        )
        try:
            urllib.request.urlopen(req).read()
        except urllib.error.HTTPError:
            pass
        status, text = self._get(server, "metrics")
        assert status == 200
        assert (
            'http_requests_total{endpoint="model_name",status="200"} 3'
            in text
        )
        assert (
            'http_requests_total{endpoint="item_id",status="404"} 1' in text
        )
        # histogram invariants: +Inf bucket == count, sum present
        assert 'le="+Inf"} 3' in text
        assert 'http_request_duration_seconds_sum{endpoint="model_name"}' in text

    def test_metrics_histogram_cumulative(self):
        from xfmr_rec_tpu.serving.service import RequestMetrics

        metrics = RequestMetrics()
        metrics.observe("x", 200, 0.0001)
        metrics.observe("x", 200, 0.02)
        metrics.observe("x", 200, 99.0)
        text = metrics.render()
        assert 'le="0.001"} 1' in text
        assert 'le="0.05"} 2' in text
        assert 'le="+Inf"} 3' in text
        assert 'http_request_duration_seconds_count{endpoint="x"} 3' in text


class TestIVFEngine:
    def test_ivf_index_kind_serves_and_excludes(self, artifact):
        engine = RecommenderEngine(
            artifact, warmup=False, index_kind="ivf", nprobe=4
        )
        out = engine.search_items(Query(text="comedy drama"), top_k=5)
        assert out
        ids = [c.movie_id for c in out]
        out2 = engine.search_items(
            Query(text="comedy drama"),
            exclude_item_ids=ids[:2],
            top_k=5,
        )
        assert not set(ids[:2]) & {c.movie_id for c in out2}

    def test_unknown_index_kind_raises(self, artifact):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="index_kind"):
            RecommenderEngine(artifact, warmup=False, index_kind="hnsw")


class TestMetricsLabelSafety:
    def test_unknown_paths_collapse_to_one_label(self, service):
        import threading
        import urllib.request

        from xfmr_rec_tpu.serving.service import make_server

        server = make_server(service, port=0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            port = server.server_address[1]
            for path in ('x"y}', "scanner1", "scanner2", "a/b/c"):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/{path}",
                    data=b"{}",
                    method="POST",
                )
                try:
                    urllib.request.urlopen(req).read()
                except urllib.error.HTTPError:
                    pass
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics"
            ) as resp:
                text = resp.read().decode()
            assert 'endpoint="_unknown",status="404"} 4' in text
            assert "scanner1" not in text
            assert '"y}' not in text.replace('status="404"}', "")
        finally:
            server.shutdown()


class TestVocabArtifact:
    """tokenizer="vocab" round-trips through the deployable artifact."""

    @pytest.fixture(scope="class")
    def vocab_artifact(self, tmp_path_factory):
        data_dir = tmp_path_factory.mktemp("vocabdata")
        generate_movielens(
            data_dir, num_users=25, num_movies=60, num_ratings=500, seed=5
        )
        prepare_movielens(str(data_dir), overwrite=True)
        dm = RecDataModule(
            DataConfig(
                data_dir=str(data_dir),
                batch_size=8,
                max_length=16,
                vocab_size=500,
                oov_buckets=32,
                tokenizer="vocab",
            )
        )
        trainer = Trainer(
            TrainConfig(**TINY_MODEL),
            data=dm,
            trainer_config=TrainerConfig(
                max_steps=2,
                log_dir=str(tmp_path_factory.mktemp("vocabruns")),
                limit_val_batches=1,
            ),
        )
        trainer.fit()
        path = tmp_path_factory.mktemp("vocabartifact") / "model"
        trainer.save(path)
        return path, dm

    def test_vocab_ships_in_artifact(self, vocab_artifact):
        path, _ = vocab_artifact
        assert (path / "vocab.json").exists()

    def test_engine_tokenizes_byte_identically(self, vocab_artifact):
        from xfmr_rec_tpu.models.tokenizer import VocabTokenizer

        path, dm = vocab_artifact
        engine = RecommenderEngine(path, warmup=False)
        assert isinstance(engine.tokenizer, VocabTokenizer)
        texts = dm.item_texts[:10]
        np.testing.assert_array_equal(
            engine.tokenizer.encode_batch(texts, 16),
            dm.tokenizer.encode_batch(texts, 16),
        )

    def test_engine_serves_recommendations(self, vocab_artifact):
        path, _ = vocab_artifact
        engine = RecommenderEngine(path, warmup=False)
        out = engine.search_items(
            Query(text='{"title":"Movie 3 (1995)"}'), top_k=5
        )
        assert len(out) == 5


class TestIVFCacheInvalidation:
    """Retraining into the same artifact dir must rebuild the IVF
    (ADVICE round 2: a stale cached IVF would probe the previous
    model's clusters)."""

    def test_fingerprint_mismatch_triggers_rebuild(self, artifact, tmp_path):
        # mutate a COPY: the module-scoped artifact is shared with every
        # later fixture that builds a fresh engine from it
        import shutil

        artifact = shutil.copytree(artifact, tmp_path / "artifact")
        engine = RecommenderEngine(artifact, warmup=False, index_kind="ivf")
        assert (artifact / "ivf" / "fingerprint.json").exists()
        first_centroids = np.asarray(engine.ivf.centroids).copy()
        # simulate a re-export: perturb the saved corpus in place
        corpus_file = artifact / "index" / "corpus.npz"
        arrays = dict(np.load(corpus_file, allow_pickle=False))
        rng = np.random.default_rng(0)
        arrays["embeddings"] = (
            arrays["embeddings"] + rng.normal(
                scale=0.5, size=arrays["embeddings"].shape
            ).astype(np.float32)
        )
        np.savez(corpus_file, **arrays)
        engine2 = RecommenderEngine(artifact, warmup=False, index_kind="ivf")
        # the IVF was rebuilt from the new corpus, not loaded from cache
        assert not np.allclose(
            np.asarray(engine2.ivf.centroids), first_centroids
        )

    def test_matching_fingerprint_reuses_cache(self, artifact):
        engine = RecommenderEngine(artifact, warmup=False, index_kind="ivf")
        centroids = np.asarray(engine.ivf.centroids).copy()
        engine2 = RecommenderEngine(artifact, warmup=False, index_kind="ivf")
        np.testing.assert_array_equal(
            np.asarray(engine2.ivf.centroids), centroids
        )

    def test_low_recall_enforcement_raises(self, artifact):
        with pytest.raises(RuntimeError, match="recall"):
            RecommenderEngine(
                artifact,
                warmup=False,
                index_kind="ivf",
                nprobe=1,
                ivf_min_recall=1.01,  # unreachable: always trips
                ivf_enforce_recall=True,
            )


class TestTextSearch:
    """BM25 FTS over items AND users (reference builds FTS indexes on
    both tables — data/lightning.py:221,286-304)."""

    def test_item_text_search(self, service):
        hits = service.search_items_text("title genres", top_k=5)
        assert hits
        assert all("movie_id" in h and h["score"] > 0 for h in hits)

    def test_user_text_search(self, service):
        # user_text is JSON with gender/occupation fields
        hits = service.search_users_text("gender", top_k=5)
        assert hits
        assert all("user_id" in h and h["score"] > 0 for h in hits)

    def test_user_text_search_no_match(self, service):
        assert service.search_users_text("zzzzqqqq", top_k=5) == []

    def test_http_dispatch(self, service):
        from xfmr_rec_tpu.serving.service import dispatch

        out = dispatch(
            service, "search_users_text", {"query": "gender", "top_k": 3}
        )
        assert isinstance(out, list)

    def test_unknown_endpoint_distinct_from_method_keyerror(self, service):
        """dispatch signals unknown paths with UnknownEndpointError; a
        KeyError raised INSIDE a service method must NOT be mistaken for
        it (the HTTP handler maps the former to 404-unknown, the latter
        to a logged 500)."""
        from xfmr_rec_tpu.serving.service import (
            UnknownEndpointError,
            dispatch,
        )

        with pytest.raises(UnknownEndpointError):
            dispatch(service, "no_such_endpoint", {})
        # a method that raises a plain KeyError internally
        original = service.model_name
        service.model_name = lambda: {}["missing"]
        try:
            with pytest.raises(KeyError) as exc_info:
                dispatch(service, "model_name", {})
            assert not isinstance(exc_info.value, UnknownEndpointError)
        finally:
            service.model_name = original


class TestMicroBatching:
    """Adaptive request coalescing (serving/batching.py): concurrent
    text searches must batch into fewer device dispatches with results
    identical to the unbatched path."""

    @pytest.fixture(scope="class")
    def batched_service(self, artifact):
        from xfmr_rec_tpu.serving.service import RecService

        engine = RecommenderEngine(artifact, warmup=False)
        service = RecService(engine, micro_batch=16, micro_batch_wait_ms=20)
        yield service
        service.batcher.close()

    def test_results_match_unbatched(self, batched_service, service):
        q = Query(text='{"title":"Movie 5 (1995)"}')
        got = batched_service.search_items(q, top_k=5)
        want = service.search_items(q, top_k=5)
        assert [c.movie_id for c in got] == [c.movie_id for c in want]
        for g, w in zip(got, want):
            assert g.score == pytest.approx(w.score, rel=1e-5)

    def test_concurrent_requests_coalesce(self, batched_service):
        import threading

        batcher = batched_service.batcher
        before_batches = batcher.batches_dispatched
        before_requests = batcher.requests_served
        results = {}

        def worker(i):
            results[i] = batched_service.recommend_with_query(
                Query(text=f'{{"title":"Movie {i % 7} (1995)"}}'), top_k=4
            )

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(12)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        served = batcher.requests_served - before_requests
        dispatched = batcher.batches_dispatched - before_batches
        assert served == 12
        assert dispatched < 12, "no coalescing happened"
        assert all(len(results[i]) == 4 for i in range(12))

    def test_per_request_top_k_and_exclusions(self, batched_service):
        import threading

        q = Query(text='{"title":"Movie 3 (1995)"}')
        base = batched_service.search_items(q, top_k=6)
        exclude = [base[0].movie_id]
        out = {}

        def a():
            out["a"] = batched_service.search_items(q, top_k=3)

        def b():
            out["b"] = batched_service.search_items(
                q, exclude_item_ids=exclude, top_k=6
            )

        ta, tb = threading.Thread(target=a), threading.Thread(target=b)
        ta.start(); tb.start(); ta.join(); tb.join()
        assert len(out["a"]) == 3
        assert exclude[0] not in [c.movie_id for c in out["b"]]

    def test_embedding_queries_bypass_batcher(self, batched_service):
        q = batched_service.embed_query(Query(text="anything"))
        before = batched_service.batcher.requests_served
        result = batched_service.search_items(q, top_k=3)
        assert len(result) == 3
        assert batched_service.batcher.requests_served == before

    def test_error_propagates_to_caller(self, batched_service):
        with pytest.raises(Exception):  # noqa: B017, PT011 — any engine error
            batched_service.batcher.search_items(
                '{"t":1}', top_k=10**9
            )

    def test_close_never_hangs_callers(self, artifact):
        """Callers racing close() either get served or get an error —
        never a hang — and post-close submissions raise immediately."""
        import threading

        from xfmr_rec_tpu.serving.batching import MicroBatcher

        engine = RecommenderEngine(artifact, warmup=False)
        batcher = MicroBatcher(engine, max_batch=4, max_wait_ms=1)
        outcomes = []

        def caller():
            try:
                outcomes.append(
                    ("ok", batcher.search_items('{"title":"Movie 1 (1995)"}', top_k=3))
                )
            except RuntimeError as exc:
                outcomes.append(("err", exc))

        threads = [threading.Thread(target=caller) for _ in range(8)]
        for t in threads:
            t.start()
        batcher.close()
        for t in threads:
            t.join(timeout=10)
        assert not any(t.is_alive() for t in threads), (
            "a caller hung across close()"
        )
        assert len(outcomes) == 8
        for kind, payload in outcomes:
            if kind == "ok":
                assert len(payload) == 3
        batcher._worker.join(timeout=5)
        assert not batcher._worker.is_alive()
        with pytest.raises(RuntimeError, match="closed"):
            batcher.search_items('{"t":1}', top_k=3)


class TestCatalogMutationGate:
    """add_items is an admin operation: OFF by default on the serving
    surface (ADVICE r3), and the engine rejects intra-batch duplicate
    ids (the fresh index ctor would otherwise last-wins them)."""

    def _new_item(self, i=900001):
        from xfmr_rec_tpu.serving.schemas import ItemQuery

        return ItemQuery(
            movie_rn=0, movie_id=i, movie_text='{"title":"New (2026)"}'
        )

    def test_disabled_by_default(self, service):
        with pytest.raises(PermissionError, match="disabled"):
            service.add_items([self._new_item()])

    def test_http_maps_gate_to_403(self, artifact):
        svc = RecService(RecommenderEngine(artifact, warmup=False))
        server = make_server(svc, host="127.0.0.1", port=0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            port = server.server_address[1]
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/add_items",
                data=json.dumps(
                    {"items": [self._new_item().model_dump()]}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with pytest.raises(urllib.error.HTTPError) as err:
                urllib.request.urlopen(req, timeout=10)
            assert err.value.code == 403
        finally:
            server.shutdown()
            server.server_close()

    def test_enabled_flag_allows(self, artifact):
        svc = RecService(
            RecommenderEngine(artifact, warmup=False),
            allow_catalog_mutation=True,
        )
        out = svc.add_items([self._new_item(900002)])
        assert out["added"] == 1
        assert svc.item_id(900002).movie_id == 900002

    def test_engine_rejects_intra_batch_duplicates(self, artifact):
        engine = RecommenderEngine(artifact, warmup=False)
        before = len(engine.index)
        dupe = self._new_item(900003)
        with pytest.raises(ValueError, match="duplicate ids"):
            engine.add_items([dupe, dupe])
        assert len(engine.index) == before


class TestMutationUnderTraffic:
    """Torture: 16 reader threads hammer search_items while add_items
    cycles (VERDICT r3 #4). Contract: zero errors, no torn reads (every
    response's ids come from a published catalog version — adds are
    append-only so the final catalog is the union), fixed result width,
    and adds become visible to searches (liveness). The reference's
    LanceDB tables are concurrently readable stores
    (data/lightning.py:128-151); here reads are lock-free against an
    atomic index swap."""

    READERS = 16
    MUTATIONS = 5

    def test_search_hammer_while_adding(self, artifact):
        from xfmr_rec_tpu.serving.schemas import ItemQuery

        engine = RecommenderEngine(artifact, warmup=False)
        base_ids = {int(i) for i in engine.index.ids}
        added_ids = [990100 + i for i in range(self.MUTATIONS * 2)]
        all_ids = base_ids | set(added_ids)

        # fixed query embedding: readers exercise the search path, not
        # the encoder
        query = engine.embed_query(Query(text="drama comedy"))
        errors: list[BaseException] = []
        seen_added = threading.Event()
        stop = threading.Event()

        def reader():
            try:
                while not stop.is_set():
                    out = engine.search_items(query, top_k=5)
                    ids = [int(c.movie_id) for c in out]
                    assert len(ids) == 5, out
                    assert len(set(ids)) == 5, "duplicate ids in response"
                    assert set(ids) <= all_ids, (
                        f"ids outside any published catalog: {ids}"
                    )
                    # scores ranked descending (a torn index would break
                    # the score/id pairing)
                    scores = [float(c.score) for c in out]
                    assert scores == sorted(scores, reverse=True), out
                    if set(ids) & set(added_ids):
                        seen_added.set()
            except BaseException as exc:  # noqa: BLE001 — collected
                errors.append(exc)

        threads = [
            threading.Thread(target=reader) for _ in range(self.READERS)
        ]
        for thread in threads:
            thread.start()
        try:
            for m in range(self.MUTATIONS):
                engine.add_items(
                    [
                        ItemQuery(
                            movie_rn=0,
                            movie_id=added_ids[2 * m + j],
                            # same text as the query so adds rank high
                            # and the liveness check fires
                            movie_text='{"title": "Drama Comedy '
                            f'{m}{j} (2030)", "genres": ["Drama"]}}',
                        )
                        for j in range(2)
                    ]
                )
            # keep traffic flowing a moment after the last swap
            deadline = time.time() + 3.0
            while time.time() < deadline and not seen_added.is_set():
                time.sleep(0.05)
        finally:
            stop.set()
            for thread in threads:
                thread.join(timeout=60)
        assert not errors, errors[:3]
        assert len(engine.index) == len(base_ids) + len(added_ids)
        # liveness: post-mutation searches surfaced added items
        assert seen_added.is_set(), "adds never became visible to readers"
