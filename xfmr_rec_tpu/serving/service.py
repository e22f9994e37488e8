"""Recommendation service: the full endpoint surface + stdlib HTTP server.

Endpoint parity with the reference composite BentoML Service
(/root/reference/xfmr_rec/bentoml/service.py:184-311):
recommend_with_query / embed_query / search_items / recommend_with_item /
process_item / recommend_with_item_id / item_id / recommend_with_user /
process_user / recommend_with_user_id / user_id / model_name /
model_version — same auto-exclusion behavior (item excludes itself;
user excludes history + target).

The transport is a stdlib ThreadingHTTPServer speaking JSON POST (BentoML
is not in this image); `RecService` itself is transport-free and is driven
in-process by the integration tests, mirroring the reference's ASGI
TestClient pattern (bentoml/prepare.py:60-72).
"""

from __future__ import annotations

import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from xfmr_rec_tpu.params import MODEL_NAME, TOP_K
from xfmr_rec_tpu.serving.engine import RecommenderEngine
from xfmr_rec_tpu.serving.schemas import (
    ItemCandidate,
    ItemQuery,
    NotFoundError,
    Query,
    UserQuery,
)

logger = logging.getLogger(__name__)


class RecService:
    def __init__(
        self,
        engine: RecommenderEngine,
        model_version_str: str = "latest",
        *,
        micro_batch: int | None = None,
        micro_batch_wait_ms: float = 5.0,
        allow_catalog_mutation: bool = False,
    ) -> None:
        """`micro_batch`: when set, concurrent text-query searches
        coalesce into batched device dispatches of up to this size
        (the reference's BentoML adaptive-batching property — see
        serving/batching.py). Queries carrying a precomputed embedding
        bypass the batcher.

        `allow_catalog_mutation`: the `add_items` endpoint mutates the
        live catalog (and forces an XLA recompile), so it is OFF by
        default on the unauthenticated serving surface — start the
        service with this flag (CLI: --allow-catalog-mutation) to
        enable it on an admin deployment."""
        self.engine = engine
        self._version = model_version_str
        self.allow_catalog_mutation = allow_catalog_mutation
        self.batcher = None
        if micro_batch:
            from xfmr_rec_tpu.serving.batching import MicroBatcher

            self.batcher = MicroBatcher(
                engine, max_batch=micro_batch, max_wait_ms=micro_batch_wait_ms
            )

    # -- embedding / search -------------------------------------------
    def embed_query(self, query: Query) -> Query:
        return self.engine.embed_query(query)

    def search_items(
        self,
        query: Query,
        exclude_item_ids: list[int] | None = None,
        top_k: int = TOP_K,
    ) -> list[ItemCandidate]:
        if self.batcher is not None and query.embedding is None:
            return self.batcher.search_items(
                query.text,
                exclude_item_ids=exclude_item_ids,
                top_k=top_k,
            )
        return self.engine.search_items(
            query, exclude_item_ids=exclude_item_ids or [], top_k=top_k
        )

    def recommend_with_query(
        self,
        query: Query,
        exclude_item_ids: list[int] | None = None,
        top_k: int = TOP_K,
    ) -> list[ItemCandidate]:
        if self.batcher is not None and query.embedding is None:
            return self.batcher.search_items(
                query.text,
                exclude_item_ids=exclude_item_ids,
                top_k=top_k,
            )
        query = self.embed_query(query)
        return self.search_items(
            query, exclude_item_ids=exclude_item_ids, top_k=top_k
        )

    # -- items ---------------------------------------------------------
    def item_id(self, item_id: int) -> ItemQuery:
        return self.engine.get_item(item_id)

    def process_item(self, item: ItemQuery) -> Query:
        return self.engine.process_item(item)

    def add_items(self, items: list[dict] | list[ItemQuery]) -> dict:
        """Live catalog append: encode + index the new items in place.

        Beyond the reference's endpoint surface (its catalog changes
        need a repackage); kept admin-shaped — one batched call, fails
        loud on id collisions, next search pays the recompile. Gated:
        requires the service to be started with
        allow_catalog_mutation=True (any client of the serving port
        could otherwise grow the catalog / force recompiles at will).
        """
        if not self.allow_catalog_mutation:
            msg = (
                "add_items is disabled: start the service with "
                "allow_catalog_mutation=True (--allow-catalog-mutation) "
                "to expose live catalog mutation"
            )
            raise PermissionError(msg)
        parsed = [
            item
            if isinstance(item, ItemQuery)
            else ItemQuery.model_validate(item)
            for item in items
        ]
        added = self.engine.add_items(parsed)
        return {"added": added, "num_items": len(self.engine.index)}

    def recommend_with_item(
        self,
        item: ItemQuery,
        exclude_item_ids: list[int] | None = None,
        top_k: int = TOP_K,
    ) -> list[ItemCandidate]:
        if item.movie_id:
            exclude_item_ids = [*(exclude_item_ids or []), item.movie_id]
        query = self.process_item(item)
        return self.recommend_with_query(
            query, exclude_item_ids=exclude_item_ids, top_k=top_k
        )

    def recommend_with_item_id(
        self,
        item_id: int,
        exclude_item_ids: list[int] | None = None,
        top_k: int = TOP_K,
    ) -> list[ItemCandidate]:
        item = self.item_id(item_id)
        return self.recommend_with_item(
            item, exclude_item_ids=exclude_item_ids, top_k=top_k
        )

    # -- users ---------------------------------------------------------
    def user_id(self, user_id: int) -> UserQuery:
        return self.engine.get_user(user_id)

    def process_user(self, user: UserQuery) -> Query:
        return self.engine.process_user(user)

    def recommend_with_user(
        self,
        user: UserQuery,
        exclude_item_ids: list[int] | None = None,
        top_k: int = TOP_K,
    ) -> list[ItemCandidate]:
        exclude_item_ids = list(exclude_item_ids or [])
        if user.history:
            exclude_item_ids += [a.movie_id for a in user.history]
        if user.target:
            exclude_item_ids += [a.movie_id for a in user.target]
        # embed through the model's real user tower (text, or history
        # fusion — serving/engine.py embed_user_query); for the text
        # tower this is exactly process_user -> embed_query
        query = self.engine.embed_user_query(user)
        return self.recommend_with_query(
            query, exclude_item_ids=exclude_item_ids, top_k=top_k
        )

    def recommend_with_user_id(
        self,
        user_id: int,
        exclude_item_ids: list[int] | None = None,
        top_k: int = TOP_K,
    ) -> list[ItemCandidate]:
        user = self.user_id(user_id)
        return self.recommend_with_user(
            user, exclude_item_ids=exclude_item_ids, top_k=top_k
        )

    # -- meta ----------------------------------------------------------
    def search_items_text(self, query: str, top_k: int = 10) -> list[dict]:
        return self.engine.search_items_text(query, top_k=top_k)

    def search_users_text(self, query: str, top_k: int = 10) -> list[dict]:
        return self.engine.search_users_text(query, top_k=top_k)

    def model_name(self) -> str:
        return MODEL_NAME

    def model_version(self) -> str:
        return self._version


# ---------------------------------------------------------------------------
# request observability
# ---------------------------------------------------------------------------
class RequestMetrics:
    """Per-endpoint request counters + latency histograms.

    Rendered in the Prometheus text exposition format at GET /metrics —
    the TPU-framework stand-in for the reference's BentoML prometheus
    metrics (enabled by default in serving, disabled only in tests:
    /root/reference/xfmr_rec/bentoml/prepare.py:66).
    """

    BUCKETS = (0.001, 0.005, 0.01, 0.05, 0.1, 0.5, 1.0, 5.0)

    def __init__(self) -> None:
        self._lock = threading.Lock()
        # (endpoint, status) -> count
        self._requests: dict[tuple[str, int], int] = {}
        # endpoint -> [per-bucket counts..., +inf count]
        self._buckets: dict[str, list[int]] = {}
        self._sum: dict[str, float] = {}

    def observe(self, endpoint: str, status: int, seconds: float) -> None:
        with self._lock:
            key = (endpoint, status)
            self._requests[key] = self._requests.get(key, 0) + 1
            buckets = self._buckets.setdefault(
                endpoint, [0] * (len(self.BUCKETS) + 1)
            )
            for i, bound in enumerate(self.BUCKETS):
                if seconds <= bound:
                    buckets[i] += 1
                    break
            else:
                buckets[-1] += 1
            self._sum[endpoint] = self._sum.get(endpoint, 0.0) + seconds

    def render(self) -> str:
        """Prometheus text format (counters + cumulative histograms)."""
        lines = [
            "# HELP http_requests_total Requests served, by endpoint/status.",
            "# TYPE http_requests_total counter",
        ]
        with self._lock:
            for (endpoint, status), count in sorted(self._requests.items()):
                lines.append(
                    f'http_requests_total{{endpoint="{endpoint}",'
                    f'status="{status}"}} {count}'
                )
            lines += [
                "# HELP http_request_duration_seconds Request latency.",
                "# TYPE http_request_duration_seconds histogram",
            ]
            for endpoint, buckets in sorted(self._buckets.items()):
                cumulative = 0
                for bound, count in zip(self.BUCKETS, buckets):
                    cumulative += count
                    lines.append(
                        f'http_request_duration_seconds_bucket{{endpoint='
                        f'"{endpoint}",le="{bound}"}} {cumulative}'
                    )
                cumulative += buckets[-1]
                lines.append(
                    f'http_request_duration_seconds_bucket{{endpoint='
                    f'"{endpoint}",le="+Inf"}} {cumulative}'
                )
                lines.append(
                    f'http_request_duration_seconds_sum{{endpoint='
                    f'"{endpoint}"}} {self._sum[endpoint]:.6f}'
                )
                lines.append(
                    f'http_request_duration_seconds_count{{endpoint='
                    f'"{endpoint}"}} {cumulative}'
                )
        return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# JSON-over-HTTP transport
# ---------------------------------------------------------------------------
_ENDPOINTS = {
    "embed_query": (("query", Query),),
    "search_items": (
        ("query", Query),
        ("exclude_item_ids", None),
        ("top_k", None),
    ),
    "recommend_with_query": (
        ("query", Query),
        ("exclude_item_ids", None),
        ("top_k", None),
    ),
    "item_id": (("item_id", None),),
    "process_item": (("item", ItemQuery),),
    "add_items": (("items", None),),
    "recommend_with_item": (
        ("item", ItemQuery),
        ("exclude_item_ids", None),
        ("top_k", None),
    ),
    "recommend_with_item_id": (
        ("item_id", None),
        ("exclude_item_ids", None),
        ("top_k", None),
    ),
    "user_id": (("user_id", None),),
    "process_user": (("user", UserQuery),),
    "recommend_with_user": (
        ("user", UserQuery),
        ("exclude_item_ids", None),
        ("top_k", None),
    ),
    "recommend_with_user_id": (
        ("user_id", None),
        ("exclude_item_ids", None),
        ("top_k", None),
    ),
    "search_items_text": (("query", None), ("top_k", None)),
    "search_users_text": (("query", None), ("top_k", None)),
    "model_name": (),
    "model_version": (),
}


class UnknownEndpointError(KeyError):
    """Raised by dispatch for paths outside the endpoint table — distinct
    from a KeyError escaping a service method (which is a 500, not a
    404-unknown)."""


def dispatch(service: RecService, endpoint: str, payload: dict) -> Any:
    """Route one JSON request body to a service method (shared by the HTTP
    handler and in-process tests)."""
    if endpoint not in _ENDPOINTS:
        msg = f"unknown endpoint: {endpoint}"
        raise UnknownEndpointError(msg)
    kwargs = {}
    for name, schema in _ENDPOINTS[endpoint]:
        if name in payload:
            value = payload[name]
            kwargs[name] = (
                schema.model_validate(value) if schema is not None else value
            )
    result = getattr(service, endpoint)(**kwargs)
    return _serialize(result)


def _serialize(result: Any) -> Any:
    if isinstance(result, list):
        return [_serialize(x) for x in result]
    if hasattr(result, "model_dump"):
        return result.model_dump()
    return result


class _Handler(BaseHTTPRequestHandler):
    service: RecService  # set by make_server
    metrics: RequestMetrics  # set by make_server

    def do_POST(self) -> None:  # noqa: N802 — http.server API
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length) if length else b"{}"
        endpoint = self.path.strip("/")
        start = time.perf_counter()
        try:
            payload = json.loads(body or b"{}")
            status, response = 200, dispatch(self.service, endpoint, payload)
        except UnknownEndpointError:
            status = 404
            response = {"error": f"unknown endpoint {endpoint}"}
        except NotFoundError as exc:
            status, response = 404, {"error": str(exc)}
        except PermissionError as exc:
            # disabled admin endpoints (add_items without
            # allow_catalog_mutation) are a client error, not a 500
            status, response = 403, {"error": str(exc)}
        except Exception as exc:  # noqa: BLE001 — error boundary
            # NB: a KeyError from INSIDE a service method lands here (500
            # + logged traceback), not in the unknown-endpoint 404 above
            status = 500
            logger.exception("error handling %s", endpoint)
            response = {"error": f"{type(exc).__name__}: {exc}"}
        # label safety: unknown paths collapse to one fixed label (no
        # unbounded cardinality from scanner spam, no label escaping
        # surprises in the exposition format). Record BEFORE replying:
        # this is a threaded server, so a client that already holds our
        # response can issue a GET /metrics that must see this request
        # counted (reply-then-record loses that ordering). Tradeoff,
        # deliberate: the duration excludes response serialization, and
        # a reply whose socket write fails is still counted at its
        # computed status — counter-visibility to the client wins.
        label = endpoint if endpoint in _ENDPOINTS else "_unknown"
        self.metrics.observe(label, status, time.perf_counter() - start)
        self._reply(status, response)

    def do_GET(self) -> None:  # noqa: N802 — http.server API
        path = self.path.split("?", 1)[0].strip("/")
        if path == "metrics":
            text = self.metrics.render()
            batcher = getattr(self.service, "batcher", None)
            if batcher is not None:
                text += (
                    "# TYPE microbatch_requests_total counter\n"
                    f"microbatch_requests_total {batcher.requests_served}\n"
                    "# TYPE microbatch_dispatches_total counter\n"
                    "microbatch_dispatches_total "
                    f"{batcher.batches_dispatched}\n"
                )
            data = text.encode()
            self.send_response(200)
            self.send_header(
                "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
            )
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
        elif path in ("healthz", "livez", "readyz"):
            self._reply(200, {"status": "ok"})
        else:
            self._reply(404, {"error": f"unknown endpoint {path}"})

    def _reply(self, status: int, payload: Any) -> None:
        data = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, fmt: str, *args: Any) -> None:
        logger.debug(fmt, *args)


def make_server(
    service: RecService, host: str = "127.0.0.1", port: int = 8000
) -> ThreadingHTTPServer:
    handler = type(
        "BoundHandler",
        (_Handler,),
        {"service": service, "metrics": RequestMetrics()},
    )
    return ThreadingHTTPServer((host, port), handler)


def serve_forever(
    service: RecService, host: str = "0.0.0.0", port: int = 8000  # noqa: S104
) -> None:
    server = make_server(service, host, port)
    logger.info("serving on %s:%d", host, port)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    thread.join()
