"""Micro-batching under concurrency: measured effect of request coalescing.

The reference serves through BentoML, whose runners adaptively batch
concurrent requests into one model call — the property that keeps an
accelerator-backed service throughput-efficient under load. Round 3
added the TPU-native equivalent (serving/batching.py); this bench
measures its effect at the service layer (HTTP parsing excluded on
purpose: the quantity under test is device-dispatch coalescing, and the
stdlib HTTP frontend is identical in both modes).

Protocol: T client threads each issue R sequential `search_items` text
queries against the flagship artifact. Off = every request is its own
tokenize->encode->search dispatch (batch 1). On = MicroBatcher
coalesces (max_batch 64, max_wait 2 ms). Reported: aggregate QPS,
median/p99 per-request latency, and device dispatches per request.
"""

from __future__ import annotations

import json
import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ARTIFACT = pathlib.Path("artifacts/ml1m-logistic")


def run_mode(service, *, threads: int, reqs: int, texts) -> dict:
    import numpy as np

    lat: list[float] = []
    lock = threading.Lock()
    start = threading.Barrier(threads + 1)

    def client(tid: int) -> None:
        mine = []
        start.wait()
        for r in range(reqs):
            q = texts[(tid * reqs + r) % len(texts)]
            t0 = time.perf_counter()
            out = service.search_items(q, top_k=20)
            mine.append(time.perf_counter() - t0)
            assert len(out) == 20
        with lock:
            lat.extend(mine)

    workers = [
        threading.Thread(target=client, args=(t,)) for t in range(threads)
    ]
    for w in workers:
        w.start()
    start.wait()
    t0 = time.perf_counter()
    for w in workers:
        w.join()
    wall = time.perf_counter() - t0
    n = threads * reqs
    return {
        "threads": threads,
        "requests": n,
        "wall_s": round(wall, 2),
        "qps": round(n / wall, 1),
        "lat_ms_p50": round(1e3 * float(np.percentile(lat, 50)), 1),
        "lat_ms_p99": round(1e3 * float(np.percentile(lat, 99)), 1),
    }


def main() -> None:
    from xfmr_rec_tpu.serving.engine import RecommenderEngine
    from xfmr_rec_tpu.serving.schemas import Query
    from xfmr_rec_tpu.serving.service import RecService

    if not ARTIFACT.exists():
        raise SystemExit(
            "artifact missing — run runs/bench_serving.py first to export it"
        )

    engine = RecommenderEngine(ARTIFACT)
    texts = [
        Query(text=json.dumps({"title": f"Movie {i} (199{i % 10})",
                               "genres": ["Drama", "Comedy"][i % 2:]}))
        for i in range(64)
    ]

    plain = RecService(engine)
    batched = RecService(engine, micro_batch=64, micro_batch_wait_ms=2.0)

    # warm both paths: every pow2 padded width the batcher can emit —
    # a width first seen mid-measurement costs a ~2s jit compile that
    # lands in that run's p99 (observed: threads=8 p99 2.1s on a cold
    # width-8 shape). Drive the dispatch directly so each width is
    # deterministic rather than hoping the coalescer forms it.
    from xfmr_rec_tpu.serving.batching import _Request

    plain.search_items(texts[0], top_k=20)
    width = 1
    while width <= 64:
        batched.batcher._dispatch(
            [_Request(texts[i % len(texts)].text, [], 20)
             for i in range(width)]
        )
        width *= 2

    for threads in (1, 8, 32):
        off = run_mode(plain, threads=threads, reqs=32, texts=texts)
        b0 = batched.batcher.batches_dispatched
        on = run_mode(batched, threads=threads, reqs=32, texts=texts)
        on["dispatches_per_request"] = round(
            (batched.batcher.batches_dispatched - b0) / on["requests"], 3
        )
        print(json.dumps({"mode": "off", **off}), flush=True)
        print(json.dumps({"mode": "on", **on}), flush=True)

    batched.batcher.close()


if __name__ == "__main__":
    main()
