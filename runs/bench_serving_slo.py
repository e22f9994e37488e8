"""Serving SLO harness: sustained open-loop load (VERDICT r4 #5).

Builds the deployable artifact from the round-4 flagship checkpoint
(runs/ml1m-r4-flagship-s0), serves it through RecService with the
micro-batcher, and drives OPEN-LOOP fixed-rate text-search load
(requests fired on a fixed schedule regardless of completions — the
honest way to find the knee; closed-loop self-throttles):

- stepped offered load: 25 -> 400 qps, 12 s per level,
  p50/p95/p99/p99.9 per level + achieved throughput,
- the same sweep with a concurrent catalog mutator calling
  engine.add_items every 2 s (precompile-then-swap path),
- a sequential recommend_with_user_id baseline (the un-batched
  user-path RTT floor).

All latencies are RELAY-INCLUSIVE (~28 ms RTT to the remote chip) and
host-limited by this box's single CPU core (tokenize + client threads
share it) — labeled as such; a directly-attached multi-core deployment
keeps the device-side margin.

Run: python runs/bench_serving_slo.py  (TPU, ~4 min)
"""

from __future__ import annotations

import json
import pathlib
import sys
import threading
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

RUN_DIR = pathlib.Path("runs/ml1m-r4-flagship-s0")
ARTIFACT = pathlib.Path("artifacts/slo-flagship")
LEVELS = (25, 50, 100, 200, 400)
LEVEL_SECONDS = 12.0
MICRO_BATCH = 32
WAIT_MS = 5.0


def build_artifact():
    from xfmr_rec_tpu.data.module import DataConfig, RecDataModule
    from xfmr_rec_tpu.training.module import TrainConfig
    from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

    if ARTIFACT.exists():
        return
    cfg = json.loads((RUN_DIR / "config.json").read_text())
    tcfg = dict(cfg["trainer"])
    tcfg["log_dir"] = "/tmp/slo-build-logs"
    tcfg["run_name"] = ""
    trainer = Trainer(
        TrainConfig.model_validate(cfg["model"]),
        data=RecDataModule(DataConfig.model_validate(cfg["data"])),
        trainer_config=TrainerConfig(**tcfg),
    )
    trainer.setup()
    ckpt = RUN_DIR / "ckpt" / "best"
    if ckpt.is_dir():
        trainer.restore_checkpoint(str(ckpt))
    else:
        # flagship ckpts were pruned from the tree; serving latency/knee
        # depends on model shape + corpus size, not trained quality, so
        # a short fresh fit of the same config is an equivalent subject
        trainer.trainer_config.limit_train_batches = 200
        trainer.fit()
    trainer.save(ARTIFACT)
    print("artifact written", flush=True)


def open_loop(service, rate_qps, seconds, queries):
    """Fire requests on a fixed schedule from worker threads; collect
    per-request latency. Returns (latencies_ms, achieved_qps, errors)."""
    from xfmr_rec_tpu.serving.schemas import Query

    n = int(rate_qps * seconds)
    interval = 1.0 / rate_qps
    latencies = np.full(n, np.nan)
    errors = [0]
    lock = threading.Lock()

    def fire(i):
        t0 = time.perf_counter()
        try:
            service.search_items(
                Query(text=queries[i % len(queries)]), top_k=20
            )
            latencies[i] = (time.perf_counter() - t0) * 1e3
        except Exception:  # noqa: BLE001 — count, don't crash the sweep
            with lock:
                errors[0] += 1

    threads = []
    start = time.perf_counter()
    for i in range(n):
        target = start + i * interval
        now = time.perf_counter()
        if target > now:
            time.sleep(target - now)
        t = threading.Thread(target=fire, args=(i,), daemon=True)
        t.start()
        threads.append(t)
    for t in threads:
        t.join(timeout=30)
    wall = time.perf_counter() - start
    done = np.isfinite(latencies)
    return latencies[done], done.sum() / wall, errors[0]


def pct(x, q):
    return float(np.percentile(x, q)) if len(x) else float("nan")


def main() -> None:
    from xfmr_rec_tpu.serving.engine import RecommenderEngine
    from xfmr_rec_tpu.serving.service import RecService

    build_artifact()
    engine = RecommenderEngine(ARTIFACT)
    service = RecService(
        engine, micro_batch=MICRO_BATCH, micro_batch_wait_ms=WAIT_MS
    )
    rng = np.random.default_rng(0)
    queries = [
        json.dumps(
            {
                "title": f"Movie {int(rng.integers(1, 4000))}",
                "genres": ["Drama", "Comedy", "Action"][
                    : 1 + int(rng.integers(3))
                ],
            }
        )
        for _ in range(512)
    ]
    # warm both the embed and search graphs at the batcher's shapes
    open_loop(service, 25, 2.0, queries)

    def mutate_forever(stop):
        i = 0
        while not stop.is_set():
            from xfmr_rec_tpu.serving.schemas import ItemQuery

            engine.add_items(
                [
                    ItemQuery(
                        movie_id=10_000_000 + i * 8 + j,
                        movie_text=json.dumps(
                            {"title": f"Live {i}-{j}", "genres": ["Drama"]}
                        ),
                    )
                    for j in range(8)
                ]
            )
            i += 1
            stop.wait(2.0)

    results = []
    for with_mutation in (False, True):
        stop = threading.Event()
        mut = None
        if with_mutation:
            mut = threading.Thread(
                target=mutate_forever, args=(stop,), daemon=True
            )
            mut.start()
        for rate in LEVELS:
            lat, achieved, errs = open_loop(
                service, rate, LEVEL_SECONDS, queries
            )
            row = {
                "mutating": with_mutation,
                "offered_qps": rate,
                "achieved_qps": round(achieved, 1),
                "p50_ms": round(pct(lat, 50), 1),
                "p95_ms": round(pct(lat, 95), 1),
                "p99_ms": round(pct(lat, 99), 1),
                "p999_ms": round(pct(lat, 99.9), 1),
                "errors": errs,
                "n": int(len(lat)),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        if mut is not None:
            stop.set()
            mut.join(timeout=5)

    # sequential user-path RTT floor
    seq = []
    for user_id in range(1, 33):
        t0 = time.perf_counter()
        service.recommend_with_user_id(user_id=user_id, top_k=20)
        seq.append((time.perf_counter() - t0) * 1e3)
    print(
        json.dumps(
            {
                "sequential_recommend_with_user_id_p50_ms": round(
                    float(np.median(seq)), 1
                )
            }
        )
    )
    out = pathlib.Path("runs/serving_slo.json")
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")
    service.batcher.close()


if __name__ == "__main__":
    main()
