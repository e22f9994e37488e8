"""Serve the 10M-item corpus end-to-end (BASELINE config 4 closer).

Trains a short bloom-table run (2^18 buckets — the compressed regime the
table exists for), packages the full serving artifact (trainer.save
embeds all 10M items into index/corpus.npz), loads RecommenderEngine +
RecService over it, and measures:

- artifact prep wall time (train + full 10M-item corpus embed + write)
- artifact size on disk
- golden-value endpoint checks (serving/prepare.test_queries) at 10M
- single recommend_with_user_id latency (relay-inclusive, n=20)
- batched guaranteed-exact search QPS at 10M x k=100 through the
  engine's own index (the number the sharded-throughput model predicts
  ~30.7k for one chip: T = 7.92 ms + 12.55 ns/row at B=4096)

Writes runs/items10m-serve/metrics.jsonl. Idempotent: exits early if
that file is non-empty.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

RUN_DIR = pathlib.Path("runs/items10m-serve")
ARTIFACT = RUN_DIR / "artifact"
TRAIN_STEPS = 1500
BATCH = 4096
TOP_K = 100
ITERS = 5


def main() -> None:
    metrics_path = RUN_DIR / "metrics.jsonl"
    if metrics_path.exists() and metrics_path.stat().st_size > 0:
        print("skip: metrics.jsonl exists")
        return
    RUN_DIR.mkdir(parents=True, exist_ok=True)

    from xfmr_rec_tpu.data.module import DataConfig, RecDataModule
    from xfmr_rec_tpu.serving.engine import RecommenderEngine
    from xfmr_rec_tpu.serving.prepare import test_queries
    from xfmr_rec_tpu.serving.service import RecService
    from xfmr_rec_tpu.training.module import TrainConfig
    from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

    out: dict[str, float] = {}

    if not (ARTIFACT / "processors.json").exists():
        t0 = time.time()
        trainer = Trainer(
            TrainConfig(
                item_id_embedding="bloom",
                item_id_buckets=262144,
                max_length=24,
                learning_rate=1e-3,
            ),
            data=RecDataModule(
                DataConfig(
                    data_dir="data/items10m", batch_size=1024, max_length=24
                )
            ),
            trainer_config=TrainerConfig(
                max_steps=TRAIN_STEPS,
                # no validation inside the short fit: the 10M-item corpus
                # embed happens once, in save()
                val_check_interval=1.0,
                checkpointing=False,
                encode_batch_size=4096,
                log_every_steps=500,
                run_name="items10m-serve",
                seed=0,
            ),
        )
        trainer.fit()
        out["train_s"] = time.time() - t0
        t1 = time.time()
        trainer.save(ARTIFACT)
        out["save_embed_s"] = time.time() - t1
        del trainer

    out["artifact_mb"] = sum(
        f.stat().st_size for f in ARTIFACT.rglob("*") if f.is_file()
    ) / 2**20

    t0 = time.time()
    engine = RecommenderEngine(ARTIFACT)
    out["engine_load_s"] = time.time() - t0
    service = RecService(engine)

    test_queries(service)  # golden endpoint checks at 10M items
    out["golden_checks"] = 1.0

    # single-request latency, relay-inclusive (post-warmup: test_queries
    # above already compiled every graph)
    lat = []
    for i in range(20):
        t0 = time.perf_counter()
        service.recommend_with_user_id(1 + i, top_k=20)
        lat.append(time.perf_counter() - t0)
    out["recommend_p50_ms"] = float(np.median(lat) * 1e3)
    out["recommend_max_ms"] = float(np.max(lat) * 1e3)

    # batched guaranteed-exact QPS at 10M: real user-text queries
    # through the engine's own index (certified scan + fallback)
    users = [engine.get_user(1 + i) for i in range(64)]
    texts = [u.user_text for u in users] * (BATCH // 64)
    q = engine.embed(texts[:BATCH])
    idx = engine.index
    t0 = time.perf_counter()
    idx.search_certified(q, top_k=TOP_K, method="packed")
    out["batched_first_call_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        scores, ids = idx.search_certified(q, top_k=TOP_K, method="packed")
    dt = (time.perf_counter() - t0) / ITERS
    out["guaranteed_qps_10m"] = BATCH / dt
    out["guaranteed_batch_ms"] = dt * 1e3
    out["corpus_rows"] = float(idx.corpus.shape[0])

    # int8 corpus at 10M: the 2x items/chip capacity story at the scale
    # it exists for (per-item scales; bf16-speed scan)
    from xfmr_rec_tpu.index import RetrievalIndex

    corpus_f32 = np.load(ARTIFACT / "index" / "corpus.npz")["embeddings"]
    idx8 = RetrievalIndex(
        corpus_f32, np.asarray(idx.ids), dtype="int8", method="scan"
    )
    del corpus_f32
    idx8.search_certified(q, top_k=TOP_K, method="packed")  # compile
    t0 = time.perf_counter()
    for _ in range(ITERS):
        idx8.search_certified(q, top_k=TOP_K, method="packed")
    dt8 = (time.perf_counter() - t0) / ITERS
    out["guaranteed_qps_10m_int8"] = BATCH / dt8
    del idx8

    with metrics_path.open("a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
