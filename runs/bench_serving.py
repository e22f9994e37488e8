"""Serving-path benchmark on the trained synthetic-ML1M model.

Restores the best checkpoint of the flagship run (round 3:
runs/ml1m-logistic-bertinit-long — the BERT-init retune; checkpoints
are gitignored, so the run must exist locally), writes the
deployable artifact, loads it through RecommenderEngine, and measures:
- single-request recommend_with_user_id latency (sequential; includes
  the axon relay RTT — noted as such),
- batched embed+search throughput (tokenize -> encode -> exact top-20),
  the server's steady-state capacity.
"""

from __future__ import annotations

import json
import pathlib
import time

RUN_DIR = pathlib.Path("runs/ml1m-logistic-bertinit-long")
ARTIFACT = pathlib.Path("artifacts/ml1m-logistic")


def main() -> None:
    import numpy as np

    from xfmr_rec_tpu.data.module import DataConfig
    from xfmr_rec_tpu.serving.engine import RecommenderEngine
    from xfmr_rec_tpu.serving.service import RecService
    from xfmr_rec_tpu.training.module import TrainConfig
    from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

    cfg = json.loads((RUN_DIR / "config.json").read_text())
    if not ARTIFACT.exists():
        trainer = Trainer(
            TrainConfig.model_validate(cfg["model"]),
            DataConfig.model_validate(cfg["data"]),
            TrainerConfig(**cfg["trainer"]),
        )
        trainer.restore_checkpoint("best")
        trainer.save(ARTIFACT)
        print("artifact written", flush=True)

    t0 = time.perf_counter()
    engine = RecommenderEngine(ARTIFACT)
    service = RecService(engine)
    print(f"engine load+warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    # single-request latency (user_id path: lookup + exclusions + embed +
    # search), sequential
    lat = []
    for user_id in range(1, 33):
        t0 = time.perf_counter()
        recs = service.recommend_with_user_id(user_id=user_id, top_k=20)
        lat.append(time.perf_counter() - t0)
    lat_ms = 1e3 * float(np.median(lat))
    assert len(recs) == 20

    # batched throughput: tokenize -> encode -> search, batch 256
    texts = [
        json.dumps({"title": f"Movie {i}", "genres": ["Drama"]})
        for i in range(256)
    ]
    queries = engine.embed(texts)  # warm shape
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        emb = engine.embed(texts)
        scores, ids = engine.index.search(emb, top_k=20)
    dt = (time.perf_counter() - t0) / iters
    print(
        json.dumps(
            {
                "single_request_ms_median": round(lat_ms, 1),
                "batch256_embed_search_ms": round(dt * 1e3, 1),
                "batch_qps": round(256 / dt),
                "corpus": len(engine.index),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
