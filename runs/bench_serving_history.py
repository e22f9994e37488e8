"""Serving-path benchmark for the HISTORY user tower.

Restores runs/ml1m-hist16-infonce-s0 (best ckpt), writes its artifact,
and measures the user-query path the fusion adds on top of the text
tower: tokenize profile -> text encode -> gather H history embeddings
from the packaged corpus -> fusion block -> exact top-20 search.

Reported:
- single-request /recommend_with_user latency with H=16 history entries
  (sequential; includes the axon relay RTT — noted as such)
- the same request with empty history (fusion over the profile slot only)
- batched item-embed+search throughput (unchanged by the user tower;
  sanity reference vs runs/bench_serving.py)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

RUN_DIR = pathlib.Path("runs/ml1m-hist16-infonce-s0")
ARTIFACT = pathlib.Path("artifacts/ml1m-hist16")


def main() -> None:
    import numpy as np

    from xfmr_rec_tpu.data.module import DataConfig, RecDataModule
    from xfmr_rec_tpu.serving.engine import RecommenderEngine
    from xfmr_rec_tpu.serving.schemas import Activity, UserQuery
    from xfmr_rec_tpu.serving.service import RecService
    from xfmr_rec_tpu.training.module import TrainConfig
    from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

    cfg = json.loads((RUN_DIR / "config.json").read_text())
    if not ARTIFACT.exists():
        trainer = Trainer(
            TrainConfig.model_validate(cfg["model"]),
            RecDataModule(DataConfig.model_validate(cfg["data"])),
            TrainerConfig(**cfg["trainer"]),
        )
        trainer.setup()
        trainer.restore_checkpoint(str(RUN_DIR / "ckpt" / "best"))
        trainer.save(ARTIFACT)
        print("artifact written", flush=True)

    t0 = time.perf_counter()
    engine = RecommenderEngine(ARTIFACT)
    service = RecService(engine)
    print(f"engine load+warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    movie_ids = [int(i) for i in list(engine._hist_pos_of_id)[:16]]

    def user_query(with_history: bool) -> UserQuery:
        history = (
            [
                Activity(
                    movie_id=m,
                    rating=4,
                    datetime=j,
                    movie_rn=j,
                    movie_text="",
                )
                for j, m in enumerate(movie_ids)
            ]
            if with_history
            else []
        )
        return UserQuery(
            user_id=1,
            user_text='{"gender":"F","age":25,"occupation":4,"zipcode":"12345"}',
            history=history,
        )

    results = {}
    for label, with_hist in (("hist16", True), ("no_hist", False)):
        query = user_query(with_hist)
        service.recommend_with_user(query, top_k=20)  # warm the jit
        lat = []
        for _ in range(32):
            t0 = time.perf_counter()
            recs = service.recommend_with_user(query, top_k=20)
            lat.append(time.perf_counter() - t0)
        assert len(recs) == 20
        results[f"recommend_with_user_{label}_ms_median"] = round(
            1e3 * float(np.median(lat)), 1
        )

    texts = [
        json.dumps({"title": f"Movie {i}", "genres": ["Drama"]})
        for i in range(256)
    ]
    engine.embed(texts)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        emb = engine.embed(texts)
        engine.index.search(emb, top_k=20)
    dt = (time.perf_counter() - t0) / iters
    results["batch256_embed_search_ms"] = round(dt * 1e3, 1)
    results["batch_qps"] = round(256 / dt)
    results["corpus"] = len(engine.index)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
