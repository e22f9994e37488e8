"""Headline benchmark: exhaustive top-100 retrieval QPS over a large corpus.

North-star (BASELINE.json): exhaustive top-100 over the full item corpus
at >100k queries/sec on one TPU v5e chip. The reference has no published
numbers (its retrieval is LanceDB ANN on CPU); vs_baseline is reported
against the 100k QPS north-star target.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np

CORPUS_SIZE = 1_048_576  # 1M items
DIM = 64
BATCH = 2048
TOP_K = 100
CHUNK = 131_072
WARMUP = 3
ITERS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.index.mips import exact_topk

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = rng.normal(size=(BATCH, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

    corpus_dev = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))
    queries_dev = jax.device_put(jnp.asarray(queries, dtype=jnp.bfloat16))

    @jax.jit
    def search(q):
        return exact_topk(q, corpus_dev, TOP_K, chunk_size=CHUNK)

    # warmup + compile
    for _ in range(WARMUP):
        scores, positions = search(queries_dev)
    jax.block_until_ready((scores, positions))

    start = time.perf_counter()
    for _ in range(ITERS):
        scores, positions = search(queries_dev)
    jax.block_until_ready((scores, positions))
    elapsed = time.perf_counter() - start

    qps = BATCH * ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": (
                    f"exhaustive top-{TOP_K} MIPS over {CORPUS_SIZE} items "
                    f"(dim {DIM}, bf16), 1 chip"
                ),
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / 100_000, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
