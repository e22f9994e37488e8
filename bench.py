"""Headline benchmark: exhaustive top-100 retrieval QPS over a 1M corpus.

North-star (BASELINE.json): exhaustive top-100 over the full item corpus
at >100k queries/sec on one TPU v5e chip. The reference publishes no
numbers (its retrieval is LanceDB IVF-HNSW-PQ *approximate* search on
CPU); vs_baseline is reported against the 100k QPS north-star target.

What runs: the Pallas fused score+select kernel
(xfmr_rec_tpu/ops/topk_pallas.py) in certified mode — every corpus item
is scored (exhaustive), top-k selected via a 2-slot lane max, and the
SAME sweep tracks the max value ever evicted from any lane, which
proves per-row exactness (~96% of rows certify; the rest are near-exact
with recall ~99.9% and are re-run through the dense path when guarantees
are required — RetrievalIndex.search_certified).

Reference points measured on the same chip/shapes (see BENCH_NOTES.md):
  XLA dense (B,N) matmul + lax.top_k : ~3k qps
  XLA approx_max_k(recall=0.95)      : ~52k qps
  uncertified scan, slots=1          : ~255k qps (recall 97.6%)
  uncertified scan, slots=2          : ~156k qps (recall 99.96%)
  certified (count method, 2 sweeps) : ~117k qps
  certified (discard, single sweep)  : ~148k qps  <- this config

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
BATCH_TILE = 256
CORPUS_TILE = 2048
WARMUP = 3
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import certified_topk

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = rng.normal(size=(BATCH, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

    corpus_dev = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))
    queries_dev = jax.device_put(jnp.asarray(queries, dtype=jnp.bfloat16))

    # corpus as a jit ARGUMENT — a closure capture would bake the 128 MB
    # corpus into the compiled program as a constant
    @jax.jit
    def search(q, c):
        return certified_topk(
            q,
            c,
            TOP_K,
            batch_tile=BATCH_TILE,
            corpus_tile=CORPUS_TILE,
            slots=2,
        )

    for _ in range(WARMUP):
        out = search(queries_dev, corpus_dev)
    jax.block_until_ready(out)
    certified_frac = float(jnp.mean(out[2].astype(jnp.float32)))

    start = time.perf_counter()
    for _ in range(ITERS):
        out = search(queries_dev, corpus_dev)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    qps = BATCH * ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": (
                    f"exhaustive top-{TOP_K} MIPS over {CORPUS_SIZE} items "
                    f"(dim {DIM}, bf16, Pallas fused scan + exactness "
                    f"certificates; certified_frac="
                    f"{certified_frac:.3f}), 1 chip"
                ),
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / 100_000, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
