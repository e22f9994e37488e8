"""Headline benchmark: exhaustive top-100 retrieval QPS over a 1M corpus.

North-star (BASELINE.json): exhaustive top-100 over the full item corpus
at >100k queries/sec on one TPU v5e chip. The reference publishes no
numbers (its retrieval is LanceDB IVF-HNSW-PQ *approximate* search on
CPU); vs_baseline is reported against the 100k QPS north-star target.

What runs: the packed-key Pallas scan (xfmr_rec_tpu/ops/topk_pallas.py
`packed_certified_topk`) — every corpus item is scored (exhaustive),
scores are packed into monotonic int32 keys (quantized score in the high
mantissa bits, corpus-tile index in the low bits, lane implicit), the
per-lane slot contest reduces to max/min/max/min, and the SAME sweep
tracks the max key ever evicted from any lane, which proves per-row
exactness of the top-k at the key quantum (~5e-5 of a unit score at this
geometry). ~96% of rows certify in one sweep; the rest re-run through
lane-shuffled retries / the dense path when guarantees are required
(RetrievalIndex.search_certified(method="packed")).

Reference points measured on the same chip/shapes (see BENCH_NOTES.md):
  XLA dense (B,N) matmul + lax.top_k : ~3k qps
  XLA approx_max_k(recall=0.95)      : ~52k qps
  uncertified scan, slots=1          : ~255k qps (recall 97.6%)
  f32 certified (discard, 1 sweep)   : ~145k qps (round-1 headline)
  packed-key certified, B=2048       : ~262-277k qps
  this config (merge+bias, B=4096)   : ~306k qps

Timing harness notes: inputs vary per call (4 query batches cycled) and
the run drains through a host transfer of the result — through the axon
relay, `block_until_ready` alone under-reports and repeated identical
calls can be cached.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np

CORPUS_SIZE = 1_048_576  # 1M items
DIM = 64
BATCH = 4096
TOP_K = 100
BATCH_TILE = 512
CORPUS_TILE = 2048
WARMUP = 3
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    # trailing 1.5 column: the packed-key window bias rides the matmul
    # (bias_in_dot) — free on the MXU, saves a VPU add per score element
    corpus = np.concatenate(
        [corpus, np.full((CORPUS_SIZE, 1), 1.5, np.float32)], axis=1
    )
    corpus_dev = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))
    query_batches = []
    for _ in range(4):
        queries = rng.normal(size=(BATCH, DIM)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
        query_batches.append(
            jax.device_put(jnp.asarray(queries, dtype=jnp.bfloat16))
        )

    # corpus as a jit ARGUMENT — a closure capture would bake the 128 MB
    # corpus into the compiled program as a constant
    @jax.jit
    def search(q, c):
        return packed_certified_topk(
            q,
            c,
            TOP_K,
            score_bound=1.0,
            batch_tile=BATCH_TILE,
            corpus_tile=CORPUS_TILE,
            merge_levels=1,
            bias_in_dot=True,
            recompute_scores=False,
        )

    def drain(result):
        # host transfer forces real completion through the relay
        return float(jnp.sum(result[0].astype(jnp.float32)[..., :1]))

    out = None
    for i in range(WARMUP):
        out = search(query_batches[i % 4], corpus_dev)
    drain(out)
    certified_frac = float(jnp.mean(out[2].astype(jnp.float32)))

    start = time.perf_counter()
    for i in range(ITERS):
        out = search(query_batches[i % 4], corpus_dev)
    drain(out)
    elapsed = time.perf_counter() - start

    qps = BATCH * ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": (
                    f"exhaustive top-{TOP_K} MIPS over {CORPUS_SIZE} items "
                    f"(dim {DIM}, bf16, Pallas packed-key scan + exactness "
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
