"""Guaranteed-exact search throughput at bench scale (1M x 2048 x k=100).

Times RetrievalIndex.search_certified end-to-end (pass-1 certified scan,
shuffled-lane retry, dense fallback, host merge) and verifies every row's
score multiset against the dense reference.
"""

from __future__ import annotations

import json
import time

import numpy as np

CORPUS_SIZE = 1_048_576
DIM = 64
BATCH = 2048
TOP_K = 100
ITERS = 5


def main() -> None:
    import jax

    from xfmr_rec_tpu.index import RetrievalIndex
    from xfmr_rec_tpu.index.mips import exact_topk

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = rng.normal(size=(BATCH, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

    idx = RetrievalIndex(
        corpus, np.arange(CORPUS_SIZE), dtype="bfloat16", method="scan"
    )

    # warm all three stages' compiles
    t0 = time.perf_counter()
    scores, ids = idx.search_certified(queries, top_k=TOP_K)
    print(f"first call (compiles): {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        scores, ids = idx.search_certified(queries, top_k=TOP_K)
    dt = (time.perf_counter() - t0) / ITERS
    qps = BATCH / dt
    print(json.dumps(idx.last_certified_stats), flush=True)

    # verify exactness (score multiset) against the dense reference
    ref_fn = jax.jit(
        lambda q: exact_topk(q, idx.corpus, TOP_K, chunk_size=131072)
    )
    import jax.numpy as jnp

    ref_vals, _ = jax.block_until_ready(
        ref_fn(jnp.asarray(queries, dtype=idx.corpus.dtype))
    )
    ref_vals = np.asarray(ref_vals)
    mismatches = int(
        sum(
            not np.array_equal(np.sort(scores[b]), np.sort(ref_vals[b]))
            for b in range(BATCH)
        )
    )
    print(
        json.dumps(
            {
                "ms": round(dt * 1e3, 2),
                "qps": round(qps),
                "exact_mismatches": mismatches,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
