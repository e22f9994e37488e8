"""Guaranteed-exact search throughput at bench scale (1M x 2048 x k=100).

Times RetrievalIndex.search_certified end-to-end (pass-1 certified scan,
shuffled-lane retry, dense fallback, host merge) for both the f32 and
the packed-key methods, and verifies row exactness against the dense
reference (score multiset for f32; membership-within-quantum and
decoded-floor bounds for packed).
"""

from __future__ import annotations

import json
import sys
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

    methods = sys.argv[1:] or ["f32", "packed"]
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = rng.normal(size=(BATCH, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

    idx = RetrievalIndex(
        corpus, np.arange(CORPUS_SIZE), dtype="bfloat16", method="scan"
    )

    # dense reference for the exactness check
    ref_fn = jax.jit(
        lambda q: exact_topk(q, idx.corpus, TOP_K, chunk_size=131072)
    )
    import jax.numpy as jnp

    ref_vals, _ = jax.block_until_ready(
        ref_fn(jnp.asarray(queries, dtype=idx.corpus.dtype))
    )
    ref_vals = np.asarray(ref_vals)

    for method in methods:
        t0 = time.perf_counter()
        scores, ids = idx.search_certified(
            queries, top_k=TOP_K, method=method
        )
        print(
            f"[{method}] first call (compiles): "
            f"{time.perf_counter() - t0:.1f}s",
            flush=True,
        )

        t0 = time.perf_counter()
        for _ in range(ITERS):
            scores, ids = idx.search_certified(
                queries, top_k=TOP_K, method=method
            )
        dt = (time.perf_counter() - t0) / ITERS
        qps = BATCH / dt

        if method == "f32":
            # exact contract: score multiset equals the dense reference
            mismatches = int(
                sum(
                    not np.array_equal(
                        np.sort(scores[b]), np.sort(ref_vals[b])
                    )
                    for b in range(BATCH)
                )
            )
        else:
            # packed contract: returned members score >= the reference
            # k-th value minus tolerance. The tolerance is dominated by
            # bf16 SCORING noise (~2^-8 relative, ~8e-3 here), because
            # the packed path rounds the pre-scaled queries to bf16 and
            # the reference rounds the raw queries — two equally-valid
            # bf16 roundings of the same scores; the key quantum
            # (bound * 2^(idx_bits-21) ~ 2.6e-4) is an order below it.
            tol = 1e-2
            kth = ref_vals[:, -1]
            mismatches = int(
                sum(
                    (scores[b] < kth[b] - tol).any()
                    or (scores[b] > ref_vals[b][0] + tol).any()
                    for b in range(BATCH)
                )
            )
        print(
            json.dumps(
                {
                    "method": method,
                    **idx.last_certified_stats,
                    "ms": round(dt * 1e3, 2),
                    "qps": round(qps),
                    "contract_violations": mismatches,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
