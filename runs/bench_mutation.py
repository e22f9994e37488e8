"""Live catalog mutation cost at serving geometry (VERDICT r3 #4).

Measures, at the 1M x 64 bf16 serving geometry on the real chip:
  1. steady-state search latency (B=32, k=20 — the engine's default
     endpoint shape after microbatching),
  2. the mutation wall time for add-64-items (device concat + index
     ctor + the precompile-then-swap warmup the engine now does while
     the OLD index keeps serving),
  3. the first post-swap search (should be steady-state: the stall was
     paid inside the mutation, off the read path),
  4. the stall the precompile AVOIDS (first search on a cold grown
     index without the warmup).

Run: python runs/bench_mutation.py  (TPU; ~2 min)
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from xfmr_rec_tpu.index.mips import RetrievalIndex

N, D, K, B = 1_048_576, 64, 20, 32


def timed_search(index, queries, reps=20):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        scores, _ = index.search(queries, top_k=K)
        np.asarray(scores)  # sync
        out.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(out)), float(np.min(out))


def main() -> None:
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(N, D)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    ids = np.arange(N)
    index = RetrievalIndex(corpus, ids, dtype="bfloat16", method="scan")
    queries = rng.normal(size=(B, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    index.search(queries, top_k=K)  # compile
    med, best = timed_search(index, queries)
    print(f"steady-state search   : p50 {med:.2f} ms (best {best:.2f})")

    new_rows = rng.normal(size=(64, D)).astype(np.float32)
    new_rows /= np.linalg.norm(new_rows, axis=1, keepdims=True)

    # --- engine mutation semantics: concat + ctor + precompile warmup
    import jax.numpy as jnp

    t0 = time.perf_counter()
    grown_corpus = jnp.concatenate(
        [index.corpus, jnp.asarray(new_rows, index.corpus.dtype)]
    )
    grown = RetrievalIndex(
        grown_corpus,
        np.concatenate([ids, np.arange(N, N + 64)]),
        dtype="bfloat16",
        method="scan",
    )
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    warm = np.zeros((1, D), np.float32)
    grown.search(warm, top_k=K)  # the engine's pre-swap warmup (B=1)
    grown.search(queries, top_k=K)  # and the serving batch shape
    t_precompile = time.perf_counter() - t0
    print(
        f"mutation (add 64)     : build {t_build * 1e3:.1f} ms + "
        f"precompile {t_precompile * 1e3:.1f} ms "
        "(both OFF the read path — old index serves throughout)"
    )

    t0 = time.perf_counter()
    scores, _ = grown.search(queries, top_k=K)
    np.asarray(scores)
    first = (time.perf_counter() - t0) * 1e3
    med2, _ = timed_search(grown, queries)
    print(
        f"first post-swap search: {first:.2f} ms "
        f"(steady-state after    : p50 {med2:.2f} ms)"
    )

    # --- the stall precompile avoids: cold grown index, no warmup
    grown_cold = RetrievalIndex(
        jnp.concatenate(
            [index.corpus, jnp.asarray(new_rows * 0.99, index.corpus.dtype)]
        ),
        np.concatenate([ids, np.arange(N, N + 64)]),
        dtype="bfloat16",
        method="scan",
    )
    t0 = time.perf_counter()
    scores, _ = grown_cold.search(queries, top_k=K)
    np.asarray(scores)
    cold = (time.perf_counter() - t0) * 1e3
    print(f"cold first search (the avoided stall): {cold:.0f} ms")


if __name__ == "__main__":
    main()
