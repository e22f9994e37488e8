"""Kernel experiment 1: where does the certified path's time go?

Times, at bench shapes (B=2048, N=1M, D=64, k=100):
  a) lane_max_scan alone (slots=2, track_discards) — the pallas_call
  b) the full certified_topk (scan + lax.top_k epilogue + gather)
  c) lax.top_k alone over a (B, 2*ct) f32 buffer
  d) uncertified slots=1 scan at bt=512 (the 255k reference point)
Pipelined dispatch (launch ITERS, block once).
"""

from __future__ import annotations

import time

import numpy as np

CORPUS_SIZE = 1_048_576
DIM = 64
BATCH = 2048
TOP_K = 100
WARMUP = 3
ITERS = 20


def timeit(fn, *args):
    import jax

    for _ in range(WARMUP):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / ITERS


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import certified_topk, lane_max_scan

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = rng.normal(size=(BATCH, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
    corpus_dev = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))
    queries_dev = jax.device_put(jnp.asarray(queries, dtype=jnp.bfloat16))

    @jax.jit
    def scan_only(q, c):
        return lane_max_scan(
            q, c, batch_tile=256, corpus_tile=2048, slots=2,
            track_discards=True,
        )

    @jax.jit
    def full(q, c):
        return certified_topk(
            q, c, TOP_K, batch_tile=256, corpus_tile=2048, slots=2
        )

    @jax.jit
    def scan1_bt256(q, c):
        return lane_max_scan(
            q, c, batch_tile=256, corpus_tile=2048, slots=1
        )

    vals = jnp.asarray(
        rng.normal(size=(BATCH, 4096)).astype(np.float32)
    )
    pos = jnp.asarray(
        rng.integers(0, CORPUS_SIZE, size=(BATCH, 4096)).astype(np.int32)
    )

    @jax.jit
    def topk_epilogue(v, p):
        tv, tl = jax.lax.top_k(v, TOP_K)
        return tv, jnp.take_along_axis(p, tl, axis=-1)

    for name, fn, args in [
        ("scan_slots2_discard_bt256", scan_only, (queries_dev, corpus_dev)),
        ("certified_full_bt256", full, (queries_dev, corpus_dev)),
        ("topk_epilogue_4096", topk_epilogue, (vals, pos)),
        ("scan_slots1_bt256", scan1_bt256, (queries_dev, corpus_dev)),
    ]:
        dt = timeit(fn, *args)
        print(f"{name}: {dt * 1e3:.2f} ms  ({BATCH / dt:,.0f} qps)")


if __name__ == "__main__":
    main()
