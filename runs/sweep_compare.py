"""A/B: plain scan vs count-certified vs discard-certified at bench shapes."""

from __future__ import annotations

import json
import time

import numpy as np

CORPUS_SIZE = 1_048_576
DIM = 64
BATCH = 2048
TOP_K = 100
ITERS = 10


def bench(tag, fn, queries_dev):
    import jax

    t0 = time.perf_counter()
    jax.block_until_ready(fn(queries_dev))
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        jax.block_until_ready(fn(queries_dev))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        jax.block_until_ready(fn(queries_dev))
    dt = (time.perf_counter() - t0) / ITERS
    print(
        json.dumps(
            {
                "tag": tag,
                "ms": round(dt * 1e3, 2),
                "qps": round(BATCH / dt),
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import certified_topk, scan_topk

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = rng.normal(size=(BATCH, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
    corpus_dev = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))
    queries_dev = jax.device_put(jnp.asarray(queries, dtype=jnp.bfloat16))

    cases = [
        (
            "scan slots=1 bt512 ct2048",
            jax.jit(
                lambda q: scan_topk(
                    q, corpus_dev, TOP_K, batch_tile=512, corpus_tile=2048,
                    slots=1,
                )
            ),
        ),
        (
            "scan slots=2 bt256 ct2048",
            jax.jit(
                lambda q: scan_topk(
                    q, corpus_dev, TOP_K, batch_tile=256, corpus_tile=2048,
                    slots=2,
                )
            ),
        ),
        (
            "count-cert slots=2 bt256 ct2048",
            jax.jit(
                lambda q: certified_topk(
                    q, corpus_dev, TOP_K, batch_tile=256, corpus_tile=2048,
                    slots=2, method="count",
                )
            ),
        ),
        (
            "discard-cert slots=2 bt256 ct2048",
            jax.jit(
                lambda q: certified_topk(
                    q, corpus_dev, TOP_K, batch_tile=256, corpus_tile=2048,
                    slots=2, method="discard",
                )
            ),
        ),
        (
            "discard-cert slots=2 bt128 ct2048",
            jax.jit(
                lambda q: certified_topk(
                    q, corpus_dev, TOP_K, batch_tile=128, corpus_tile=2048,
                    slots=2, method="discard",
                )
            ),
        ),
    ]
    for tag, fn in cases:
        try:
            bench(tag, fn, queries_dev)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"tag": tag, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
