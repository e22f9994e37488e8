"""Kernel experiment 2: packed-key scan vs f32 certified scan on TPU.

Bench shapes (B=2048, N=1M, D=64, k=100). Uses bench.py's exact harness
shape (one jitted fn, warmup + certified_frac sync, ITERS pipelined
calls, one block) — and additionally a varied-input harness (per-iter
distinct query batches) to rule out relay-side result caching.
"""

from __future__ import annotations

import sys
import time

import numpy as np

CORPUS_SIZE = 1_048_576
DIM = 64
BATCH = 2048
TOP_K = 100
WARMUP = 3
ITERS = 20


def bench_one(name, fn, queries_list, corpus_dev, report_cert=True):
    import jax
    import jax.numpy as jnp

    out = None
    for _ in range(WARMUP):
        out = fn(queries_list[0], corpus_dev)
    jax.block_until_ready(out)
    cert = (
        float(jnp.mean(out[2].astype(jnp.float32))) if report_cert else -1.0
    )
    start = time.perf_counter()
    for i in range(ITERS):
        out = fn(queries_list[i % len(queries_list)], corpus_dev)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    dt = elapsed / ITERS
    print(
        f"{name}: {dt * 1e3:.2f} ms  ({BATCH / dt:,.0f} qps)"
        + (f"  certified={cert:.3f}" if report_cert else ""),
        flush=True,
    )
    return dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import (
        certified_topk,
        packed_certified_topk,
    )

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    corpus_dev = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))

    def make_queries(n):
        out = []
        for _ in range(n):
            q = rng.normal(size=(BATCH, DIM)).astype(np.float32)
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            out.append(jax.device_put(jnp.asarray(q, dtype=jnp.bfloat16)))
        return out

    q_one = make_queries(1)
    q_many = make_queries(4)

    mode = sys.argv[1] if len(sys.argv) > 1 else "all"

    if mode in ("all", "baseline"):
        f32_fn = jax.jit(
            lambda q, c: certified_topk(
                q, c, TOP_K, batch_tile=256, corpus_tile=2048, slots=2
            )
        )
        bench_one("f32_certified_bt256_same_input", f32_fn, q_one, corpus_dev)
        bench_one("f32_certified_bt256_varied", f32_fn, q_many, corpus_dev)

    if mode in ("all", "packed"):
        for bt, ct in [(256, 2048), (512, 2048)]:
            pk_fn = jax.jit(
                lambda q, c, bt=bt, ct=ct: packed_certified_topk(
                    q, c, TOP_K, score_bound=1.0,
                    batch_tile=bt, corpus_tile=ct,
                )
            )
            try:
                bench_one(
                    f"packed_certified_bt{bt}_ct{ct}_varied",
                    pk_fn, q_many, corpus_dev,
                )
            except Exception as exc:  # noqa: BLE001
                print(f"packed bt={bt} ct={ct} FAILED: "
                      f"{str(exc).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
