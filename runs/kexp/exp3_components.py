"""Kernel experiment 3: packed-path component timings on TPU."""

from __future__ import annotations

import time

import numpy as np

CORPUS_SIZE = 1_048_576
DIM = 64
BATCH = 2048
TOP_K = 100
WARMUP = 3
ITERS = 20


def _drain(out):
    """Force full pipeline completion via a host transfer (the axon
    relay's block_until_ready does not reliably wait)."""
    import jax.numpy as jnp

    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    return float(jnp.sum(leaves[0].astype(jnp.float32)[..., :1]))


import jax  # noqa: E402


def bench_one(name, fn, args_list):
    out = None
    for _ in range(WARMUP):
        out = fn(*args_list[0])
    _drain(out)
    start = time.perf_counter()
    for i in range(ITERS):
        out = fn(*args_list[i % len(args_list)])
    _drain(out)
    dt = (time.perf_counter() - start) / ITERS
    print(f"{name}: {dt * 1e3:.2f} ms  ({BATCH / dt:,.0f} qps)", flush=True)
    return dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import (
        exact_scores_at,
        lane_max_scan,
        packed_lane_scan,
        unpack_positions,
    )

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    corpus_dev = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))
    qs = []
    for _ in range(4):
        q = rng.normal(size=(BATCH, DIM)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        qs.append(jax.device_put(jnp.asarray(q, dtype=jnp.bfloat16)))
    qargs = [(q, corpus_dev) for q in qs]

    # 0. harness validation: known-14ms case
    from xfmr_rec_tpu.ops.topk_pallas import certified_topk

    known = jax.jit(
        lambda q, c: certified_topk(
            q, c, TOP_K, batch_tile=256, corpus_tile=2048, slots=2
        )
    )
    bench_one("HARNESS_CHECK_f32_certified_bt256(expect~14ms)", known, qargs)

    # 1. packed scan alone (bt 512 and 256)
    for bt in (512, 256):
        fn = jax.jit(
            lambda q, c, bt=bt: packed_lane_scan(
                q, c, score_bound=1.0, batch_tile=bt, corpus_tile=2048
            )
        )
        bench_one(f"packed_scan_only_bt{bt}", fn, qargs)

    # 2. f32 scan alone (bt 256, slots2+discard) for comparison
    f32_fn = jax.jit(
        lambda q, c: lane_max_scan(
            q, c, batch_tile=256, corpus_tile=2048, slots=2,
            track_discards=True,
        )
    )
    bench_one("f32_scan_only_bt256", f32_fn, qargs)

    # 3. epilogue pieces on realistic intermediates
    keys = jnp.asarray(
        rng.integers(2**30, 2**30 + 2**24, size=(BATCH, 4096)),
        dtype=jnp.int32,
    )
    dmax = jnp.asarray(
        rng.integers(2**30, 2**30 + 2**24, size=(BATCH,)), dtype=jnp.int32
    )

    @jax.jit
    def epilogue_topk_unpack(k_buf, d):
        tk, tl = jax.lax.top_k(k_buf, TOP_K)
        pos = unpack_positions(tk, tl, corpus_tile=2048, idx_bits=9)
        tau = tk[:, TOP_K - 1]
        return tk, pos, jnp.logical_and(d <= tau, tau > 0)

    bench_one(
        "epilogue_topk_unpack", epilogue_topk_unpack,
        [(keys, dmax)],
    )

    pos = jnp.asarray(
        rng.integers(0, CORPUS_SIZE, size=(BATCH, TOP_K)), dtype=jnp.int32
    )

    gather_fn = jax.jit(exact_scores_at)
    bench_one(
        "exact_scores_gather_dot", gather_fn,
        [(q, corpus_dev, pos) for q in qs],
    )


if __name__ == "__main__":
    main()
