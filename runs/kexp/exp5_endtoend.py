"""Kernel experiment 5: composed packed path + selection strategies."""

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
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    return float(jnp.sum(leaves[0].astype(jnp.float32)[..., :1]))


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
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

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

    # the composed path: packed scan + i32 top_k + decoded scores
    full = jax.jit(
        lambda q, c: packed_certified_topk(
            q, c, TOP_K, score_bound=1.0,
            batch_tile=512, corpus_tile=2048, recompute_scores=False,
        )
    )
    out = bench_one("packed_full_decode_bt512", full, qargs)
    cert = float(jnp.mean(out[2].astype(jnp.float32)))
    print(f"  certified={cert:.4f}")

    # selection strategy probes on a standalone (B, 4096) i32 buffer
    raw = (1.25 + 0.5 * rng.random(size=(BATCH, 4096))).astype(np.float32)
    keys = jax.device_put(
        jax.lax.bitcast_convert_type(jnp.asarray(raw), jnp.int32)
    )
    kargs = [(keys,)]

    for width in (400, 256, 200):
        fn = jax.jit(
            lambda x, w=width: jax.lax.top_k(x[:, :w], TOP_K)
        )
        bench_one(f"top_k ({BATCH},{width})->100", fn, kargs)

    # 2-level reshape: (2048,4096)->(16384,512)->top64? must keep exact:
    # top-100 of a row needs up to 100 from ONE chunk -> per-chunk k=100
    @jax.jit
    def two_level(x):
        chunks = x.reshape(BATCH * 4, 1024)
        cv, ci = jax.lax.top_k(chunks, TOP_K)
        cv = cv.reshape(BATCH, 4 * TOP_K)
        ci = (
            ci.reshape(BATCH, 4, TOP_K)
            + (jnp.arange(4) * 1024)[None, :, None]
        ).reshape(BATCH, 4 * TOP_K)
        tv, tl = jax.lax.top_k(cv, TOP_K)
        return tv, jnp.take_along_axis(ci, tl, axis=-1)

    out2 = bench_one("two_level (8192,1024)+(2048,400)", two_level, kargs)
    want = jax.jit(lambda x: jax.lax.top_k(x, TOP_K))(keys)
    np.testing.assert_array_equal(np.asarray(out2[0]), np.asarray(want[0]))
    print("  two_level exact vs top_k: OK")

    # sort along ROWS instead (transpose trick): sort (4096, 2048) axis 0?
    @jax.jit
    def topk_t(x):
        return jax.lax.top_k(x.T.reshape(4096, BATCH).T, TOP_K)

    # skip correctness (layout experiment only)
    bench_one("top_k after transpose-copy", topk_t, kargs)


if __name__ == "__main__":
    main()
