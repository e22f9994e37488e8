"""Kernel experiment 4: fast exact top-100 over (2048, 4096) options."""

from __future__ import annotations

import functools
import time

import numpy as np

BATCH = 2048
WIDTH = 4096
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
    print(f"{name}: {dt * 1e3:.2f} ms", flush=True)
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # realistic packed keys: positive floats' bit patterns
    raw = (1.25 + 0.5 * rng.random(size=(4, BATCH, WIDTH))).astype(
        np.float32
    )
    keys_f = [jax.device_put(jnp.asarray(x)) for x in raw]
    keys_i = [
        jax.device_put(jax.lax.bitcast_convert_type(x, jnp.int32))
        for x in keys_f
    ]
    fargs = [(x,) for x in keys_f]
    iargs = [(x,) for x in keys_i]

    topk = jax.jit(lambda x: jax.lax.top_k(x, TOP_K))
    bench_one("lax.top_k f32 4096->100", topk, fargs)
    bench_one("lax.top_k i32 4096->100", topk, iargs)

    sortk = jax.jit(
        lambda x: jax.lax.sort(x, dimension=-1)[..., -TOP_K:][..., ::-1]
    )
    bench_one("lax.sort+slice f32", sortk, fargs)

    for recall in (0.95, 0.99):
        ap = jax.jit(
            functools.partial(
                jax.lax.approx_max_k, k=TOP_K, recall_target=recall
            )
        )
        bench_one(f"approx_max_k r{recall}", ap, fargs)

    # two-stage: approx prefilter to 256 + exactness count + exact top-k
    @jax.jit
    def two_stage(x):
        vals, idx = jax.lax.approx_max_k(x, 256, recall_target=0.95)
        t = vals[:, -1:]
        count = jnp.sum((x >= t).astype(jnp.int32), axis=-1, keepdims=True)
        ok = count[:, 0] <= 256  # prefilter provably complete per row
        tv, tl = jax.lax.top_k(vals, TOP_K)
        return tv, jnp.take_along_axis(idx, tl, axis=-1), ok

    out = bench_one("approx256+count+topk(256->100)", two_stage, fargs)
    ok = np.asarray(out[2])
    print(f"  two-stage rows provably complete: {ok.mean():.4f}")

    # correctness spot check of two_stage on complete rows
    want_v, want_i = jax.jit(lambda x: jax.lax.top_k(x, TOP_K))(keys_f[0])
    got_v, got_i, ok = two_stage(keys_f[0])
    rows = np.flatnonzero(np.asarray(ok))[:64]
    for b in rows:
        np.testing.assert_array_equal(
            np.asarray(got_v[b]), np.asarray(want_v[b])
        )
    print(f"  two-stage matches top_k on {len(rows)} checked rows")

    # smaller-width scaling
    for width in (2048, 1024):
        small = [(x[:, :width],) for x in keys_f]
        bench_one(f"lax.top_k f32 {width}->100", topk, small)


if __name__ == "__main__":
    main()
