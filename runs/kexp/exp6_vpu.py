"""Kernel experiment 6: shave VPU ops off the packed scan.

The packed scan is VPU-bound (~2.1G score elements x ~10 VPU ops each
~= 8 ms at ~60% of v5e VPU throughput). Variants:
  A. baseline packed_lane_scan (current production path)
  B. bias-in-dot: fold the +1.5 key bias into the matmul by augmenting
     queries with a constant 1.0 column and the corpus with a 1.5
     column — the contraction dim is MXU-padded to 128 anyway, so the
     65th column is free on the MXU and saves one VPU add per element.
  C. B + elementwise dmax buffer: keep a (bt, ct) running discard-max
     in VMEM (elementwise max) instead of reducing each tile's
     discards to (bt, 1); reduce once after the sweep.
"""

from __future__ import annotations

import functools
import time

import numpy as np

CORPUS_SIZE = 1_048_576
DIM = 64
BATCH = 2048
TOP_K = 100
BT, CT = 512, 2048
WARMUP, ITERS = 3, 20


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from xfmr_rec_tpu.ops.topk_pallas import packed_lane_scan

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    qs = []
    for _ in range(4):
        q = rng.normal(size=(BATCH, DIM)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        qs.append(q)

    num_tiles = CORPUS_SIZE // CT
    idx_bits = max((num_tiles - 1).bit_length(), 1)
    scale = 0.25 / 1.0  # score_bound = 1.0

    corpus_dev = jax.device_put(jnp.asarray(corpus, jnp.bfloat16))
    qs_dev = [jax.device_put(jnp.asarray(q, jnp.bfloat16)) for q in qs]
    # augmented operands for B/C: query gets the pre-scale AND a 1.0
    # column; corpus gets a 1.5 column
    corpus_aug = np.concatenate(
        [corpus, np.full((CORPUS_SIZE, 1), 1.5, np.float32)], axis=1
    )
    corpus_aug_dev = jax.device_put(jnp.asarray(corpus_aug, jnp.bfloat16))
    qs_aug_dev = [
        jax.device_put(
            jnp.asarray(
                np.concatenate(
                    [q * scale, np.ones((BATCH, 1), np.float32)], axis=1
                ),
                jnp.bfloat16,
            )
        )
        for q in qs
    ]

    def kernel_bc(q_ref, c_ref, key1_ref, key2_ref, dmax_ref, *, variant):
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _init():
            key1_ref[:] = jnp.zeros_like(key1_ref)
            key2_ref[:] = jnp.zeros_like(key2_ref)
            dmax_ref[:] = jnp.zeros_like(dmax_ref)

        keyf = jax.lax.dot_general(
            q_ref[:],
            c_ref[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        keyi = jax.lax.bitcast_convert_type(keyf, jnp.int32)
        keys = (keyi & ~((1 << idx_bits) - 1)) | step
        best1, best2 = key1_ref[:], key2_ref[:]
        new1 = jnp.maximum(best1, keys)
        contender = jnp.minimum(best1, keys)
        new2 = jnp.maximum(best2, contender)
        discarded = jnp.minimum(best2, contender)
        if variant == "C":
            dmax_ref[:] = jnp.maximum(dmax_ref[:], discarded)
        else:
            dmax_ref[:] = jnp.maximum(
                dmax_ref[:], jnp.max(discarded, axis=-1, keepdims=True)
            )
        key1_ref[:] = new1
        key2_ref[:] = new2

    def make_scan(variant):
        dmax_cols = CT if variant == "C" else 1
        kern = functools.partial(kernel_bc, variant=variant)
        out_block = pl.BlockSpec(
            (BT, CT), lambda b, i: (b, 0), memory_space=pltpu.VMEM
        )
        dmax_block = pl.BlockSpec(
            (BT, dmax_cols), lambda b, i: (b, 0), memory_space=pltpu.VMEM
        )

        def scan(q_aug, c_aug):
            key_shape = jax.ShapeDtypeStruct((BATCH, CT), jnp.int32)
            key1, key2, dmax = pl.pallas_call(
                kern,
                grid=(BATCH // BT, num_tiles),
                in_specs=[
                    pl.BlockSpec(
                        (BT, DIM + 1),
                        lambda b, i: (b, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (CT, DIM + 1),
                        lambda b, i: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=[out_block, out_block, dmax_block],
                out_shape=[
                    key_shape,
                    key_shape,
                    jax.ShapeDtypeStruct((BATCH, dmax_cols), jnp.int32),
                ],
                cost_estimate=pl.CostEstimate(
                    flops=2 * BATCH * CORPUS_SIZE * (DIM + 1),
                    bytes_accessed=c_aug.size * c_aug.dtype.itemsize,
                    transcendentals=0,
                ),
            )(q_aug, c_aug)
            keys = jnp.concatenate([key1, key2], axis=-1)
            dmax_row = (
                jnp.max(dmax, axis=-1) if variant == "C" else dmax[:, 0]
            )
            tk, tl = jax.lax.top_k(keys, TOP_K)
            return tk, tl, dmax_row

        return jax.jit(scan)

    def drain(out):
        import jax.numpy as jnp

        return float(jnp.sum(out[0].astype(jnp.float32)[..., :1]))

    def bench(name, fn, args_list):
        out = None
        for i in range(WARMUP):
            out = fn(*args_list[i % len(args_list)])
        drain(out)
        t = time.perf_counter()
        for i in range(ITERS):
            out = fn(*args_list[i % len(args_list)])
        drain(out)
        dt = (time.perf_counter() - t) / ITERS
        print(
            f"{name}: {dt * 1e3:.2f} ms  ({BATCH / dt:,.0f} qps)",
            flush=True,
        )
        return out

    # A: production path (scan + top_k, no score decode)
    @jax.jit
    def prod(q, c):
        keys, dmax = packed_lane_scan(
            q, c, score_bound=1.0, batch_tile=BT, corpus_tile=CT,
            idx_bits=idx_bits,
        )
        tk, tl = jax.lax.top_k(keys, TOP_K)
        return tk, tl, dmax

    out_a = bench("A baseline packed+topk", prod, [(q, corpus_dev) for q in qs_dev])

    fn_b = make_scan("B")
    out_b = bench(
        "B bias-in-dot", fn_b, [(q, corpus_aug_dev) for q in qs_aug_dev]
    )
    fn_c = make_scan("C")
    out_c = bench(
        "C bias-in-dot + dmax buffer",
        fn_c,
        [(q, corpus_aug_dev) for q in qs_aug_dev],
    )

    # correctness: B/C keys must match A's keys exactly on the last-used
    # query batch? The matmul order differs (65th column in the dot), so
    # compare decoded top-k POSITION sets modulo quantum ties: here just
    # report the fraction of matching top-k keys.
    ka = np.asarray(out_a[0])
    for name, out in (("B", out_b), ("C", out_c)):
        kb = np.asarray(out[0])
        frac = float((ka == kb).mean())
        print(f"{name} top-k keys == A: {frac:.4f}", flush=True)
        da, db = np.asarray(out_a[2]), np.asarray(out[2])
        print(f"{name} dmax == A: {float((da == db).mean()):.4f}", flush=True)


if __name__ == "__main__":
    main()
