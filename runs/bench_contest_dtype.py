"""Contest-dtype microbenchmark: int32 packed keys vs bf16 scores (+i16 idx).

The guaranteed pipeline's cost at 4M items is the per-element VPU
contest (~8 int32 ops/elem, 78% of VPU roofline — BENCH_NOTES round 3).
The one 2x lever left is 16-bit lanes: bf16 score max/min and int16
index selects pack 2-per-register on the VPU. This microbench measures
a minimal bf16-contest kernel (same grid/blocking as packed_lane_scan,
same top-2-per-lane + discard-max semantics, indices tracked in int16
via selects) against the production int32 packed scan, on the bench
geometry. If the bf16 contest sustains >= 1.5x, the full
bf16-key guaranteed path is worth building (VERDICT r3 #2).

Run: python runs/bench_contest_dtype.py  (TPU; ~3 min)
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CORPUS_SIZE = 1_048_576
DIM = 64
BATCH = 4096
BT = 512
CT = 2048
ITERS = 10


def _bf16_contest_kernel(
    q_ref, c_ref, b1_ref, b2_ref, i1_ref, i2_ref, dmax_ref
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        b1_ref[:] = jnp.full_like(b1_ref, -jnp.inf)
        b2_ref[:] = jnp.full_like(b2_ref, -jnp.inf)
        i1_ref[:] = jnp.zeros_like(i1_ref)
        i2_ref[:] = jnp.zeros_like(i2_ref)
        dmax_ref[:] = jnp.full_like(dmax_ref, -jnp.inf)

    scores = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,  # MXU acc must be 32-bit
    ).astype(jnp.bfloat16)
    b1, b2 = b1_ref[:], b2_ref[:]
    idx = jnp.full(scores.shape, step, jnp.int16)
    new_won = scores > b1  # mask
    new1 = jnp.maximum(b1, scores)
    cont = jnp.minimum(b1, scores)
    i_cont = jnp.where(new_won, i1_ref[:], idx)
    i1_ref[:] = jnp.where(new_won, idx, i1_ref[:])
    cont_won = cont > b2
    new2 = jnp.maximum(b2, cont)
    disc = jnp.minimum(b2, cont)
    i2_ref[:] = jnp.where(cont_won, i_cont, i2_ref[:])
    dmax_ref[:] = jnp.maximum(dmax_ref[:], disc)
    b1_ref[:] = new1
    b2_ref[:] = new2


def bf16_contest(queries, corpus):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = queries.shape[0]
    num_tiles = CORPUS_SIZE // CT
    grid = (batch // BT, num_tiles)
    bspec = lambda fn: pl.BlockSpec(  # noqa: E731
        (BT, None), fn, memory_space=pltpu.VMEM
    )
    out_shapes = [
        jax.ShapeDtypeStruct((batch, CT), jnp.bfloat16),
        jax.ShapeDtypeStruct((batch, CT), jnp.bfloat16),
        jax.ShapeDtypeStruct((batch, CT), jnp.int16),
        jax.ShapeDtypeStruct((batch, CT), jnp.int16),
        jax.ShapeDtypeStruct((batch, CT), jnp.bfloat16),
    ]
    out_specs = [
        pl.BlockSpec((BT, CT), lambda b, i: (b, 0), memory_space=pltpu.VMEM)
        for _ in out_shapes
    ]
    in_specs = [
        pl.BlockSpec((BT, DIM), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((CT, DIM), lambda b, i: (i, 0), memory_space=pltpu.VMEM),
    ]
    vmem = (
        (2 + 2 + 2 + 2 + 2 + 4) * BT * CT  # bufs (bf16 x3 + i16 x2) + scores
        + 2 * CT * DIM * 2
        + BT * DIM * 2
        + 2 * 1024 * 1024
    )
    return pl.pallas_call(
        _bf16_contest_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * CORPUS_SIZE * DIM,
            bytes_accessed=CORPUS_SIZE * DIM * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(vmem, 16 * 1024 * 1024)
        ),
    )(queries, corpus)


def timed(fn, batches, *, iters=ITERS, warmup=3):
    import jax.numpy as jnp

    out = None
    for i in range(warmup):
        out = fn(batches[i % len(batches)])
    float(jnp.sum(jnp.asarray(out[0], jnp.float32)[:, :1]))
    start = time.perf_counter()
    for i in range(iters):
        out = fn(batches[i % len(batches)])
    float(jnp.sum(jnp.asarray(out[0], jnp.float32)[:, :1]))
    return (time.perf_counter() - start) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops import topk_pallas as tp

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    corpus_bias = np.concatenate(
        [corpus, np.full((CORPUS_SIZE, 1), 1.5, np.float32)], axis=1
    )
    corpus_dev = jax.device_put(jnp.asarray(corpus, jnp.bfloat16))
    corpus_bias_dev = jax.device_put(jnp.asarray(corpus_bias, jnp.bfloat16))
    batches, batches_b = [], []
    for _ in range(4):
        q = rng.normal(size=(BATCH, DIM)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        batches.append(jax.device_put(jnp.asarray(q, jnp.bfloat16)))

    int32_scan = jax.jit(
        lambda q: tp.packed_lane_scan(
            q, corpus_bias_dev, score_bound=1.0, batch_tile=BT,
            corpus_tile=CT, reserve_bits=1, bias_in_dot=True,
        )
    )
    ms = timed(int32_scan, batches)
    print(f"int32 packed contest : {ms * 1e3:7.2f} ms "
          f"({BATCH / ms:,.0f} QPS-equivalent)")

    bf16_scan = jax.jit(lambda q: bf16_contest(q, corpus_dev))
    ms_b = timed(bf16_scan, batches)
    print(f"bf16+i16 contest     : {ms_b * 1e3:7.2f} ms "
          f"({BATCH / ms_b:,.0f}) -> {ms / ms_b:.2f}x")

    # sanity: top-1 per row agrees with dense argmax on a small slice
    b1, b2, i1, i2, dmax = bf16_scan(batches[0])
    best_scores = np.asarray(jnp.max(b1, axis=1), np.float32)
    dense = np.asarray(
        jnp.max(
            jnp.asarray(batches[0][:64], jnp.float32)
            @ jnp.asarray(corpus_dev, jnp.float32).T,
            axis=1,
        )
    )
    err = np.abs(best_scores[:64] - dense)
    print(f"top-1 agreement (64 rows): max |err| = {err.max():.4f} "
          "(bf16 rounding expected)")


if __name__ == "__main__":
    main()

# MEASURED OUTCOME (round 4, real chip via axon):
#   int32 packed contest : 12.12 ms at 1M x 64, B=4096 (production path)
#   bf16+i16 contest     : DOES NOT COMPILE on this target —
#     "Mosaic failed to compile TPU kernel: Target does not support this
#      comparison" at the bf16 `scores > b1`.
# runs/probe_ops16.py isolates the op support matrix: bf16 max/min OK,
# bf16 compare/select FAIL, int16 max/compare/select FAIL (int32 all
# OK). Without 16-bit compares or selects there is no packed-lane
# contest with index provenance, so the VERDICT-suggested "bf16 keys
# halving contest ops" lever is structurally unavailable on this
# Mosaic target. The 4M optimization budget therefore goes to geometry
# tuning + retry scheduling (runs/profile_guaranteed_4m.py).
