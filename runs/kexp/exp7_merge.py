"""Kernel experiment 7: halve the selection width by lane-pair merging.

After the packed sweep the candidate buffer is (B, 2*ct) = (2048, 4096)
and `lax.top_k` over it costs ~4 ms — the biggest post-scan item. Merge
lane i with lane i+ct/2 (contiguous block slices, no relayout): keep the
top-2 of the pair's 4 keys, fold the max discarded key into the row's
discard-max. The certificate stays sound (anything missing from the
merged buffer is now recorded in dmax); the cert RATE drops because a
merged group holding >= 3 of the row's top-k forces a retry — measured
here. Variants:
  C : exp6 winner (bias-in-dot + dmax buffer), top_k over (B, 4096)
  D : C + one merge  -> top_k over (B, 2048)
  E : C + two merges -> top_k over (B, 1024)
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
    scale = 0.25

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

    def kernel(q_ref, c_ref, key1_ref, key2_ref, dmax_ref):
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _init():
            key1_ref[:] = jnp.zeros_like(key1_ref)
            key2_ref[:] = jnp.zeros_like(key2_ref)
            dmax_ref[:] = jnp.zeros_like(dmax_ref)

        keyf = jax.lax.dot_general(
            q_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        keyi = jax.lax.bitcast_convert_type(keyf, jnp.int32)
        keys = (keyi & ~((1 << idx_bits) - 1)) | step
        best1, best2 = key1_ref[:], key2_ref[:]
        new1 = jnp.maximum(best1, keys)
        contender = jnp.minimum(best1, keys)
        new2 = jnp.maximum(best2, contender)
        discarded = jnp.minimum(best2, contender)
        dmax_ref[:] = jnp.maximum(dmax_ref[:], discarded)
        key1_ref[:] = new1
        key2_ref[:] = new2

    out_block = pl.BlockSpec(
        (BT, CT), lambda b, i: (b, 0), memory_space=pltpu.VMEM
    )

    def scan(q_aug, c_aug):
        key_shape = jax.ShapeDtypeStruct((BATCH, CT), jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=(BATCH // BT, num_tiles),
            in_specs=[
                pl.BlockSpec(
                    (BT, DIM + 1), lambda b, i: (b, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (CT, DIM + 1), lambda b, i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[out_block, out_block, out_block],
            out_shape=[key_shape, key_shape, key_shape],
            cost_estimate=pl.CostEstimate(
                flops=2 * BATCH * CORPUS_SIZE * (DIM + 1),
                bytes_accessed=c_aug.size * c_aug.dtype.itemsize,
                transcendentals=0,
            ),
        )(q_aug, c_aug)

    def merge_once(k1, k2, l1, l2):
        """Per-slot (B, w) key buffers + lane maps -> halved buffers.

        Pairs lane column j with column j + w/2 (contiguous block
        slices); keeps the pair's top-2, returns the max discarded key.
        """
        w = k1.shape[1] // 2
        a1, b1 = k1[:, :w], k1[:, w:]
        a2, b2 = k2[:, :w], k2[:, w:]
        la1, lb1 = l1[:, :w], l1[:, w:]
        la2, lb2 = l2[:, :w], l2[:, w:]
        awins = a1 >= b1
        top1 = jnp.where(awins, a1, b1)
        lt1 = jnp.where(awins, la1, lb1)
        top2 = jnp.where(awins, jnp.maximum(a2, b1), jnp.maximum(b2, a1))
        lt2 = jnp.where(
            awins,
            jnp.where(a2 >= b1, la2, lb1),
            jnp.where(b2 >= a1, lb2, la1),
        )
        disc = jnp.maximum(
            jnp.where(awins, jnp.minimum(a2, b1), jnp.minimum(b2, a1)),
            jnp.where(awins, b2, a2),
        )
        return top1, top2, lt1, lt2, disc

    def make_full(n_merges):
        def full(q_aug, c_aug):
            key1, key2, dmax = scan(q_aug, c_aug)
            lane_iota = jnp.broadcast_to(
                jnp.arange(CT, dtype=jnp.int32)[None, :], key1.shape
            )
            dmax_row = jnp.max(dmax, axis=-1)
            k1, k2 = key1, key2
            l1 = l2 = lane_iota
            for _ in range(n_merges):
                k1, k2, l1, l2, disc = merge_once(k1, k2, l1, l2)
                dmax_row = jnp.maximum(dmax_row, jnp.max(disc, axis=-1))
            vals = jnp.concatenate([k1, k2], axis=1)
            all_lanes = jnp.concatenate([l1, l2], axis=1)
            tk, ti = jax.lax.top_k(vals, TOP_K)
            tl = jnp.take_along_axis(all_lanes, ti, axis=1)
            tau = tk[:, TOP_K - 1]
            exact = jnp.logical_and(dmax_row <= tau, tau > 0)
            tile = tk & ((1 << idx_bits) - 1)
            pos = tile * CT + tl
            return tk, pos, exact

        return jax.jit(full)

    def drain(out):
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
        cert = float(jnp.mean(out[2].astype(jnp.float32)))
        print(
            f"{name}: {dt * 1e3:.2f} ms  ({BATCH / dt:,.0f} qps)  "
            f"certified={cert:.4f}",
            flush=True,
        )
        return out

    args = [(q, corpus_aug_dev) for q in qs_aug_dev]
    outs = {}
    for n_merges, name in ((0, "C topk4096"), (1, "D merge2 topk2048"),
                           (2, "E merge4 topk1024")):
        outs[name] = bench(name, make_full(n_merges), args)

    # correctness: certified rows of each variant match dense top-k
    # (within the key quantum) on the LAST query batch (bench loop ends
    # at i = ITERS-1)
    q_last = qs[(ITERS - 1) % 4]
    dense = q_last[:64].astype(np.float32) @ corpus.T
    quantum = 2.0 ** (idx_bits - 21) * 1.0
    for name, out in outs.items():
        pos = np.asarray(out[1][:64])
        ex = np.asarray(out[2][:64])
        bad = 0
        for b in np.flatnonzero(ex):
            want = np.sort(dense[b])[-TOP_K:][::-1]
            got = np.sort(dense[b][pos[b]])[::-1]
            if not np.allclose(got, want, atol=quantum + 5e-3):
                bad += 1
        print(f"{name}: certified-row mismatches {bad}/{int(ex.sum())}",
              flush=True)


if __name__ == "__main__":
    main()
