"""Sweep certified_topk configs on TPU with pipelined-dispatch timing.

Timing dispatches ITERS calls back-to-back and blocks once — the axon
tunnel adds ~25ms RTT per blocking dispatch, so per-call blocking measures
the relay, not the device. Pipelined timing matches bench.py and the
real serving pattern (continuous query stream).

Soundness is tie-aware: with bf16 scores over 1M items, rows routinely
have tied scores at the k-th position, so multiple exact top-k SETS
exist; a certified row counts as bad only if its sorted score vector
differs from the dense reference's.
"""

from __future__ import annotations

import json
import time

import numpy as np

CORPUS_SIZE = 1_048_576
DIM = 64
BATCH = 2048
TOP_K = 100
WARMUP = 3
ITERS = 20

CONFIGS = [
    # (batch_tile, corpus_tile, slots, method)
    (256, 2048, 2, "discard"),
    (256, 2048, 2, "count"),
    (512, 1024, 2, "discard"),
    (256, 1024, 2, "discard"),
    (256, 2048, 2, "scan"),  # no certificate: the speed floor
    (512, 2048, 1, "scan"),
]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.index.mips import exact_topk
    from xfmr_rec_tpu.ops.topk_pallas import certified_topk, scan_topk

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = rng.normal(size=(BATCH, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

    corpus_dev = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))
    queries_dev = jax.device_put(jnp.asarray(queries, dtype=jnp.bfloat16))

    exact_fn = jax.jit(
        lambda q: exact_topk(q, corpus_dev, TOP_K, chunk_size=131072)
    )
    exact_vals, exact_pos = jax.block_until_ready(exact_fn(queries_dev))
    exact_vals = np.asarray(exact_vals)
    exact_pos = np.asarray(exact_pos)  # one transfer, not one per row
    exact_sets = [set(exact_pos[i].tolist()) for i in range(BATCH)]
    print("exact reference done", flush=True)

    for bt, ct, slots, method in CONFIGS:
        if method == "scan":
            fn = jax.jit(
                lambda q, bt=bt, ct=ct, slots=slots: scan_topk(
                    q, corpus_dev, TOP_K, batch_tile=bt, corpus_tile=ct,
                    slots=slots,
                )
            )
        else:
            fn = jax.jit(
                lambda q, bt=bt, ct=ct, slots=slots, m=method: certified_topk(
                    q, corpus_dev, TOP_K, batch_tile=bt, corpus_tile=ct,
                    slots=slots, method=m,
                )
            )
        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(queries_dev))
            compile_s = time.perf_counter() - t0
            for _ in range(WARMUP):
                out = fn(queries_dev)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(queries_dev)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / ITERS
        except Exception as e:  # noqa: BLE001
            print(
                json.dumps(
                    {"bt": bt, "ct": ct, "slots": slots, "method": method,
                     "error": str(e)[:160]}
                ),
                flush=True,
            )
            continue

        row = {
            "bt": bt, "ct": ct, "slots": slots, "method": method,
            "ms": round(dt * 1e3, 2), "qps": round(BATCH / dt),
            "compile_s": round(compile_s, 1),
        }
        pos_np = np.asarray(out[1])
        vals_np = np.asarray(out[0])
        recalls = np.array(
            [
                len(set(pos_np[i].tolist()) & exact_sets[i]) / TOP_K
                for i in range(BATCH)
            ]
        )
        row["recall"] = round(float(recalls.mean()), 5)
        if method != "scan":
            exact_mask = np.asarray(out[2])
            row["certified"] = round(float(exact_mask.mean()), 4)
            # tie-aware soundness: certified rows must match the exact
            # score vector bit-for-bit
            bad = 0
            for i in np.nonzero(exact_mask)[0]:
                if not np.array_equal(vals_np[i], exact_vals[i]):
                    bad += 1
            row["bad_certified"] = bad
            uncert = recalls[~exact_mask]
            row["uncert_recall"] = (
                round(float(uncert.mean()), 5) if len(uncert) else 1.0
            )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
