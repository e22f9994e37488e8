"""Component-cost profile of packed_guaranteed_topk at the bench shape.

Breaks the 145k-QPS guaranteed pipeline (BENCH_NOTES round 3) into its
device phases to find where the 28.1 ms go:
  - pass-1 sweep only (packed_certified_parts, full 4096-row batch)
  - one retry-shaped sweep (512-row packed_certified_parts)
  - retry-round overhead (nonzero/gather/pool-merge/dedupe/scatter)
  - the full pipeline at retries = 0..3

All timings real-chip, pipelined over 4 query batches with a scalar
drain, ITERS iterations each.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CORPUS_SIZE = 1_048_576
DIM = 64
BATCH = 4096
TOP_K = 100
BT = 512
CT = 2048
RETRY_WIDTH = 512
ITERS = 20


def timed(fn, batches, *, iters=ITERS, warmup=3):
    import jax.numpy as jnp

    out = None
    for i in range(warmup):
        out = fn(batches[i % len(batches)])
    float(jnp.sum(jnp.asarray(out[0], jnp.float32)[..., :1]))
    start = time.perf_counter()
    for i in range(iters):
        out = fn(batches[i % len(batches)])
    float(jnp.sum(jnp.asarray(out[0], jnp.float32)[..., :1]))
    return (time.perf_counter() - start) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops import topk_pallas as tp

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    corpus = np.concatenate(
        [corpus, np.full((CORPUS_SIZE, 1), 1.5, np.float32)], axis=1
    )
    corpus_dev = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))
    batches = []
    for _ in range(4):
        q = rng.normal(size=(BATCH, DIM)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        batches.append(jax.device_put(jnp.asarray(q, dtype=jnp.bfloat16)))
    small = [b[:RETRY_WIDTH] for b in batches]

    def report(name, ms, note=""):
        print(
            json.dumps(
                {"phase": name, "ms": round(ms * 1e3, 2), "note": note}
            ),
            flush=True,
        )

    # raw sweep (no selection): packed_lane_scan only
    @jax.jit
    def scan_only(q, c):
        return tp.packed_lane_scan(
            q, c, score_bound=1.0, batch_tile=BT, corpus_tile=CT,
            reserve_bits=1, bias_in_dot=True,
        )

    report(
        "scan_4096", timed(lambda q: scan_only(q, corpus_dev), batches),
        "packed_lane_scan, full batch, no selection",
    )
    report(
        "scan_512", timed(lambda q: scan_only(q, corpus_dev), small),
        "packed_lane_scan at retry width",
    )

    # pass 1 with selection
    def parts(q, c, shuffle=0):
        return tp.packed_certified_parts(
            q, c, TOP_K, score_bound=1.0, batch_tile=BT, corpus_tile=CT,
            merge_levels=1, merge_keep=3, bias_in_dot=True,
            lane_shuffle=shuffle,
        )

    pass1 = jax.jit(lambda q, c: parts(q, c))
    report(
        "parts_4096", timed(lambda q: pass1(q, corpus_dev), batches),
        "pass 1 incl. keep-3 merge + top_k selection",
    )
    retry_sweep = jax.jit(lambda q, c: parts(q, c, 1))
    report(
        "parts_512", timed(lambda q: retry_sweep(q, corpus_dev), small),
        "one retry-shaped sweep incl. selection",
    )

    # full pipeline at each retry count
    for retries in (0, 1, 2, 3):
        @jax.jit
        def pipe(q, c, r=retries):
            return tp.packed_guaranteed_topk(
                q, c, TOP_K, score_bound=1.0, batch_tile=BT,
                corpus_tile=CT, merge_levels=1, merge_keep=3,
                bias_in_dot=True, retry_width=RETRY_WIDTH, retries=r,
                recompute_scores=False,
            )

        ms = timed(lambda q: pipe(q, corpus_dev), batches)
        cert = float(
            np.mean(
                [
                    float(jnp.mean(pipe(q, corpus_dev)[2].astype(jnp.float32)))
                    for q in batches
                ]
            )
        )
        report(
            f"guaranteed_r{retries}", ms,
            f"certified_frac={cert:.4f}  qps={BATCH / ms:,.0f}",
        )


if __name__ == "__main__":
    main()
