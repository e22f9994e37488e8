"""Headline benchmark: GUARANTEED-exact top-100 retrieval QPS over 1M items.

North-star (BASELINE.json): exhaustive top-100 over the full item corpus
at >100k queries/sec on one TPU v5e chip. The reference publishes no
numbers (its retrieval is LanceDB IVF-HNSW-PQ *approximate* search on
CPU with no exactness guarantees at all); vs_baseline is reported
against the 100k QPS north-star target.

What runs (round 3): `packed_guaranteed_topk` — the guaranteed-exact
search as ONE jit pipeline. Pass 1 is the packed-key Pallas scan with
the KEEP-3 lane-pair merge (scores quantized into monotonic int32 keys,
slot contest = max/min/max/min, pairs keep their top-3 keys so the
selection width is 1.5ct while only 4-deep pair collisions can evade
certification). Rows whose discard-max certificate fails are gathered
in-graph and re-swept with shuffled lane mappings (up to 3 conditional
rounds, each skipped on device once everything certifies); candidate
pools merge in key space with position dedupe. Retry rounds use the
default per-round width schedule (batch/16 then batch/64, sized to the
measured failure rates — runs/sweep_retry_width.py). Certification is
at the key quantum (~5e-4 of a unit score here, an order of magnitude
below the bf16 scoring noise).

Measured residual: across the benched batches the pipeline certifies
every row (certified_frac prints below); any residual row would fall
back to the dense path (RetrievalIndex.search_certified(method="fused")),
at a measured expected rate of ~(1 - 0.96)^4 per row.

The candidate-pool selection rides the Pallas threshold-select
(`selector="auto"` in packed_certified_parts): exact-kth bit search +
butterfly compaction instead of lax.top_k over the (B, 1.5ct) pool —
pass-1 measured 17.7 -> 15.9 ms/batch (runs/bench_fused_select.py).

Reference points measured on the same chip/shapes (see BENCH_NOTES.md):
  XLA dense (B,N) matmul + lax.top_k : ~3k qps (exact)
  XLA approx_max_k(recall=0.95)      : ~52k qps (no guarantee)
  f32 certified scan (round 1)       : ~145k qps @ 96% certified
  packed keep-2 merge (round 2)      : ~292k qps @ 87% certified
  packed keep-3 merge, pass 1 only   : ~258k qps @ 96.4% certified
  this config (guaranteed pipeline)  : printed below @ ~100% certified

Timing harness notes: inputs vary per call (4 query batches cycled) and
the run drains through a device-side reduction + scalar transfer —
through the axon relay, repeated identical calls can be served from a
cache and bulk result transfers measure the relay (~10 MB/s), not the
device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np

CORPUS_SIZE = 1_048_576  # 1M items
DIM = 64
BATCH = 4096
TOP_K = 100
BATCH_TILE = 512
CORPUS_TILE = 2048
RETRY_WIDTH = None  # default per-round schedule: batch/16, batch/64, ...
RETRIES = 3
WARMUP = 3
ITERS = 20


def _device_gate(timeout_s: float = 300.0) -> None:
    """Fail FAST (stderr + exit 1) if the axon relay is unreachable.

    The relay's observed failure mode (BENCH_NOTES round 5) hangs every
    device call forever; without this gate the driver's bench run would
    hang instead of recording a failure. No fallback numbers are
    printed — a dead relay is a failed bench, not a zero."""
    import sys
    import threading

    done = threading.Event()

    def probe() -> None:
        # a REAL dispatch drained to host: device enumeration succeeds
        # even when the relay's op path is wedged (measured during the
        # round-5 outage), so only a completed computation proves health
        import jax
        import jax.numpy as jnp

        x = jnp.ones((8, 8))
        float(jnp.sum(x @ x))
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(
            f"bench.py: device init did not complete in {timeout_s:.0f}s "
            "— axon relay unreachable; aborting without a measurement",
            file=sys.stderr,
            flush=True,
        )
        import os

        os._exit(1)


def main() -> None:
    _device_gate()
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import packed_guaranteed_topk

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    # trailing 1.5 column: the packed-key window bias rides the matmul
    # (bias_in_dot) — free on the MXU, saves a VPU add per score element
    corpus = np.concatenate(
        [corpus, np.full((CORPUS_SIZE, 1), 1.5, np.float32)], axis=1
    )
    corpus_dev = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))
    query_batches = []
    for _ in range(4):
        queries = rng.normal(size=(BATCH, DIM)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
        query_batches.append(
            jax.device_put(jnp.asarray(queries, dtype=jnp.bfloat16))
        )

    # corpus as a jit ARGUMENT — a closure capture would bake the 128 MB
    # corpus into the compiled program as a constant
    @jax.jit
    def search(q, c):
        return packed_guaranteed_topk(
            q,
            c,
            TOP_K,
            score_bound=1.0,
            batch_tile=BATCH_TILE,
            corpus_tile=CORPUS_TILE,
            merge_levels=1,
            merge_keep=3,
            bias_in_dot=True,
            retry_width=RETRY_WIDTH,
            retries=RETRIES,
            recompute_scores=False,
        )

    def drain(result):
        # device-side reduction + scalar transfer forces real completion
        return float(jnp.sum(result[0].astype(jnp.float32)[..., :1]))

    out = None
    for i in range(WARMUP):
        out = search(query_batches[i % 4], corpus_dev)
    drain(out)
    certified = [
        float(jnp.mean(search(q, corpus_dev)[2].astype(jnp.float32)))
        for q in query_batches
    ]
    certified_frac = float(np.mean(certified))

    start = time.perf_counter()
    for i in range(ITERS):
        out = search(query_batches[i % 4], corpus_dev)
    drain(out)
    elapsed = time.perf_counter() - start

    qps = BATCH * ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": (
                    f"GUARANTEED-exact top-{TOP_K} MIPS over {CORPUS_SIZE} "
                    f"items (dim {DIM}, bf16, Pallas packed keep-3 scan + "
                    f"in-graph certified retries; "
                    f"certified_frac={certified_frac:.4f}, exact at the "
                    f"key quantum ~5e-4; pass-1-only runs 258k qps at "
                    f"96.4% certified), 1 chip"
                ),
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / 100_000, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
