"""Round-3 kernel sweep: keep-3 merge + fused guaranteed pipeline.

Measures, at the bench headline geometry (1M x 64 bf16, B=4096, k=100,
bt=512, ct=2048, bias_in_dot), the QPS and certification rate of:
  - pass-1 packed scan with merge keep-2 (the round-2 headline config)
  - pass-1 packed scan with merge keep-3 (new: discard only the pair min)
  - pass-1 packed scan unmerged
  - the fused device guaranteed pipeline (pass 1 + in-graph retries)

Run on the real TPU: `python runs/sweep_keep3.py`.
"""

from __future__ import annotations

import functools
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
BT, CT = 512, 2048
WARMUP, ITERS = 3, 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import (
        packed_certified_topk,
        packed_guaranteed_topk,
    )

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    corpus = np.concatenate(
        [corpus, np.full((CORPUS_SIZE, 1), 1.5, np.float32)], axis=1
    )
    corpus_dev = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))
    query_batches = []
    for _ in range(4):
        q = rng.normal(size=(BATCH, DIM)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        query_batches.append(jax.device_put(jnp.asarray(q, jnp.bfloat16)))

    common = dict(
        score_bound=1.0,
        batch_tile=BT,
        corpus_tile=CT,
        bias_in_dot=True,
        recompute_scores=False,
    )

    configs = {
        "pass1_keep2": jax.jit(
            functools.partial(
                packed_certified_topk, k=TOP_K, merge_levels=1,
                merge_keep=2, **common,
            )
        ),
        "pass1_keep3": jax.jit(
            functools.partial(
                packed_certified_topk, k=TOP_K, merge_levels=1,
                merge_keep=3, **common,
            )
        ),
        "pass1_nomerge": jax.jit(
            functools.partial(
                packed_certified_topk, k=TOP_K, merge_levels=0, **common,
            )
        ),
        "guaranteed_keep3_r2_w512": jax.jit(
            functools.partial(
                packed_guaranteed_topk, k=TOP_K, merge_levels=1,
                merge_keep=3, retry_width=512, retries=2, **common,
            )
        ),
        "guaranteed_keep2_r2_w1024": jax.jit(
            functools.partial(
                packed_guaranteed_topk, k=TOP_K, merge_levels=1,
                merge_keep=2, retry_width=1024, retries=2, **common,
            )
        ),
        "guaranteed_keep3_r1_w512": jax.jit(
            functools.partial(
                packed_guaranteed_topk, k=TOP_K, merge_levels=1,
                merge_keep=3, retry_width=512, retries=1, **common,
            )
        ),
    }

    def drain(result):
        return float(jnp.sum(result[0].astype(jnp.float32)[..., :1]))

    for name, fn in configs.items():
        out = None
        for i in range(WARMUP):
            out = fn(query_batches[i % 4], corpus_dev)
        drain(out)
        # certified fraction over all 4 query batches
        fracs = [
            float(jnp.mean(fn(q, corpus_dev)[2].astype(jnp.float32)))
            for q in query_batches
        ]
        start = time.perf_counter()
        for i in range(ITERS):
            out = fn(query_batches[i % 4], corpus_dev)
        drain(out)
        elapsed = time.perf_counter() - start
        print(
            json.dumps(
                {
                    "config": name,
                    "ms_per_batch": round(elapsed / ITERS * 1e3, 2),
                    "qps": round(BATCH * ITERS / elapsed, 0),
                    "certified_frac": round(float(np.mean(fracs)), 4),
                    "certified_min": round(float(np.min(fracs)), 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
