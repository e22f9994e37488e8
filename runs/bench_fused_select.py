"""Pass-1 selector A/B at the bench geometry (1M x 64 bf16, B=4096,
k=100, bt=512, ct=2048, keep-3 merge, bias_in_dot).

Round-3 history: lax.top_k over the merged (4096, 3072) pool costs
7.4 ms of the 17.45 ms pass-1; the standalone Pallas threshold-select
(selector="threshold") gets that to ~5.5 ms but pays a second dispatch
plus the pool's HBM round trip (~2 ms of fixed cost per the phase
probe); selector="fused" runs scan + merge + select as one kernel.
Prints pass-1 ms/QPS per selector plus the certified fraction (must
match across selectors up to quantum-tie effects).
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
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_SIZE, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    corpus = np.concatenate(
        [corpus, np.full((CORPUS_SIZE, 1), 1.5, np.float32)], axis=1
    )
    corpus_dev = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))
    qs = []
    for _ in range(4):
        q = rng.normal(size=(BATCH, DIM)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        qs.append(jax.device_put(jnp.asarray(q, dtype=jnp.bfloat16)))

    results = {}
    for selector in ("topk", "threshold", "fused"):
        @jax.jit
        def pass1(q, c, s=selector):
            return packed_certified_topk(
                q, c, TOP_K,
                score_bound=1.0, batch_tile=BT, corpus_tile=CT,
                merge_levels=1, merge_keep=3, bias_in_dot=True,
                recompute_scores=False, selector=s,
            )

        out = None
        for i in range(3):
            out = pass1(qs[i % 4], corpus_dev)
        float(jnp.sum(out[0][:, :1]))
        cert = float(np.mean([
            float(jnp.mean(pass1(q, corpus_dev)[2].astype(jnp.float32)))
            for q in qs
        ]))
        start = time.perf_counter()
        for i in range(ITERS):
            out = pass1(qs[i % 4], corpus_dev)
        float(jnp.sum(out[0][:, :1]))
        ms = (time.perf_counter() - start) / ITERS * 1e3
        results[selector] = out
        print(json.dumps({
            "selector": selector,
            "ms_per_batch": round(ms, 2),
            "qps": round(BATCH / ms * 1e3, 0),
            "certified_frac": round(cert, 4),
        }), flush=True)

    # cross-selector agreement on one batch: identical decoded score
    # multisets (quantum ties may swap positions)
    s_ref = np.asarray(results["topk"][0])
    for name in ("threshold", "fused"):
        s = np.asarray(results[name][0])
        assert np.array_equal(np.sort(s_ref, axis=1), np.sort(s, axis=1)), name
    print(json.dumps({"check": "score multisets agree"}), flush=True)


if __name__ == "__main__":
    main()
