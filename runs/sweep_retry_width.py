"""Sweep per-round retry widths for packed_guaranteed_topk.

The guaranteed pipeline's cost above pass-1 is the retry sweeps; each
sweep is ~linear in its row width, while the rows that actually NEED a
retry are ~3.6% of the batch after pass 1 and ~0.13% after retry 1
(keep-3 merge, measured). This sweep measures throughput + certified
fraction for several width schedules at the bench geometry to pick the
default. Run on the real chip: python runs/sweep_retry_width.py
"""

from __future__ import annotations

import time

import numpy as np

CORPUS_SIZE = 1_048_576
DIM = 64
BATCH = 4096
TOP_K = 100
WARMUP = 3
ITERS = 20

SCHEDULES = [
    ("512x3 (round-3 baseline)", (512, 512, 512)),
    ("512,128,64", (512, 128, 64)),
    ("256,128,64", (256, 128, 64)),
    ("256,64,64", (256, 64, 64)),
    ("192,64", (192, 64)),
]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import packed_guaranteed_topk

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

    def drain(result):
        return float(jnp.sum(result[0].astype(jnp.float32)[..., :1]))

    for name, widths in SCHEDULES:

        @jax.jit
        def search(q, c, widths=widths):
            return packed_guaranteed_topk(
                q,
                c,
                TOP_K,
                score_bound=1.0,
                batch_tile=512,
                corpus_tile=2048,
                merge_levels=1,
                merge_keep=3,
                bias_in_dot=True,
                retry_width=widths,
                retries=len(widths),
                recompute_scores=False,
            )

        t0 = time.perf_counter()
        out = None
        for i in range(WARMUP):
            out = search(query_batches[i % 4], corpus_dev)
        drain(out)
        compile_s = time.perf_counter() - t0
        cert = float(
            np.mean(
                [
                    float(
                        jnp.mean(
                            search(q, corpus_dev)[2].astype(jnp.float32)
                        )
                    )
                    for q in query_batches
                ]
            )
        )
        start = time.perf_counter()
        for i in range(ITERS):
            out = search(query_batches[i % 4], corpus_dev)
        drain(out)
        elapsed = time.perf_counter() - start
        qps = BATCH * ITERS / elapsed
        print(
            f"{name:28s} qps={qps:9.0f} ms/batch={1e3 * elapsed / ITERS:6.2f}"
            f" certified={cert:.4f} (compile+warm {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
