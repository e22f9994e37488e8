"""Corpus/dim scaling of the round-2 packed path (bias_in_dot + merge).

Re-measures the BENCH_NOTES corpus-scaling table with the final packed
configuration. Note the key quantum scales with the tile count:
quantum = bound * 2^(idx_bits + merge_levels - 21), so certificates at
8M items (idx_bits 12) are at ~2e-3 resolution vs ~5e-4 at 1M.
"""

from __future__ import annotations

import json
import time

import numpy as np

BATCH = 2048
TOP_K = 100
WARMUP, ITERS = 3, 10


def run_case(name, n, d, dtype, batch_tile=512):
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import (
        packed_certified_topk,
        pick_corpus_tile,
    )

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    qs = []
    for _ in range(4):
        q = rng.normal(size=(BATCH, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        qs.append(q)
    ct = pick_corpus_tile(n, d)

    if dtype == "int8":
        scale = np.abs(corpus).max(axis=1) / 127.0
        quant = np.clip(
            np.round(corpus / scale[:, None]), -127, 127
        ).astype(np.int8)
        corpus_dev = jax.device_put(jnp.asarray(quant))
        scales_dev = jax.device_put(jnp.asarray(scale.reshape(1, -1)))
        qs_dev = [
            jax.device_put(jnp.asarray(q, jnp.bfloat16)) for q in qs
        ]

        def search(q, c, s):
            return packed_certified_topk(
                q, c, TOP_K, score_bound=1.0, batch_tile=batch_tile,
                corpus_tile=ct, merge_levels=1, scales=s,
                recompute_scores=False,
            )

        fn = jax.jit(search)
        args = [(q, corpus_dev, scales_dev) for q in qs_dev]
    else:
        aug = np.concatenate(
            [corpus, np.full((n, 1), 1.5, np.float32)], axis=1
        )
        corpus_dev = jax.device_put(jnp.asarray(aug, jnp.bfloat16))
        qs_dev = [
            jax.device_put(jnp.asarray(q, jnp.bfloat16)) for q in qs
        ]

        def search(q, c):
            return packed_certified_topk(
                q, c, TOP_K, score_bound=1.0, batch_tile=batch_tile,
                corpus_tile=ct, merge_levels=1, bias_in_dot=True,
                recompute_scores=False,
            )

        fn = jax.jit(search)
        args = [(q, corpus_dev) for q in qs_dev]

    def drain(out):
        return float(jnp.sum(out[0].astype(jnp.float32)[..., :1]))

    out = None
    for i in range(WARMUP):
        out = fn(*args[i % 4])
    drain(out)
    cert = float(jnp.mean(out[2].astype(jnp.float32)))
    t = time.perf_counter()
    for i in range(ITERS):
        out = fn(*args[i % 4])
    drain(out)
    dt = (time.perf_counter() - t) / ITERS
    print(
        json.dumps(
            {
                "case": name, "items": n, "dim": d, "dtype": dtype,
                "corpus_tile": ct, "ms": round(dt * 1e3, 2),
                "qps": round(BATCH / dt), "certified": round(cert, 4),
            }
        ),
        flush=True,
    )


def main() -> None:
    run_case("1M bf16", 1_048_576, 64, "bfloat16")
    run_case("2M int8", 2_097_152, 64, "int8")
    run_case("4M bf16", 4_194_304, 64, "bfloat16")
    run_case("8M bf16", 8_388_608, 64, "bfloat16")
    run_case("1M dim384 bf16", 1_048_576, 384, "bfloat16", batch_tile=256)


if __name__ == "__main__":
    main()
