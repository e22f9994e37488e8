"""Guaranteed pipeline vs batch size at the bench corpus (1M x 64 bf16).

Informs serving batch sizing: how the single-dispatch guaranteed search
amortizes with B. Default retry schedule, retries=3, k=100.
Run on the real chip: python runs/probe_guaranteed_batch.py
"""

from __future__ import annotations

import time

import numpy as np

N, D, K, ITERS = 1_048_576, 64, 100, 15


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import packed_guaranteed_topk

    rng = np.random.default_rng(0)
    c = rng.normal(size=(N, D)).astype(np.float32)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    c = np.concatenate([c, np.full((N, 1), 1.5, np.float32)], axis=1)
    cd = jax.device_put(jnp.asarray(c, jnp.bfloat16))

    for B in (512, 1024, 2048, 4096, 8192):
        qs = []
        for _ in range(4):
            q = rng.normal(size=(B, D)).astype(np.float32)
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            qs.append(jax.device_put(jnp.asarray(q, jnp.bfloat16)))
        fn = jax.jit(
            lambda q, c: packed_guaranteed_topk(
                q, c, K, score_bound=1.0, merge_levels=1, merge_keep=3,
                bias_in_dot=True, retries=3,
            )
        )
        out = None
        for i in range(3):
            out = fn(qs[i % 4], cd)
        float(jnp.sum(out[0].astype(jnp.float32)[..., :1]))
        cert = float(
            np.mean(
                [
                    float(jnp.mean(fn(q, cd)[2].astype(jnp.float32)))
                    for q in qs
                ]
            )
        )
        t0 = time.perf_counter()
        for i in range(ITERS):
            out = fn(qs[i % 4], cd)
        float(jnp.sum(out[0].astype(jnp.float32)[..., :1]))
        dt = (time.perf_counter() - t0) / ITERS
        print(
            f"B={B:5d}: {dt * 1e3:6.2f} ms ({B / dt:9,.0f} qps) "
            f"certified={cert:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
