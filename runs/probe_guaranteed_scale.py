"""Guaranteed-exact pipeline at scale: 4M bf16 and 2M int8 corpora.

Round 2 recorded certified-scan-only numbers at these shapes (82k QPS
at 4M, 136k at 2M int8, B=2048); this probe measures the FULL
guaranteed pipeline (pass 1 + in-graph retries, default width
schedule) so the scaling table carries guarantee-grade figures.

Run on the real chip: python runs/probe_guaranteed_scale.py
"""

from __future__ import annotations

import time

import numpy as np

B, K, ITERS = 2048, 100, 10


def bench(name, corpus_dev, qs, *, score_bound, scales=None, bias=False):
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import packed_guaranteed_topk

    fn = jax.jit(
        lambda q, c, s: packed_guaranteed_topk(
            q,
            c,
            K,
            score_bound=score_bound,
            merge_levels=1,
            merge_keep=3,
            bias_in_dot=bias,
            scales=s,
            retries=3,
        )
    )
    out = None
    for i in range(3):
        out = fn(qs[i % 4], corpus_dev, scales)
    float(jnp.sum(out[0].astype(jnp.float32)[..., :1]))
    cert = float(
        np.mean(
            [
                float(jnp.mean(fn(q, corpus_dev, scales)[2].astype(jnp.float32)))
                for q in qs
            ]
        )
    )
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(qs[i % 4], corpus_dev, scales)
    float(jnp.sum(out[0].astype(jnp.float32)[..., :1]))
    dt = (time.perf_counter() - t0) / ITERS
    print(
        f"{name}: {dt * 1e3:.2f} ms ({B / dt:,.0f} qps) certified={cert:.4f}",
        flush=True,
    )


def main() -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def queries(d):
        out = []
        for _ in range(4):
            q = rng.normal(size=(B, d)).astype(np.float32)
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            out.append(jax.device_put(jnp.asarray(q, jnp.bfloat16)))
        return out

    # 4M x 64 bf16 with the bias column (matches the bench corpus shape)
    n, d = 4_194_304, 64
    c = rng.normal(size=(n, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    c = np.concatenate([c, np.full((n, 1), 1.5, np.float32)], axis=1)
    cd = jax.device_put(jnp.asarray(c, jnp.bfloat16))
    bench("4M x 64 bf16", cd, queries(d), score_bound=1.0, bias=True)
    del c, cd

    # 2M x 64 int8 with per-item scales (the 2x-density serving mode)
    n = 2_097_152
    c = rng.normal(size=(n, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    absmax = np.abs(c).max(axis=1, keepdims=True)
    ci = np.clip(np.round(c / absmax * 127), -127, 127).astype(np.int8)
    scales = (absmax[:, 0] / 127.0).astype(np.float32)
    cd = jax.device_put(jnp.asarray(ci))
    sd = jax.device_put(jnp.asarray(scales))
    # unit-norm rows quantized per-item: |scale_i * dot| <= ~1 + quant err
    bench("2M x 64 int8", cd, queries(d), score_bound=1.05, scales=sd)
    del c, ci, cd, sd

    import sys

    if "--8m" in sys.argv:
        # the densest guaranteed corpus one v5e chip holds: 8M int8
        n = 8_388_608
        c = rng.normal(size=(n, d)).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        absmax = np.abs(c).max(axis=1, keepdims=True)
        ci = np.clip(np.round(c / absmax * 127), -127, 127).astype(np.int8)
        scales = (absmax[:, 0] / 127.0).astype(np.float32)
        cd = jax.device_put(jnp.asarray(ci))
        sd = jax.device_put(jnp.asarray(scales))
        bench("8M x 64 int8", cd, queries(d), score_bound=1.05, scales=sd)


if __name__ == "__main__":
    main()
