"""Exclusion path config sweep: merge policy x selector x merge levels.

The exclusion search returns no certificate, so these knobs only trade
raw recall (a merged-away key can hide a true top-(k+E) candidate)
against speed. This sweep measures QPS + recall-vs-dense at the bench
exclusion geometry; it picked the kernel's defaults (keep-2, lax.top_k
selection, merge_levels=1 — see packed_topk_excluding's docstring and
BENCH_NOTES for the recorded numbers: keep-3/threshold 158k, keep-3/
topk 167k, keep-2/topk 197k @ recall 0.99515, keep-2/topk/levels-2
236k @ 0.98902 rejected). Run: python runs/sweep_excl_keep.py
"""

from __future__ import annotations

import time

import numpy as np

N, D, B, K, E = 1_048_576, 64, 2048, 100, 32
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xfmr_rec_tpu.ops.topk_pallas import packed_topk_excluding

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(N, D)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    corpus_dev = jax.device_put(jnp.asarray(corpus, jnp.bfloat16))
    qs = []
    for _ in range(4):
        q = rng.normal(size=(B, D)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        qs.append(jax.device_put(jnp.asarray(q, jnp.bfloat16)))
    excl = jax.device_put(
        jnp.asarray(rng.integers(0, N, (B, E)), jnp.int32)
    )

    # dense exclusion reference on device: top-(K+E), drop excluded
    @jax.jit
    def dense_ref(q, c, ex):
        scores = jnp.einsum(
            "bd,nd->bn", q.astype(jnp.float32), c.astype(jnp.float32)
        )
        _, pos = jax.lax.top_k(scores, K + E)
        keep = ~jnp.any(pos[:, :, None] == ex[:, None, :], axis=-1)
        order = jnp.argsort(~keep, axis=-1, stable=True)
        return jnp.take_along_axis(pos, order[:, :K], axis=-1)

    ref_pos = np.asarray(jax.block_until_ready(dense_ref(qs[0], corpus_dev, excl)))

    def drain(o):
        return float(jnp.sum(jnp.asarray(o[0], jnp.float32)[..., :1]))

    for keep, sel, lv in (
        (3, "threshold", 1),
        (3, "topk", 1),
        (2, "topk", 1),
        (2, "topk", 2),
    ):
        fn = jax.jit(
            lambda q, ex, c, keep=keep, sel=sel, lv=lv: packed_topk_excluding(
                q,
                c,
                K,
                exclude_positions=ex,
                score_bound=1.0,
                merge_keep=keep,
                merge_levels=lv,
                selector=sel,
            )
        )
        out = None
        for i in range(3):
            out = fn(qs[i % 4], excl, corpus_dev)
        drain(out)
        res = fn(qs[0], excl, corpus_dev)
        pos0 = np.asarray(jax.block_until_ready(res[1]))
        recall = np.mean(
            [
                len(set(pos0[b]) & set(ref_pos[b])) / K
                for b in range(B)
            ]
        )
        viol = sum(
            bool(set(pos0[b].tolist()) & set(np.asarray(excl)[b].tolist()))
            for b in range(B)
        )
        t0 = time.perf_counter()
        for i in range(ITERS):
            out = fn(qs[i % 4], excl, corpus_dev)
        drain(out)
        dt = (time.perf_counter() - t0) / ITERS
        print(
            f"merge_keep={keep} selector={sel} levels={lv}: {dt * 1e3:.2f} ms ({B / dt:,.0f} qps)  "
            f"recall@{K}={recall:.5f}  excl_violations={viol}/{B}",
            flush=True,
        )


if __name__ == "__main__":
    main()
