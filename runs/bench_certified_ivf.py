"""Certified-IVF at serving scale: ANN speed with the exactness contract.

The 4M boundary analysis (BENCH_NOTES round 4) noted geometric pruning
cannot certify on uniform-random corpora but would on real embedding
manifolds. This bench quantifies both regimes at 1M x 64, B=32 (the
latency-bound regime IVF exists for):

- clustered corpus (256 Gaussian centers on the sphere, sigma=0.15 —
  the shape trained item embeddings actually take) with queries near
  centers: certified fraction vs nprobe, and the end-to-end rate of
  `search_certified` + exhaustive-guaranteed fallback for the residual.
- uniform-random corpus: certification ~0 by construction — the
  composed path honestly degrades to the guaranteed scan.

Run: python runs/bench_certified_ivf.py  (TPU; ~6 min)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N, D, B, K = 1_048_576, 64, 32, 100
CENTERS, SIGMA = 256, 0.04  # noise NORM ~ 0.04*sqrt(64) = 0.32: tight blobs
ITERS = 12


def main() -> None:
    import jax.numpy as jnp

    from xfmr_rec_tpu.index.ivf import IVFIndex
    from xfmr_rec_tpu.index.mips import RetrievalIndex

    rng = np.random.default_rng(0)

    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    mus = unit(rng.normal(size=(CENTERS, D))).astype(np.float32)
    assign = rng.integers(0, CENTERS, N)
    clustered = unit(
        mus[assign] + SIGMA * rng.normal(size=(N, D))
    ).astype(np.float32)
    random_corpus = unit(rng.normal(size=(N, D))).astype(np.float32)

    for name, corpus in (("clustered", clustered), ("random", random_corpus)):
        ids = np.arange(N)
        ivf = IVFIndex(corpus, ids, nprobe=8, kmeans_iters=6)
        exact = RetrievalIndex(corpus, ids, dtype="bfloat16", method="scan")
        queries = unit(
            mus[rng.integers(0, CENTERS, B)]
            + SIGMA * rng.normal(size=(B, D))
        ).astype(np.float32)

        # exhaustive guaranteed at this batch size (the alternative)
        exact.search_certified(queries, top_k=K, method="fused")
        t0 = time.perf_counter()
        for _ in range(ITERS):
            g_scores, _ = exact.search_certified(
                queries, top_k=K, method="fused"
            )
        np.asarray(g_scores)
        t_full = (time.perf_counter() - t0) / ITERS
        print(
            json.dumps(
                {
                    "corpus": name,
                    "path": "guaranteed full scan",
                    "ms": round(t_full * 1e3, 2),
                    "qps": round(B / t_full),
                }
            ),
            flush=True,
        )

        ivf.search(queries, top_k=K, nprobe=32)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            p_scores, _ = ivf.search(queries, top_k=K, nprobe=32)
        np.asarray(p_scores)
        t_plain = (time.perf_counter() - t0) / ITERS
        print(
            json.dumps(
                {
                    "corpus": name,
                    "path": "plain ivf nprobe=32 (no certificate)",
                    "ms": round(t_plain * 1e3, 2),
                    "qps": round(B / t_plain),
                }
            ),
            flush=True,
        )

        for nprobe in (8, 16, 32):
            ivf.search_certified(queries, top_k=K, nprobe=nprobe)  # compile
            # residuals pad to ONE fixed shape (B) so the fallback
            # reuses a single compiled executable; warm it now — a
            # first-call compile inside the loop would dominate the
            # timing and is not a steady-state serving cost
            exact.search(queries, top_k=K)
            t0 = time.perf_counter()
            certified = 0
            for _ in range(ITERS):
                scores, got_ids, ok = ivf.search_certified(
                    queries, top_k=K, nprobe=nprobe
                )
                residual = np.flatnonzero(~ok)
                if residual.size:
                    padded = queries[
                        np.resize(residual, B)
                    ]  # fixed shape; extra rows are wasted work only
                    r_scores, _ = exact.search(padded, top_k=K)
                    np.asarray(r_scores)
                certified += int(ok.sum())
            t_cert = (time.perf_counter() - t0) / ITERS
            print(
                json.dumps(
                    {
                        "corpus": name,
                        "path": f"certified ivf nprobe={nprobe} + fallback",
                        "ms": round(t_cert * 1e3, 2),
                        "qps": round(B / t_cert),
                        "certified_frac": round(
                            certified / (ITERS * B), 4
                        ),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
