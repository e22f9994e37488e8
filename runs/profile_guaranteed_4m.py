"""Phase breakdown of the guaranteed pipeline at 4M x 64 (VERDICT r3 #2).

Round 3 measured 51.1k QPS guaranteed at 4M bf16 (B=2048,
runs/probe_guaranteed_scale.py) — a straight-line 4x slowdown from the
1M headline. This probe decomposes the 4M cost into phases (raw sweep,
sweep + selection, full pipeline per retry count) and sweeps the
geometry knobs (corpus_tile, merge_levels, batch size, selector) to
find what actually binds at this scale before any structural work.

Run: python runs/profile_guaranteed_4m.py  (TPU; ~8 min)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CORPUS_SIZE = 4 * 1_048_576
DIM = 64
TOP_K = 100
BT = 512
ITERS = 8


def timed(fn, batches, *, iters=ITERS, warmup=2):
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
    corpus_dev = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))
    del corpus

    def report(name, ms, batch, note=""):
        print(
            json.dumps(
                {
                    "phase": name,
                    "ms": round(ms * 1e3, 2),
                    "qps": round(batch / ms),
                    "note": note,
                }
            ),
            flush=True,
        )

    def make_batches(batch):
        out = []
        for _ in range(4):
            q = rng.normal(size=(batch, DIM)).astype(np.float32)
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            out.append(jax.device_put(jnp.asarray(q, dtype=jnp.bfloat16)))
        return out

    for batch in (2048, 4096):
        batches = make_batches(batch)
        for ct in (2048, 4096):
            @jax.jit
            def scan_only(q, c, ct=ct):
                return tp.packed_lane_scan(
                    q, c, score_bound=1.0, batch_tile=BT, corpus_tile=ct,
                    reserve_bits=1,
                )

            report(
                f"scan B={batch} ct={ct}",
                timed(lambda q: scan_only(q, corpus_dev), batches),
                batch,
                "packed_lane_scan only, no selection",
            )

        for ml in (1, 2):
            @jax.jit
            def pass1(q, c, ml=ml):
                return tp.packed_certified_parts(
                    q, c, TOP_K, score_bound=1.0, batch_tile=BT,
                    corpus_tile=2048, merge_levels=ml, merge_keep=3,
                )

            ms = timed(lambda q: pass1(q, corpus_dev), batches)
            cert = float(
                np.mean(
                    [
                        float(
                            jnp.mean(
                                pass1(q, corpus_dev)[2].astype(jnp.float32)
                            )
                        )
                        for q in batches
                    ]
                )
            )
            report(
                f"pass1 B={batch} ml={ml}", ms, batch,
                f"incl. selection, certified_frac={cert:.4f}",
            )

        for retries in (0, 3):
            @jax.jit
            def pipe(q, c, r=retries):
                return tp.packed_guaranteed_topk(
                    q, c, TOP_K, score_bound=1.0, batch_tile=BT,
                    corpus_tile=2048, merge_levels=1, merge_keep=3,
                    retries=r, recompute_scores=False,
                )

            ms = timed(lambda q: pipe(q, corpus_dev), batches)
            cert = float(
                np.mean(
                    [
                        float(
                            jnp.mean(
                                pipe(q, corpus_dev)[2].astype(jnp.float32)
                            )
                        )
                        for q in batches
                    ]
                )
            )
            report(
                f"guaranteed B={batch} r={retries}", ms, batch,
                f"certified_frac={cert:.4f}",
            )


if __name__ == "__main__":
    main()
