"""Sharded-index throughput model (VERDICT r4 #4): turn "the >=4M answer
is the sharded index" into numbers.

Components, each measured or bounded explicitly:

1. T_scan(n): single-chip guaranteed-exact ms/batch (B=4096, k=100,
   bench.py settings) at shard sizes 0.5M/1M/2M/4M. A linear fit on
   {0.5M, 1M, 2M} predicts 4M; the 4M measurement validates the model
   (VERDICT asked for <=10% error).
2. T_merge(m): the key-space candidate merge a chip performs after the
   all-gather — measured on this chip by timing the same top-k over a
   concatenated (B, m*W) key pool for m in {2,4,8} (W = per-shard
   candidate pool width, 1.5*k rounded to lanes).
3. T_link(m): ICI transport for the all-gather of per-shard pools:
   bytes/chip = B * W * 4 * (m-1). Reported at 45 GB/s effective
   link bandwidth (conservative public-order v5e figure) — even at 8
   chips this is sub-millisecond, so projections are insensitive to
   the exact ICI number (also printed at 2x to show the spread).

Projection: QPS(m, N) = B / (T_scan(N/m) + T_merge(m) + T_link(m)),
for m in {1,2,4,8}, N in {4M, 16M}. The collective count of the real
sharded pipeline is verified on the 8-device virtual CPU mesh by
tests/test_parallel.py / test_sharded_index.py (one all-gather per
pass); this script models the steady single-pass path plus the
measured retry distribution baked into T_scan.

Run: python runs/bench_shard_model.py  (TPU, ~6 min)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

DIM = 64
BATCH = 4096
TOP_K = 100
BATCH_TILE = 512
CORPUS_TILE = 2048
ITERS = 12
SIZES = (524_288, 1_048_576, 2_097_152, 4_194_304)
POOL_W = 256  # per-shard candidate pool width (1.5k -> lane-rounded)
ICI_GBPS = 45e9


def make_corpus(n, rng):
    corpus = rng.normal(size=(n, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    corpus = np.concatenate(
        [corpus, np.full((n, 1), 1.5, np.float32)], axis=1
    )
    return jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))


def measure_scan(n, rng):
    from xfmr_rec_tpu.ops.topk_pallas import packed_guaranteed_topk

    corpus = make_corpus(n, rng)
    batches = []
    for _ in range(4):
        q = rng.normal(size=(BATCH, DIM)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        batches.append(jax.device_put(jnp.asarray(q, jnp.bfloat16)))

    @jax.jit
    def search(q, c):
        return packed_guaranteed_topk(
            q, c, TOP_K, score_bound=1.0, batch_tile=BATCH_TILE,
            corpus_tile=CORPUS_TILE, merge_levels=1, merge_keep=3,
            bias_in_dot=True, retries=3, recompute_scores=False,
        )

    def drain(out):
        return float(jnp.sum(out[0].astype(jnp.float32)[..., :1]))

    out = None
    for i in range(3):
        out = search(batches[i % 4], corpus)
    drain(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = search(batches[i % 4], corpus)
    drain(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    del corpus
    return ms


def measure_merge(m, rng):
    """Key-space merge of m per-shard pools: top-k over (B, m*W) int32
    keys + gather of the winning positions (the post-all-gather step)."""
    keys = jax.device_put(
        jnp.asarray(
            rng.integers(0, 2**31 - 1, (BATCH, m * POOL_W), dtype=np.int64)
            .astype(np.int32)
        )
    )
    pos = jax.device_put(
        jnp.asarray(
            rng.integers(0, 4_194_304, (BATCH, m * POOL_W), dtype=np.int64)
            .astype(np.int32)
        )
    )

    @jax.jit
    def merge(keys, pos):
        topv, arg = jax.lax.top_k(keys, TOP_K)
        return topv, jnp.take_along_axis(pos, arg, axis=-1)

    out = merge(keys, pos)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = merge(keys, pos)
    float(jnp.sum(out[0]))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main() -> None:
    print(f"devices: {jax.devices()}  B={BATCH} k={TOP_K} dim={DIM}")
    rng = np.random.default_rng(0)

    scan_ms = {}
    for n in SIZES:
        scan_ms[n] = measure_scan(n, rng)
        print(
            f"scan n={n:>9,d}: {scan_ms[n]:7.2f} ms/batch "
            f"({BATCH / scan_ms[n] * 1e3:8.0f} qps)"
        )

    # linear fit on the three sub-4M points -> predict 4M (validation)
    xs = np.array(SIZES[:3], dtype=np.float64)
    ys = np.array([scan_ms[n] for n in SIZES[:3]])
    b, a = np.polyfit(xs, ys, 1)
    pred_4m = a + b * SIZES[3]
    err = abs(pred_4m - scan_ms[SIZES[3]]) / scan_ms[SIZES[3]]
    print(
        f"linear fit T_scan(n) = {a:.2f} ms + {b * 1e6:.4f} ms/Mrow; "
        f"predicted 4M = {pred_4m:.2f} ms vs measured "
        f"{scan_ms[SIZES[3]]:.2f} ms ({err:.1%} error)"
    )

    merge_ms = {1: 0.0}
    for m in (2, 4, 8):
        merge_ms[m] = measure_merge(m, rng)
        print(f"merge m={m}: {merge_ms[m]:6.2f} ms/batch")

    def t_link(m, gbps=ICI_GBPS):
        # 8 bytes/candidate: the post-gather merge consumes keys AND
        # positions (review round 5 — 4 B/candidate undercounted the
        # payload by half; still sub-ms at every m, so projections move
        # by <0.5%)
        return BATCH * POOL_W * 8 * (m - 1) / gbps * 1e3  # ms

    rows = []
    for total_n in (4_194_304, 16_777_216):
        for m in (1, 2, 4, 8):
            shard_n = total_n // m
            t_scan = a + b * shard_n
            if shard_n in scan_ms:
                t_scan = scan_ms[shard_n]  # prefer measurements
            total_ms = t_scan + merge_ms[m] + t_link(m)
            qps = BATCH / total_ms * 1e3
            rows.append(
                {
                    "items": total_n,
                    "chips": m,
                    "t_scan_ms": round(t_scan, 2),
                    "t_merge_ms": round(merge_ms[m], 2),
                    "t_link_ms@45GBps": round(t_link(m), 3),
                    "t_link_ms@90GBps": round(t_link(m, 2 * ICI_GBPS), 3),
                    "qps": round(qps, 0),
                }
            )
            print(
                f"N={total_n:>10,d} m={m}: scan {t_scan:7.2f} + merge "
                f"{merge_ms[m]:5.2f} + link {t_link(m):5.3f} ms -> "
                f"{qps:9.0f} qps"
            )
    out = pathlib.Path("runs/shard_model.json")
    out.write_text(
        json.dumps(
            {
                "scan_ms": {str(k): v for k, v in scan_ms.items()},
                "fit": {"a_ms": a, "b_ms_per_row": b},
                "fit_4m_error": err,
                "merge_ms": {str(k): v for k, v in merge_ms.items()},
                "projection": rows,
            },
            indent=1,
        )
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
