"""ShardedRetrievalIndex overhead at mesh size 1 vs single-chip index.

One real chip can't measure multi-chip scaling, but it CAN measure what
the shard_map wrapper costs when the mesh is trivial: same corpus, same
kernel, same exclusion width — RetrievalIndex._search_fn vs
ShardedRetrievalIndex._search_fn, device inputs, drain via a scalar
reduction (bulk result transfers would measure the axon relay, not the
device — see bench.py's harness notes).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from xfmr_rec_tpu.index import RetrievalIndex, ShardedRetrievalIndex

N, D, B, K, E = 1_048_576, 64, 2048, 100, 32
rng = np.random.default_rng(0)
c = rng.normal(size=(N, D)).astype(np.float32)
c /= np.linalg.norm(c, axis=-1, keepdims=True)
qs = []
for s in range(4):
    q = rng.normal(size=(B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    qs.append(q)
excl = rng.integers(0, N, (B, E)).astype(np.int32)


def drain(o):
    return float(jnp.sum(jnp.asarray(o[0], jnp.float32)[..., :1]))


def run(label, fn, args):
    out = None
    for i in range(3):
        out = fn(*args(i))
    drain(out)
    t0 = time.perf_counter()
    iters = 20
    for i in range(iters):
        out = fn(*args(i))
    drain(out)
    dt = (time.perf_counter() - t0) / iters
    pos = np.asarray(out[1][:64])
    bad = sum(bool(set(pos[b]) & set(excl[b].tolist())) for b in range(64))
    print(
        f"{label}: {dt * 1e3:.2f} ms  ({B / dt:,.0f} qps)  "
        f"excl_violations={bad}/64",
        flush=True,
    )


single = RetrievalIndex(c, np.arange(N), method="scan")
qd = [jax.device_put(jnp.asarray(q, single._query_dtype)) for q in qs]
ed = jax.device_put(jnp.asarray(excl))
bound = jnp.float32(single._corpus_maxnorm * 1.05)
run(
    "single-chip packed",
    single._search_fn,
    lambda i: (qd[i % 4], ed, K, bound, single._corpus_arg, single._scales_arg),
)
del single

sharded = ShardedRetrievalIndex(c, np.arange(N), model_parallel=1)
run(
    "sharded m=1 packed",
    sharded._search_fn,
    lambda i: (qd[i % 4], ed, K, bound, sharded.corpus),
)


def run_guaranteed(label, fn, args):
    out = None
    for i in range(3):
        out = fn(*args(i))
    drain(out)
    t0 = time.perf_counter()
    iters = 20
    for i in range(iters):
        out = fn(*args(i))
    drain(out)
    dt = (time.perf_counter() - t0) / iters
    frac = float(jnp.mean(jnp.asarray(out[2], jnp.float32)))
    print(
        f"{label}: {dt * 1e3:.2f} ms  ({B / dt:,.0f} qps)  "
        f"certified_frac={frac:.4f}",
        flush=True,
    )


run_guaranteed(
    "sharded m=1 guaranteed (fused)",
    sharded._guaranteed_fn,
    lambda i: (qd[i % 4], K, bound, sharded.corpus),
)

from xfmr_rec_tpu.ops.topk_pallas import packed_guaranteed_topk

single2 = RetrievalIndex(c, np.arange(N), method="scan")
gfn = jax.jit(
    lambda q, k, bnd, corp, s: packed_guaranteed_topk(
        q, corp, k, score_bound=bnd, scales=s
    ),
    static_argnames=("k",),
)
run_guaranteed(
    "single-chip guaranteed (fused)",
    gfn,
    lambda i: (qd[i % 4], K, bound, single2._corpus_arg, single2._scales_arg),
)
