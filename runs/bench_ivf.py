"""IVF TPU drive v2: fast build check + steady-state latency + recall on
clustered (mixture-of-Gaussians) vs uniform-random corpora."""
import numpy as np, time
from xfmr_rec_tpu.index import IVFIndex, exact_topk

def make(kind, n, d, seed=0):
    rng = np.random.default_rng(seed)
    if kind == "uniform":
        c = rng.normal(size=(n, d)).astype(np.float32)
    else:  # mixture: 256 centers, 0.3 spread (realistic embedding lumpiness)
        centers = rng.normal(size=(256, d)).astype(np.float32)
        which = rng.integers(0, 256, n)
        c = centers[which] + 0.3 * rng.normal(size=(n, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    return c

N, D, B, K10 = 100_000, 64, 32, 10
for kind in ("mixture", "uniform"):
    c = make(kind, N, D)
    rng = np.random.default_rng(9)
    pick = rng.integers(0, N, B)
    q = c[pick] + 0.1 * rng.normal(size=(B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t0 = time.perf_counter()
    idx = IVFIndex(c, np.arange(N), seed=0)
    print(f"[{kind}] build {time.perf_counter()-t0:.1f}s K={idx.num_clusters} bucket={idx.bucket_size} fill={idx.fill:.2f}", flush=True)
    _, want = exact_topk(q, c, K10)
    want_sets = [set(np.asarray(want[b]).tolist()) for b in range(B)]
    for nprobe in (1, 8, 32):
        idx.search(q, top_k=K10, nprobe=nprobe)  # compile
        t0 = time.perf_counter()
        for _ in range(20):
            _, ids = idx.search(q, top_k=K10, nprobe=nprobe)
        dt = (time.perf_counter() - t0) / 20
        rec = np.mean([len(set(ids[b].tolist()) & want_sets[b]) / K10 for b in range(B)])
        print(f"[{kind}] nprobe={nprobe}: recall@10={rec:.3f}  {dt*1e3:.1f} ms/32q steady", flush=True)
