"""Device-bound small-batch latency: IVF probe vs exhaustive packed scan
over a clustered 1M x 64 corpus (pipelined dispatch, host-transfer drain)."""
import numpy as np, time
import jax, jax.numpy as jnp
from xfmr_rec_tpu.index.ivf import IVFIndex
from xfmr_rec_tpu.ops.topk_pallas import packed_certified_topk

N, D, B, K = 1_048_576, 64, 32, 100
rng = np.random.default_rng(0)
centers = rng.normal(size=(1024, D)).astype(np.float32)
which = rng.integers(0, 1024, N)
c = centers[which] + 0.3 * rng.normal(size=(N, D)).astype(np.float32)
c /= np.linalg.norm(c, axis=-1, keepdims=True)
qs = []
for s in range(4):
    pick = rng.integers(0, N, B)
    q = c[pick] + 0.1 * rng.normal(size=(B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    qs.append(q)

t0 = time.perf_counter()
idx = IVFIndex(c, np.arange(N), seed=0)
print(f"ivf build {time.perf_counter()-t0:.1f}s K={idx.num_clusters} bucket={idx.bucket_size} fill={idx.fill:.2f}", flush=True)

def drain(x):
    return float(jnp.sum(jnp.asarray(x[0], jnp.float32)[..., :1]))

# IVF device path: call the jitted probe directly (pipelined)
probe = idx._probe_fn
qdev = [jax.device_put(jnp.asarray(q)) for q in qs]
args = (idx.centroids, idx.buckets, idx.positions, None)
out = None
for i in range(3):
    out = probe(qdev[i % 4], K, 8, *args)
drain(out)
t0 = time.perf_counter(); IT = 50
for i in range(IT):
    out = probe(qdev[i % 4], K, 8, *args)
drain(out)
dt = (time.perf_counter() - t0) / IT
print(f"IVF nprobe=8 B={B}: {dt*1e3:.3f} ms/batch  ({B/dt:,.0f} qps)", flush=True)

# exhaustive packed scan at the same batch
caug = np.concatenate([c, np.full((N, 1), 1.5, np.float32)], axis=1)
cdev = jax.device_put(jnp.asarray(caug, jnp.bfloat16))
qb = [jax.device_put(jnp.asarray(q, jnp.bfloat16)) for q in qs]
fn = jax.jit(lambda q, c: packed_certified_topk(
    q, c, K, score_bound=1.0, batch_tile=32, corpus_tile=2048,
    merge_levels=1, bias_in_dot=True, recompute_scores=False))
out = None
for i in range(3):
    out = fn(qb[i % 4], cdev)
drain(out)
t0 = time.perf_counter(); IT = 20
for i in range(IT):
    out = fn(qb[i % 4], cdev)
drain(out)
dt = (time.perf_counter() - t0) / IT
print(f"exhaustive packed B={B}: {dt*1e3:.3f} ms/batch  ({B/dt:,.0f} qps)", flush=True)

# recall of the IVF path on this corpus at nprobe=8
from xfmr_rec_tpu.index import exact_topk
_, want = exact_topk(qs[0], c, K)
_, ids = idx.search(qs[0], top_k=K, nprobe=8)
rec = np.mean([len(set(ids[b].tolist()) & set(np.asarray(want[b]).tolist())) / K for b in range(B)])
print(f"IVF nprobe=8 recall@100 (ids offset: ids==positions here): {rec:.3f}", flush=True)
