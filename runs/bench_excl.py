"""Exclusion search path: scan_kernel f32 vs packed at 1M x 64, B=2048, E=32."""
import numpy as np, time
import jax, jax.numpy as jnp
from xfmr_rec_tpu.index import RetrievalIndex

N, D, B, K, E = 1_048_576, 64, 2048, 100, 32
rng = np.random.default_rng(0)
c = rng.normal(size=(N, D)).astype(np.float32); c /= np.linalg.norm(c, axis=-1, keepdims=True)
qs = []
for s in range(4):
    q = rng.normal(size=(B, D)).astype(np.float32); q /= np.linalg.norm(q, axis=-1, keepdims=True)
    qs.append(q)
excl = rng.integers(0, N, (B, E)).astype(np.int32)

for kernel in ("f32", "packed"):
    idx = RetrievalIndex(c, np.arange(N), dtype="bfloat16", method="scan", scan_kernel=kernel)
    # pipelined: call the jitted fn directly with device inputs
    fn = idx._search_fn
    qd = [jax.device_put(jnp.asarray(q, idx._query_dtype)) for q in qs]
    ed = jax.device_put(jnp.asarray(excl))
    if kernel == "packed":
        bound = jnp.float32(idx._corpus_maxnorm * 1.05)
        args = lambda i: (qd[i % 4], ed, K, bound, idx._corpus_arg, idx._scales_arg)
    else:
        args = lambda i: (qd[i % 4], ed, K, idx._corpus_arg, idx._scales_arg)
    def drain(o):
        return float(jnp.sum(jnp.asarray(o[0], jnp.float32)[..., :1]))
    out = None
    for i in range(3): out = fn(*args(i))
    drain(out)
    t0 = time.perf_counter(); IT = 20
    for i in range(IT): out = fn(*args(i))
    drain(out)
    dt = (time.perf_counter() - t0) / IT
    # sanity: exclusions respected on a slice
    pos = np.asarray(out[1][:64])
    bad = sum(bool(set(pos[b]) & set(excl[b].tolist())) for b in range(64))
    print(f"{kernel}: {dt*1e3:.2f} ms  ({B/dt:,.0f} qps)  excl_violations={bad}/64", flush=True)
