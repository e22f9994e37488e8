"""Guaranteed-exact at the CF-augmented width: 1M x (64+128+1), B=4096.

Measures what the factorized-CF channel costs at serving scale: the
fully composed score (learned + itemCF + popularity) over 1M items —
MEASURED 150,448 QPS at certified_frac 1.0000 (vs 203.7k for the bare
64-d corpus). Note: the printed label says dim384 (script derived from
probe_guaranteed_384_b4096.py); the geometry constant below is 193.

Run: python runs/probe_guaranteed_cf_width.py  (TPU; ~4 min)
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from xfmr_rec_tpu.ops import topk_pallas as tp
N, D, B, K = 1_048_576, 193, 4096, 100
rng = np.random.default_rng(0)
corpus = rng.normal(size=(N, D)).astype(np.float32)
corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
cd = jax.device_put(jnp.asarray(corpus, jnp.bfloat16)); del corpus
qs = []
for _ in range(4):
    q = rng.normal(size=(B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qs.append(jax.device_put(jnp.asarray(q, jnp.bfloat16)))
fn = jax.jit(lambda q, c: tp.packed_guaranteed_topk(
    q, c, K, score_bound=1.0, batch_tile=512, corpus_tile=2048,
    merge_levels=1, merge_keep=3, retries=3, recompute_scores=False))
out = None
for i in range(3): out = fn(qs[i % 4], cd)
float(jnp.sum(out[0].astype(jnp.float32)[:, :1]))
t0 = time.perf_counter()
for i in range(8): out = fn(qs[i % 4], cd)
float(jnp.sum(out[0].astype(jnp.float32)[:, :1]))
ms = (time.perf_counter() - t0) / 8
cert = float(np.mean([float(jnp.mean(fn(q, cd)[2].astype(jnp.float32))) for q in qs]))
print(json.dumps({"shape": f"1M dim384 bf16 B={B} r=3", "ms": round(ms*1e3, 2), "qps": round(B/ms), "certified_frac": round(cert, 4)}))
