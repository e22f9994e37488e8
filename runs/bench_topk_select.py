"""Selection-phase microbench: top-k over the packed-key pool.

The guaranteed pipeline's pass 1 spends ~6.1 ms of its 17.5 ms in
jax.lax.top_k over the (4096, 3072) int32 key pool (profile_guaranteed).
Candidates measured here, all EXACT:
  - top_k on i32 keys (current)
  - top_k on the keys bitcast to f32 (packed keys are positive floats,
    so f32 order == i32 order; TPU sorts may prefer float lanes)
  - two-stage split: top_k(k) per half then merge 2k
  - full sort + slice (reference point)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

B, W, K = 4096, 3072, 100
ITERS = 30


def timed(fn, xs):
    import jax.numpy as jnp

    out = fn(xs[0])
    for x in xs:
        out = fn(x)
    float(jnp.sum(jnp.asarray(out[0], jnp.float32)[..., :1]))
    start = time.perf_counter()
    for i in range(ITERS):
        out = fn(xs[i % len(xs)])
    float(jnp.sum(jnp.asarray(out[0], jnp.float32)[..., :1]))
    return (time.perf_counter() - start) / ITERS


def main() -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # packed-key-shaped values: positive floats in [1.25, 1.75) bitcast
    pools = []
    for _ in range(4):
        f = rng.uniform(1.25, 1.75, size=(B, W)).astype(np.float32)
        pools.append(
            jax.device_put(
                jnp.asarray(f.view(np.int32) & ~0x3, dtype=jnp.int32)
            )
        )

    @jax.jit
    def tk_i32(keys):
        return jax.lax.top_k(keys, K)

    @jax.jit
    def tk_f32(keys):
        vals, idx = jax.lax.top_k(
            jax.lax.bitcast_convert_type(keys, jnp.float32), K
        )
        return jax.lax.bitcast_convert_type(vals, jnp.int32), idx

    @jax.jit
    def tk_split(keys):
        h = W // 2
        v1, i1 = jax.lax.top_k(keys[:, :h], K)
        v2, i2 = jax.lax.top_k(keys[:, h:], K)
        v, sel = jax.lax.top_k(
            jnp.concatenate([v1, v2], axis=-1), K
        )
        idx = jnp.take_along_axis(
            jnp.concatenate([i1, i2 + h], axis=-1), sel, axis=-1
        )
        return v, idx

    @jax.jit
    def tk_split_f32(keys):
        f = jax.lax.bitcast_convert_type(keys, jnp.float32)
        h = W // 2
        v1, i1 = jax.lax.top_k(f[:, :h], K)
        v2, i2 = jax.lax.top_k(f[:, h:], K)
        v, sel = jax.lax.top_k(jnp.concatenate([v1, v2], axis=-1), K)
        idx = jnp.take_along_axis(
            jnp.concatenate([i1, i2 + h], axis=-1), sel, axis=-1
        )
        return jax.lax.bitcast_convert_type(v, jnp.int32), idx

    @jax.jit
    def sort_slice(keys):
        s = jnp.sort(keys, axis=-1)[:, ::-1][:, :K]
        return s, s

    from xfmr_rec_tpu.ops.topk_pallas import select_topk_keys

    @jax.jit
    def pallas_select(keys):
        return select_topk_keys(keys, K)

    @jax.jit
    def pallas_select_bt512(keys):
        return select_topk_keys(keys, K, batch_tile=512)

    @jax.jit
    def pallas_select_fast(keys):
        # the packed-caller configuration: bench pool has 10 index/stamp
        # bits (512 tiles + 1 reserve) and float-window keys
        return select_topk_keys(
            keys, K, quantum_bits=10, shared_exponent=True
        )

    for name, fn in [
        ("top_k_i32", tk_i32),
        ("top_k_f32_bitcast", tk_f32),
        ("top_k_split2_i32", tk_split),
        ("top_k_split2_f32", tk_split_f32),
        ("sort_slice_i32", sort_slice),
        ("pallas_threshold_select", pallas_select),
        ("pallas_threshold_select_bt512", pallas_select_bt512),
        ("pallas_threshold_select_q10_exp", pallas_select_fast),
    ]:
        ms = timed(fn, pools) * 1e3
        print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)

    # correctness: variants agree with the i32 reference
    v0, _ = tk_i32(pools[0])
    for name, fn in [("f32", tk_f32), ("split2", tk_split),
                     ("split2_f32", tk_split_f32),
                     ("pallas", pallas_select),
                     ("pallas_bt512", pallas_select_bt512)]:
        v, _ = fn(pools[0])
        assert jnp.array_equal(v0, v), name
    # pallas lanes point at the claimed keys
    v, lanes = pallas_select(pools[0])
    gathered = jnp.take_along_axis(pools[0], lanes, axis=-1)
    assert jnp.array_equal(jnp.where(v > 0, gathered, 0),
                           jnp.where(v > 0, v, 0))
    # quantum variant: agreement above the 10 tie-break bits
    vq, lanesq = pallas_select_fast(pools[0])
    assert jnp.array_equal(v0 >> 10, vq >> 10)
    gq = jnp.take_along_axis(pools[0], lanesq, axis=-1)
    assert jnp.array_equal(jnp.where(vq > 0, gq, 0),
                           jnp.where(vq > 0, vq, 0))
    print(json.dumps({"check": "values agree"}), flush=True)


if __name__ == "__main__":
    main()
