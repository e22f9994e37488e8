"""Phase-cost probe for the threshold-select kernel.

select_topk_keys measures ~5.5 ms at (4096, 3072) while its op-count
model predicts ~2 ms; this isolates each phase in its own pallas_call
to find where the time goes:
  - search31 / search13: binary-search rounds (compare + row-reduce)
  - prefix: one Hillis-Steele inclusive scan (12 rolls, small shifts)
  - butterfly_small: 12 roll(+sh) stages, 2 arrays (sh = 1..2048)
  - butterfly_large: 12 roll(W-sh) stages, 2 arrays (the compaction
    direction used by the kernel — large rotate amounts)
  - copy: load + store only (fixed overhead floor)
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

B, W = 4096, 3072
BT = 256
ITERS = 30


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def _search_kernel(x_ref, o_ref, *, rounds, k=100):
    import jax.numpy as jnp

    pool = x_ref[:]
    tau = jnp.zeros((pool.shape[0], 1), dtype=jnp.int32)
    for bit in range(30, 30 - rounds, -1):
        cand = tau | (1 << bit)
        count = jnp.sum((pool >= cand).astype(jnp.int32), axis=1,
                        keepdims=True)
        tau = jnp.where(count >= k, cand, tau)
    o_ref[:] = pool + tau  # keep tau live


def _prefix_kernel(x_ref, o_ref):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    total = x
    shift = 1
    while shift < x.shape[1]:
        rolled = pltpu.roll(total, shift, 1)
        total = total + jnp.where(iota >= shift, rolled, 0)
        shift *= 2
    o_ref[:] = total


def _butterfly_kernel(x_ref, o_ref, *, large):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    keys = x_ref[:]
    meta = keys ^ 0x55555
    width = keys.shape[1]
    shift = 1
    while shift < width:
        amt = (width - shift) if large else shift
        in_keys = pltpu.roll(keys, amt, 1)
        in_meta = pltpu.roll(meta, amt, 1)
        moving = (meta & shift) != 0
        in_moving = (in_meta & shift) != 0
        keys = jnp.where(in_moving, in_keys, jnp.where(moving, 0, keys))
        meta = jnp.where(in_moving, in_meta - shift,
                         jnp.where(moving, 0, meta))
        shift *= 2
    o_ref[:] = keys + meta


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    xs = [
        jax.device_put(
            jnp.asarray(
                rng.integers(1, 1 << 30, size=(B, W)), dtype=jnp.int32
            )
        )
        for _ in range(4)
    ]
    spec = pl.BlockSpec((BT, W), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)

    def run(name, kernel):
        fn = jax.jit(
            lambda x: pl.pallas_call(
                kernel,
                grid=(B // BT,),
                in_specs=[spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((B, W), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )(x)
        )
        out = fn(xs[0])
        float(jnp.sum(out[:, :1].astype(jnp.float32)))
        start = time.perf_counter()
        for i in range(ITERS):
            out = fn(xs[i % 4])
        float(jnp.sum(out[:, :1].astype(jnp.float32)))
        ms = (time.perf_counter() - start) / ITERS * 1e3
        print(json.dumps({"phase": name, "ms": round(ms, 3)}), flush=True)

    run("copy", _copy_kernel)
    run("search13", functools.partial(_search_kernel, rounds=13))
    run("search31", functools.partial(_search_kernel, rounds=31))
    run("prefix", _prefix_kernel)
    run("butterfly_small", functools.partial(_butterfly_kernel,
                                             large=False))
    run("butterfly_large", functools.partial(_butterfly_kernel,
                                             large=True))


if __name__ == "__main__":
    main()
