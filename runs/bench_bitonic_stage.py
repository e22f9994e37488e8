"""Feasibility probe: cost of roll-based bitonic compare-exchange stages.

XLA's top_k over the (4096, 3072) selection pool costs ~7 ms
(bench_topk_select). A bitonic top-k network needs ~36 effective
compare-exchange stages (28 to sort 128-blocks + 5 merge+clean rounds
on halving widths). Each stage = 2 rolls per carried array
(keys + lanes) + masked select. This kernel times N identical stages
over the full (4096, 4096) buffer to price one stage; viability bar:
<= ~0.1 ms/stage means a full selection lands ~2-3 ms vs top_k's 7.
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

B, W = 4096, 4096
STAGES = 16
BT = 256  # 512 blows the scoped-vmem stack (4 i32 buffers + roll temps)


def _kernel(k_ref, l_ref, ko_ref, lo_ref, *, stages):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    keys = k_ref[:]
    lanes = l_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
    for s in range(stages):
        j = 1 << (s % 7)  # strides 1..64 cycled — the realistic mix
        kdir = 128
        lo = (iota & j) == 0
        take_max = ((iota & kdir) == 0) == lo
        w = keys.shape[1]
        # pltpu.roll requires non-negative shifts: roll(-j) == roll(w - j)
        pk = jnp.where(
            lo,
            pltpu.roll(keys, w - j, 1),
            pltpu.roll(keys, j, 1),
        )
        plane = jnp.where(
            lo,
            pltpu.roll(lanes, w - j, 1),
            pltpu.roll(lanes, j, 1),
        )
        partner_beats = (pk > keys) | ((pk == keys) & lo)
        use_partner = take_max == partner_beats
        keys = jnp.where(use_partner, pk, keys)
        lanes = jnp.where(use_partner, plane, lanes)
    ko_ref[:] = keys
    lo_ref[:] = lanes


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    keys = [
        jax.device_put(
            jnp.asarray(
                rng.integers(1, 1 << 30, size=(B, W)), dtype=jnp.int32
            )
        )
        for _ in range(4)
    ]
    lanes = jax.device_put(
        jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32), (B, W))
    )

    for stages in (1, STAGES):
        spec = pl.BlockSpec((BT, W), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
        fn = jax.jit(
            lambda k, l, n=stages: pl.pallas_call(
                functools.partial(_kernel, stages=n),
                grid=(B // BT,),
                in_specs=[spec, spec],
                out_specs=[spec, spec],
                out_shape=[
                    jax.ShapeDtypeStruct((B, W), jnp.int32),
                    jax.ShapeDtypeStruct((B, W), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )(k, l)
        )
        out = fn(keys[0], lanes)
        float(jnp.sum(out[0][:, :1].astype(jnp.float32)))
        start = time.perf_counter()
        iters = 30
        for i in range(iters):
            out = fn(keys[i % 4], lanes)
        float(jnp.sum(out[0][:, :1].astype(jnp.float32)))
        ms = (time.perf_counter() - start) / iters * 1e3
        print(
            json.dumps({"stages": stages, "ms": round(ms, 3)}), flush=True
        )


if __name__ == "__main__":
    main()
