"""Which 16-bit elementwise ops does this Mosaic target support?"""
import functools, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_op(name, kernel, dtypes):
    try:
        x = jnp.asarray(np.random.randn(256, 512), dtypes[0])
        y = jnp.asarray(np.random.randn(256, 512), dtypes[1]) if len(dtypes) > 1 else None
        args = (x,) if y is None else (x, y)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256, 512), dtypes[-1]),
        )(*args)
        jax.block_until_ready(out)
        print(f"OK   {name}")
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"FAIL {name}: {msg}")

def k_max(x_ref, y_ref, o_ref):
    o_ref[:] = jnp.maximum(x_ref[:], y_ref[:])
def k_cmp_sel(x_ref, y_ref, o_ref):
    m = x_ref[:] > y_ref[:]
    o_ref[:] = jnp.where(m, x_ref[:], y_ref[:])
def k_shift_or(x_ref, o_ref):
    v = x_ref[:]
    o_ref[:] = (v << 3) | (v >> 13)
def k_bitcast_pack(x_ref, o_ref):
    bits = jax.lax.bitcast_convert_type(x_ref[:].astype(jnp.bfloat16), jnp.int16)
    o_ref[:] = (bits << 2) | 1

bf = jnp.bfloat16; i16 = jnp.int16; i32 = jnp.int32; f32 = jnp.float32
try_op("bf16 max", k_max, (bf, bf, bf))
try_op("bf16 cmp+select", k_cmp_sel, (bf, bf, bf))
try_op("int16 max", k_max, (i16, i16, i16))
try_op("int16 cmp+select", k_cmp_sel, (i16, i16, i16))
try_op("int16 shift/or", k_shift_or, (i16, i16))
try_op("f32->bf16 bitcast->i16 pack", k_bitcast_pack, (f32, i16))
try_op("int32 max (control)", k_max, (i32, i32, i32))
