"""Final bisect: bool-where and dynamic scalar AND."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 8, 128

def run(name, kern, extra=()):
    try:
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((R, L), lambda b, *_: (0, 0))],
            out_specs=pl.BlockSpec((R, L), lambda b, *_: (0, 0)))
        f = pl.pallas_call(kern, grid_spec=gs,
                           out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32))
        br = jnp.asarray(np.arange(10, dtype=np.int32) + 1)
        x = jnp.ones((R, L), jnp.float32)
        y = jax.block_until_ready(jax.jit(f)(br, x))
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)

def m5(br_ref, x_ref, o_ref):  # where on bool operands
    x = x_ref[...]
    a = x > 0.5
    b = x < 2.0
    m = x > 1.0
    keep = jnp.where(m, a, b)
    o_ref[...] = jnp.where(keep, x, -x)

def m6(br_ref, x_ref, o_ref):  # dynamic scalar AND vs iota tensor
    e = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    def body(s, x):
        up = (e & br_ref[s]) == 0
        return jnp.where(up, x + 1.0, x - 1.0)
    o_ref[...] = jax.lax.fori_loop(0, 10, body, x_ref[...])

def m7(br_ref, x_ref, o_ref):  # logical-op keep (the fix candidate)
    x = x_ref[...]
    a = x > 0.5
    b = x < 2.0
    m = x > 1.0
    keep = (m & a) | (jnp.logical_not(m) & b)
    o_ref[...] = jnp.where(keep, x, -x)

if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run("m5 bool-where", m5)
    run("m6 dyn scalar AND", m6)
    run("m7 logical keep", m7)
