"""Feature-toggle ladder from working k1 toward pallas_sort structure."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 8, 128

def run(name, make):
    try:
        f, args = make()
        t0 = time.time()
        y = jax.block_until_ready(jax.jit(f)(*args))
        s = jnp.sum(y[0] if isinstance(y, (tuple, list)) else y)
        print(f"{name}: OK ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)

def m1():  # 3-D (1,R,L) blocks, grid (2,), 1 prefetch
    def kern(br_ref, x_ref, o_ref):
        def body(s, x):
            return jax.lax.switch(br_ref[s], [lambda v: v + 1.0,
                                              lambda v: v * 1.01], x)
        o_ref[0] = jax.lax.fori_loop(0, 10, body, x_ref[0])
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(2,),
        in_specs=[pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0)))
    f = pl.pallas_call(kern, grid_spec=gs,
                       out_shape=jax.ShapeDtypeStruct((2, R, L), jnp.float32))
    br = jnp.asarray(np.arange(10, dtype=np.int32) % 2)
    x = jnp.ones((2, R, L), jnp.float32)
    return (lambda b, v: f(b, v)), (br, x)

def m2():  # + second prefetch arg
    def kern(br_ref, sp_ref, x_ref, o_ref):
        def body(s, x):
            return jax.lax.switch(br_ref[s], [lambda v: v + 1.0,
                                              lambda v: v * 1.01],
                                  x + sp_ref[s].astype(jnp.float32))
        o_ref[0] = jax.lax.fori_loop(0, 10, body, x_ref[0])
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(2,),
        in_specs=[pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0)))
    f = pl.pallas_call(kern, grid_spec=gs,
                       out_shape=jax.ShapeDtypeStruct((2, R, L), jnp.float32))
    br = jnp.asarray(np.arange(10, dtype=np.int32) % 2)
    sp = jnp.asarray(np.arange(10, dtype=np.int32))
    x = jnp.ones((2, R, L), jnp.float32)
    return (lambda b, s, v: f(b, s, v)), (br, sp, x)

def m3():  # + eidx input (constant index map) + %,//
    def kern(br_ref, e_ref, x_ref, o_ref):
        e = e_ref[0]
        lane = e % jnp.int32(L)
        def body(s, x):
            return jax.lax.switch(br_ref[s], [lambda v: v + 1.0,
                                              lambda v: v * 1.01], x)
        o_ref[0] = jax.lax.fori_loop(0, 10, body,
                                     x_ref[0] + lane.astype(jnp.float32))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(2,),
        in_specs=[pl.BlockSpec((1, R, L), lambda b, *_: (0, 0, 0)),
                  pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0)))
    f = pl.pallas_call(kern, grid_spec=gs,
                       out_shape=jax.ShapeDtypeStruct((2, R, L), jnp.float32))
    br = jnp.asarray(np.arange(10, dtype=np.int32) % 2)
    e = jnp.asarray(np.arange(R * L, dtype=np.int32).reshape(1, R, L))
    x = jnp.ones((2, R, L), jnp.float32)
    return (lambda b, ee, v: f(b, ee, v)), (br, e, x)

def m4():  # + tuple carry and multi-output
    def kern(br_ref, x_ref, y_ref, ox_ref, oy_ref):
        def body(s, xy):
            x, y = xy
            return jax.lax.switch(br_ref[s],
                                  [lambda op: (op[0] + 1.0, op[1]),
                                   lambda op: (op[0], op[1] * 1.01)],
                                  (x, y))
        a, b = jax.lax.fori_loop(0, 10, body, (x_ref[0], y_ref[0]))
        ox_ref[0] = a
        oy_ref[0] = b
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(2,),
        in_specs=[pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0))] * 2,
        out_specs=(pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0)),
                   pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0))))
    f = pl.pallas_call(kern, grid_spec=gs, out_shape=(
        jax.ShapeDtypeStruct((2, R, L), jnp.float32),
        jax.ShapeDtypeStruct((2, R, L), jnp.float32)))
    br = jnp.asarray(np.arange(10, dtype=np.int32) % 2)
    x = jnp.ones((2, R, L), jnp.float32)
    return (lambda b, v, w: f(b, v, w)), (br, x, x + 1)

if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run("m1 3D blocks", m1)
    run("m2 dual prefetch", m2)
    run("m3 eidx const map", m3)
    run("m4 tuple carry multi-out", m4)
