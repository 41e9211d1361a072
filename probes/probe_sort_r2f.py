"""Bisect the Mosaic crash: fori+switch ladder."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

R, L = 8, 128

def try_kernel(name, kern, n_in=1):
    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.uniform(-1, 1, (R, L)).astype(np.float32))
            for _ in range(n_in)]
    br = jnp.asarray(np.arange(10, dtype=np.int32) % 2)
    try:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((R, L), lambda b, *_: (0, 0))] * n_in,
            out_specs=pl.BlockSpec((R, L), lambda b, *_: (0, 0)))
        f = pl.pallas_call(kern, grid_spec=grid_spec,
                           out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32))
        t0 = time.time()
        y = jax.block_until_ready(jax.jit(f)(br, *args))
        print(f"{name}: OK ({time.time()-t0:.0f}s) sum={float(jnp.sum(y)):.2f}",
              flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:150]}", flush=True)


def k1(br_ref, x_ref, o_ref):
    def body(s, x):
        return jax.lax.switch(br_ref[s], [lambda v: v + 1.0,
                                          lambda v: v * 1.01], x)
    o_ref[...] = jax.lax.fori_loop(0, 10, body, x_ref[...])

def k2(br_ref, x_ref, o_ref):
    def mk(d):
        def f(v):
            return jnp.where((jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
                              & d) == 0,
                             pltpu.roll(v, L - d, 1), pltpu.roll(v, d, 1))
        return f
    branches = [mk(1 << i) for i in range(7)]
    def body(s, x):
        return jax.lax.switch(br_ref[s] % 7, branches, x)
    o_ref[...] = jax.lax.fori_loop(0, 10, body, x_ref[...])

def k3(br_ref, x_ref, o_ref):
    def rswap(v, rd):
        g = v.reshape(R // (2 * rd), 2, rd, L)
        sw = jnp.concatenate([g[:, 1:2], g[:, 0:1]], axis=1)
        return sw.reshape(R, L)
    branches = [lambda v: rswap(v, 1), lambda v: rswap(v, 2),
                lambda v: rswap(v, 4)]
    def body(s, x):
        return jax.lax.switch(br_ref[s] % 3, branches, x)
    o_ref[...] = jax.lax.fori_loop(0, 10, body, x_ref[...])

def k4(br_ref, x_ref, y_ref, o_ref):
    def mk(d):
        def f(op):
            a, b = op
            pa = pltpu.roll(a, d, 1)
            pb = pltpu.roll(b, d, 1)
            keep = a <= pa
            return (jnp.where(keep, a, pa), jnp.where(keep, b, pb))
        return f
    branches = [mk(1 << i) for i in range(7)]
    def body(s, ab):
        return jax.lax.switch(br_ref[s] % 7, branches, ab)
    a, b = jax.lax.fori_loop(0, 10, body, (x_ref[...], y_ref[...]))
    o_ref[...] = a + b

if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    try_kernel("k1 fori+switch trivial", k1)
    try_kernel("k2 switch of 7 roll branches", k2)
    try_kernel("k3 switch of reshape-concat", k3)
    try_kernel("k4 tuple carry + CE", k4, n_in=2)
