"""Isolate the Mosaic compile failure: which primitive kills the compiler?
(a) sublane roll, (b) lane-roll CE chain, (c) reshape+concat row swap,
(d) 28-stage lane-only bitonic on (8,128), (e) 66-stage bitonic at (16,128)
with reshape-concat row stages."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from spsparse_tpu.utils.benchtime import bench_slope  # noqa: E402

L = 128


def run(name, kern, shapes, args, timeout_note=""):
    print(f"\n--- {name} ---", flush=True)
    try:
        f = pl.pallas_call(kern, out_shape=shapes)
        y = jax.block_until_ready(jax.jit(f)(*args))
        print("compiles+runs OK", flush=True)
        return f
    except Exception as e:
        print("FAIL:", type(e).__name__, str(e)[:200], flush=True)
        return None


def a_sublane_roll():
    def kern(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 3, 0)
    x = jnp.ones((64, L), jnp.float32)
    run("a: sublane roll (64,128)", kern,
        jax.ShapeDtypeStruct((64, L), jnp.float32), (x,))


def b_lane_roll_chain():
    def kern(x_ref, o_ref):
        y = x_ref[...]
        for d in (1, 2, 4, 8, 16, 32, 64):
            y = jnp.where(y > 0, pltpu.roll(y, L - d, 1),
                          pltpu.roll(y, d, 1))
        o_ref[...] = y
    x = jnp.ones((64, L), jnp.float32)
    run("b: lane roll chain (7 masked stages)", kern,
        jax.ShapeDtypeStruct((64, L), jnp.float32), (x,))


def c_reshape_concat_swap():
    R = 64

    def kern(x_ref, o_ref):
        y = x_ref[...]
        for rd in (1, 2, 4, 8, 16, 32):
            g = y.reshape(R // (2 * rd), 2, rd, L)
            sw = jnp.concatenate([g[:, 1:2], g[:, 0:1]], axis=1)
            y = y + sw.reshape(R, L)
        o_ref[...] = y
    x = jnp.ones((R, L), jnp.float32)
    run("c: reshape+concat row swaps (6 dists)", kern,
        jax.ShapeDtypeStruct((R, L), jnp.float32), (x,))


def _bitonic_kernel(R, use_gather=False):
    N = R * L
    stages = []
    span = 2
    while span <= N:
        d = span // 2
        while d >= 1:
            stages.append((d, span))
            d //= 2
        span *= 2

    def kern(e_ref, k_ref, v_ref, ok_ref, ov_ref):
        e = e_ref[...]
        lane = e % jnp.int32(L)
        row = e // jnp.int32(L)
        k, v = k_ref[...], v_ref[...]
        for d, span in stages:
            up = (e & (span if span < N else 2 * N)) == 0
            if d < L:
                mask_lo = (lane & d) == 0
                if use_gather:
                    gi = lane ^ d
                    pk = jnp.take_along_axis(k, gi, axis=1)
                    pv = jnp.take_along_axis(v, gi, axis=1)
                else:
                    pk = jnp.where(mask_lo, pltpu.roll(k, L - d, 1),
                                   pltpu.roll(k, d, 1))
                    pv = jnp.where(mask_lo, pltpu.roll(v, L - d, 1),
                                   pltpu.roll(v, d, 1))
            else:
                rd = d // L
                mask_lo = (row & rd) == 0

                def rswap(x, rd=rd):
                    g = x.reshape(R // (2 * rd), 2, rd, L)
                    sw = jnp.concatenate([g[:, 1:2], g[:, 0:1]], axis=1)
                    return sw.reshape(R, L)
                pk, pv = rswap(k), rswap(v)
            keep = jnp.where(mask_lo, (k <= pk) == up, (pk <= k) == up)
            k = jnp.where(keep, k, pk)
            v = jnp.where(keep, v, pv)
        ok_ref[...] = k
        ov_ref[...] = v
    return kern, len(stages)


def bitonic(R, use_gather=False):
    N = R * L
    tag = "gather" if use_gather else "roll"
    kern, nstages = _bitonic_kernel(R, use_gather)
    rng = np.random.default_rng(0)
    k0 = jnp.asarray(rng.integers(0, 1 << 30, (R, L), dtype=np.int32))
    v0 = jnp.asarray(rng.uniform(-1, 1, (R, L)).astype(np.float32))
    eidx = jnp.asarray(np.arange(N, dtype=np.int32).reshape(R, L))
    print(f"\n--- bitonic {tag} R={R} ({N} elems, {nstages} stages) ---",
          flush=True)
    try:
        f0 = pl.pallas_call(kern, out_shape=(
            jax.ShapeDtypeStruct((R, L), jnp.int32),
            jax.ShapeDtypeStruct((R, L), jnp.float32)))
        t0 = time.time()
        ks, vs = jax.jit(lambda a, b: f0(eidx, a, b))(k0, v0)
        ks_h = np.asarray(ks).reshape(-1)
        print(f"compile+run {time.time()-t0:.0f}s  sorted="
              f"{bool((np.diff(ks_h) >= 0).all())} perm="
              f"{np.array_equal(np.sort(np.asarray(k0).ravel()), ks_h)}",
              flush=True)
        t = bench_slope(jax.jit(lambda kk: f0(eidx, kk, v0)[0]), k0,
                        iters=8, reps=2)
        print(f"{t*1e6:.0f} us ({N/t/1e6:.0f} Melem/s; "
              f"{t/nstages*1e6:.2f} us/stage)", flush=True)
    except Exception as e:
        print("FAIL:", type(e).__name__, str(e)[:300], flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    a_sublane_roll()
    b_lane_roll_chain()
    c_reshape_concat_swap()
    bitonic(8)
    bitonic(64)
    print(f"\ntotal {time.time()-t0:.0f}s", flush=True)
