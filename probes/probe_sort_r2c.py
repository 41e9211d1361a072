"""Round 2 sort probes, part C: find a bitonic block-sort formulation that
Mosaic will compile. Variants: block size 8K vs 64K; lane stages via roll
vs gather; row stages via sublane-roll vs reshape+rev."""
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


def _stages(n):
    out = []
    span = 2
    while span <= n:
        d = span // 2
        while d >= 1:
            out.append((d, span))
            d //= 2
        span *= 2
    return out


def make_kernel(R, lane_mode, row_mode):
    N = R * L
    stages = _stages(N)

    def kern(e_ref, k_ref, v_ref, ok_ref, ov_ref):
        e = e_ref[...]
        lane = e % jnp.int32(L)
        row = e // jnp.int32(L)
        k, v = k_ref[...], v_ref[...]
        for d, span in stages:
            up = (e & (span if span < N else 2 * N)) == 0
            if d < L:
                mask_lo = (lane & d) == 0
                if lane_mode == "gather":
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
                if row_mode == "rev":
                    def rswap(x):
                        xx = x.reshape(R // (2 * rd), 2, rd, L)
                        return jax.lax.rev(xx, (1,)).reshape(R, L)
                    pk, pv = rswap(k), rswap(v)
                else:
                    pk = jnp.where(mask_lo, pltpu.roll(k, R - rd, 0),
                                   pltpu.roll(k, rd, 0))
                    pv = jnp.where(mask_lo, pltpu.roll(v, R - rd, 0),
                                   pltpu.roll(v, rd, 0))
            keep = jnp.where(mask_lo, (k <= pk) == up, (pk <= k) == up)
            k = jnp.where(keep, k, pk)
            v = jnp.where(keep, v, pv)
        ok_ref[...] = k
        ov_ref[...] = v

    return kern, len(stages)


def try_variant(R, lane_mode, row_mode):
    N = R * L
    name = f"R={R} lane={lane_mode} row={row_mode}"
    print(f"\n--- {name} ({N} elems) ---", flush=True)
    kern, nstages = make_kernel(R, lane_mode, row_mode)
    rng = np.random.default_rng(0)
    k0 = jnp.asarray(rng.integers(0, 1 << 30, (R, L), dtype=np.int32))
    v0 = jnp.asarray(rng.uniform(-1, 1, (R, L)).astype(np.float32))
    eidx = jnp.asarray(np.arange(N, dtype=np.int32).reshape(R, L))
    try:
        f0 = pl.pallas_call(kern, out_shape=(
            jax.ShapeDtypeStruct((R, L), jnp.int32),
            jax.ShapeDtypeStruct((R, L), jnp.float32)))
        jf = jax.jit(lambda a, b: f0(eidx, a, b))
        ks, vs = jf(k0, v0)
        ks_h = np.asarray(ks).reshape(-1)
        ok = bool((np.diff(ks_h) >= 0).all())
        perm_ok = np.array_equal(np.sort(np.asarray(k0).ravel()), ks_h)
        print(f"sorted={ok} perm={perm_ok} stages={nstages}", flush=True)
        t = bench_slope(jax.jit(lambda kk: f0(eidx, kk, v0)[0]), k0,
                        iters=8, reps=2)
        print(f"{t*1e6:.0f} us ({N/t/1e6:.0f} Melem/s; "
              f"{t/nstages*1e6:.2f} us/stage)", flush=True)
        return True
    except Exception as ex:
        print("FAIL:", type(ex).__name__, str(ex)[:200], flush=True)
        return False


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    ok = try_variant(64, "roll", "rev")
    try_variant(64, "gather", "rev")
    if ok:
        try_variant(256, "roll", "rev")
        try_variant(512, "roll", "rev")
    else:
        try_variant(16, "roll", "rev")
        try_variant(64, "roll", "roll")
    print(f"\ntotal {time.time()-t0:.0f}s", flush=True)
