"""Round 2 sort probes, part B: bitonic CE throughput (roll vs gather
variants) and raw in-kernel lane-gather throughput."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from spsparse_tpu.utils.benchtime import bench_slope  # noqa: E402


def header(s):
    print(f"\n=== {s} ===", flush=True)


R, L = 512, 128
N = R * L
LANE = None  # filled in kernels


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


def make_bitonic_kernel(use_gather: bool):
    stages = _stages(N)

    def kern(lane_ref, k_ref, v_ref, ok_ref, ov_ref):
        lane = lane_ref[...]
        row = jax.lax.div(lane, jnp.int32(1 << 20))  # dummy init, replaced
        lane, row = lane % jnp.int32(L), lane // jnp.int32(L)
        eidx = row * L + lane
        k, v = k_ref[...], v_ref[...]
        for d, span in stages:
            up = (eidx & (span if span < N else 2 * N)) == 0
            if d < L:
                mask_lo = (lane & d) == 0
                if use_gather:
                    gi = lane ^ d
                    pk = jnp.take_along_axis(k, gi, axis=1)
                    pv = jnp.take_along_axis(v, gi, axis=1)
                else:
                    rl = pltpu.roll(k, L - d, 1)
                    rr = pltpu.roll(k, d, 1)
                    pk = jnp.where(mask_lo, rl, rr)
                    rl = pltpu.roll(v, L - d, 1)
                    rr = pltpu.roll(v, d, 1)
                    pv = jnp.where(mask_lo, rl, rr)
            else:
                rd = d // L
                mask_lo = (row & rd) == 0
                rl = pltpu.roll(k, R - rd, 0)
                rr = pltpu.roll(k, rd, 0)
                pk = jnp.where(mask_lo, rl, rr)
                rl = pltpu.roll(v, R - rd, 0)
                rr = pltpu.roll(v, rd, 0)
                pv = jnp.where(mask_lo, rl, rr)
            keep = jnp.where(mask_lo, (k <= pk) == up, (pk <= k) == up)
            k = jnp.where(keep, k, pk)
            v = jnp.where(keep, v, pv)
        ok_ref[...] = k
        ov_ref[...] = v

    return kern, len(stages)


def probe_bitonic(use_gather):
    name = "gather" if use_gather else "roll"
    header(f"C bitonic ({name} lane stages), {N} elems i32+f32")
    kern, nstages = make_bitonic_kernel(use_gather)
    rng = np.random.default_rng(0)
    k0 = jnp.asarray(rng.integers(0, 1 << 30, (R, L), dtype=np.int32))
    v0 = jnp.asarray(rng.uniform(-1, 1, (R, L)).astype(np.float32))
    try:
        eidx_in = (np.arange(N, dtype=np.int32)).reshape(R, L)
        eidx_in = jnp.asarray(eidx_in)
        f0 = pl.pallas_call(kern, out_shape=(
            jax.ShapeDtypeStruct((R, L), jnp.int32),
            jax.ShapeDtypeStruct((R, L), jnp.float32)))
        f = lambda a, b: f0(eidx_in, a, b)
        jf = jax.jit(f)
        ks, vs = jf(k0, v0)
        ks_h = np.asarray(ks).reshape(-1)
        ok = bool((np.diff(ks_h) >= 0).all())
        perm_ok = np.array_equal(np.sort(np.asarray(k0).ravel()), ks_h)
        # payload follows key?
        kv = dict(zip(np.asarray(k0).ravel().tolist(),
                      np.asarray(v0).ravel().tolist()))
        pay_ok = all(abs(kv[int(kk)] - float(vv)) < 1e-6
                     for kk, vv in zip(ks_h[:1000],
                                       np.asarray(vs).ravel()[:1000]))
        print(f"sorted={ok} perm={perm_ok} payload={pay_ok} "
              f"stages={nstages}", flush=True)
        t = bench_slope(jax.jit(lambda kk: f(kk, v0)[0]), k0, iters=8,
                        reps=2)
        print(f"{name}: {t*1e6:.0f} us for {N} "
              f"({N/t/1e6:.0f} Melem/s; {t/nstages*1e6:.2f} us/stage)",
              flush=True)
    except Exception as e:
        print(f"{name} FAIL:", type(e).__name__, str(e)[:400], flush=True)


def probe_gather_throughput():
    header("G raw lane-gather chain (16 gathers per call)")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (R, L)).astype(np.float32))

    def kern(e_ref, x_ref, o_ref):
        e = e_ref[...]
        lane, row = e % jnp.int32(L), e // jnp.int32(L)
        y = x_ref[...]
        for i in range(16):
            idx = (lane * 13 + row + i) % L
            y = jnp.take_along_axis(y, idx, axis=1) + 1.0
        o_ref[...] = y

    try:
        eidx_in = jnp.asarray(np.arange(N, dtype=np.int32).reshape(R, L))
        f0 = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32))
        t = bench_slope(jax.jit(lambda v: f0(eidx_in, v)), x, iters=16,
                        reps=2)
        per = t / 16
        print(f"16-gather chain: {t*1e6:.1f} us -> {per*1e6:.2f} us/gather "
              f"({N/per/1e6:.0f} Melem/s per gather op)", flush=True)
    except Exception as e:
        print("G FAIL:", type(e).__name__, str(e)[:300], flush=True)


def probe_roll_throughput():
    header("H raw roll chain (16 rolls per call)")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (R, L)).astype(np.float32))

    def kern(x_ref, o_ref):
        y = x_ref[...]
        for i in range(16):
            y = pltpu.roll(y, (i % 7) + 1, 1) + 1.0
        o_ref[...] = y

    try:
        f = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32))
        t = bench_slope(jax.jit(f), x, iters=16, reps=2)
        per = t / 16
        print(f"16-roll chain: {t*1e6:.1f} us -> {per*1e6:.2f} us/roll "
              f"({N/per/1e6:.0f} Melem/s per roll op)", flush=True)
    except Exception as e:
        print("H FAIL:", type(e).__name__, str(e)[:300], flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    probe_gather_throughput()
    probe_roll_throughput()
    probe_bitonic(use_gather=True)
    probe_bitonic(use_gather=False)
    print(f"\ntotal {time.time()-t0:.0f}s", flush=True)
