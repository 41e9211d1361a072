"""Unrolled bitonic with the logical-keep fix: compile time + speed."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from spsparse_tpu.utils.benchtime import bench_slope  # noqa: E402

L = 128

def make_kernel(R, nblk):
    N = R * L
    stages = []
    span = 2
    while span <= N:
        d = span // 2
        while d >= 1:
            stages.append((d, span if span < N else 2 * N))
            d //= 2
        span *= 2

    def kern(dummy_ref, e_ref, k_ref, v_ref, ok_ref, ov_ref):
        e = e_ref[0]
        lane = e % jnp.int32(L)
        row = e // jnp.int32(L)
        k, v = k_ref[0], v_ref[0]
        for d, sm in stages:
            up = (e & sm) == 0
            if d < L:
                mask_lo = (lane & d) == 0
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
            le = k <= pk
            ge = pk <= k
            keep = (mask_lo & (le == up)) | (~mask_lo & (ge == up))
            k = jnp.where(keep, k, pk)
            v = jnp.where(keep, v, pv)
        ok_ref[0] = k
        ov_ref[0] = v
    return kern, len(stages)

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
for R, nblk in ((64, 1024), (256, 256), (512, 128)):
    N = R * L
    kern, nst = make_kernel(R, nblk)
    k0 = jnp.asarray(rng.integers(0, 1 << 30, (nblk, R, L)).astype(np.int32))
    v0 = jnp.asarray(rng.uniform(-1, 1, (nblk, R, L)).astype(np.float32))
    eidx = jnp.asarray(np.arange(N, dtype=np.int32).reshape(1, R, L))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nblk,),
        in_specs=[pl.BlockSpec((1, R, L), lambda b, *_: (0, 0, 0)),
                  pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0)),
                  pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0))],
        out_specs=(pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0)),
                   pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0))))
    dummy = jnp.zeros((1,), jnp.int32)
    try:
        f0 = pl.pallas_call(kern, grid_spec=gs, out_shape=(
            jax.ShapeDtypeStruct((nblk, R, L), jnp.int32),
            jax.ShapeDtypeStruct((nblk, R, L), jnp.float32)))
        t0 = time.time()
        ks, vs = jax.block_until_ready(jax.jit(
            lambda a, b: f0(dummy, eidx, a, b))(k0, v0))
        tc = time.time() - t0
        ks_h = np.asarray(ks)
        ok = (np.diff(ks_h[0].ravel()) >= 0).all()
        perm = np.array_equal(np.sort(np.asarray(k0)[0].ravel()),
                              ks_h[0].ravel())
        print(f"R={R} nblk={nblk}: compile {tc:.0f}s sorted={ok} perm={perm} "
              f"stages={nst}", flush=True)
        t = bench_slope(jax.jit(lambda kk: f0(dummy, eidx, kk, v0)[0]), k0,
                        iters=4, reps=2)
        ntot = nblk * N
        print(f"  {t*1e3:.2f} ms ({ntot/t/1e6:.0f} Melem/s)", flush=True)
    except Exception as e:
        print(f"R={R} FAIL: {type(e).__name__} {str(e)[:200]}", flush=True)
