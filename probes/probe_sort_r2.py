"""TPU probes for the round-2 sort kernel design (run on the real chip).

Questions:
  A. lax.sort cost vs operand count / key fusion (is the 10x headroom real?)
  B. does Mosaic lower in-VMEM vector gather (take_along_axis) / scatter?
  C. bitonic compare-exchange stage throughput (VPU) on (R,128) tiles
  D. one-hot permute-apply matmul throughput (MXU)

Each probe is independent; failures print and continue.
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from spsparse_tpu.utils.benchtime import bench_slope  # noqa: E402


def slope_time(step, x, iters=8, reps=3, **kw):
    return bench_slope(step, x, iters=iters, reps=reps, **kw)


def header(s):
    print(f"\n=== {s} ===", flush=True)


# ---------------------------------------------------------------- A: lax.sort
def probe_lax_sort():
    header("A lax.sort operand-count scaling")
    rng = np.random.default_rng(0)
    for n in (1 << 20, 1 << 23):
        key = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))
        pos = jnp.arange(n, dtype=jnp.int32)
        val = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))

        def s1(k):
            out, = jax.lax.sort((k,), num_keys=1, is_stable=False)
            return out + 1  # data dep

        def s2(k):
            out = jax.lax.sort((k, pos), num_keys=1, is_stable=True)
            return out[0] + out[1]

        def s4(k):
            out = jax.lax.sort((k, pos, pos, val), num_keys=2, is_stable=True)
            return out[0] + out[1]

        for name, f in (("key_only", s1), ("key+pos", s2),
                        ("2key+2payload", s4)):
            try:
                t = slope_time(jax.jit(f), key, iters=4, reps=2)
                print(f"n={n>>20}M {name}: {t*1e3:.2f} ms "
                      f"({n/t/1e6:.0f} Melem/s)", flush=True)
            except Exception as e:
                print(f"n={n>>20}M {name}: FAIL {type(e).__name__} {e}",
                      flush=True)


# ------------------------------------------------- B: in-kernel gather/scatter
def probe_vmem_gather():
    header("B1 in-kernel take_along_axis (lane gather within rows)")
    R, L = 256, 128

    def kern(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (R, L)),
                    jnp.float32)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, L, (R, L)),
                      jnp.int32)
    try:
        f = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32))
        y = jax.jit(lambda a, b: f(a, b))(x, idx)
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
        err = np.abs(np.asarray(y) - ref).max()
        print("lane-gather lowers; max err", err, flush=True)

        def chain(v):
            return f(v, idx)
        t = slope_time(jax.jit(chain), x, iters=16, reps=2)
        print(f"lane-gather: {t*1e6:.1f} us for {R*L} elems "
              f"({R*L/t/1e6:.0f} Melem/s)", flush=True)
    except Exception as e:
        print("lane-gather FAIL:", type(e).__name__, str(e)[:300], flush=True)

    header("B2 in-kernel flat gather jnp.take (arbitrary VMEM index)")

    def kern2(x_ref, i_ref, o_ref):
        flat = x_ref[...].reshape(-1)
        o_ref[...] = jnp.take(flat, i_ref[...]).reshape(o_ref.shape)

    idx2 = jnp.asarray(np.random.default_rng(2).integers(0, R * L, (R, L)),
                       jnp.int32)
    try:
        f2 = pl.pallas_call(
            kern2, out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32))
        y = jax.jit(lambda a, b: f2(a, b))(x, idx2)
        ref = np.asarray(x).reshape(-1)[np.asarray(idx2)]
        print("flat-gather lowers; max err",
              np.abs(np.asarray(y) - ref).max(), flush=True)
        t = slope_time(jax.jit(lambda v: f2(v, idx2)), x, iters=16, reps=2)
        print(f"flat-gather: {t*1e6:.1f} us ({R*L/t/1e6:.0f} Melem/s)",
              flush=True)
    except Exception as e:
        print("flat-gather FAIL:", type(e).__name__, str(e)[:300], flush=True)

    header("B3 in-kernel sublane gather (take_along_axis axis=0)")

    def kern3(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    idx3 = jnp.asarray(np.random.default_rng(3).integers(0, R, (R, L)),
                       jnp.int32)
    try:
        f3 = pl.pallas_call(
            kern3, out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32))
        y = jax.jit(lambda a, b: f3(a, b))(x, idx3)
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx3), axis=0)
        print("sublane-gather lowers; max err",
              np.abs(np.asarray(y) - ref).max(), flush=True)
        t = slope_time(jax.jit(lambda v: f3(v, idx3)), x, iters=16, reps=2)
        print(f"sublane-gather: {t*1e6:.1f} us ({R*L/t/1e6:.0f} Melem/s)",
              flush=True)
    except Exception as e:
        print("sublane-gather FAIL:", type(e).__name__, str(e)[:300],
              flush=True)

    header("B4 in-kernel VMEM scatter .at[].set")

    def kern4(x_ref, i_ref, o_ref):
        z = jnp.zeros_like(x_ref[...])
        o_ref[...] = z.at[i_ref[...], jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (R, L), 1), (R, L))].set(
                x_ref[...], mode="drop")

    try:
        f4 = pl.pallas_call(
            kern4, out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32))
        y = jax.jit(lambda a, b: f4(a, b))(x, idx3)
        print("vmem-scatter lowers; sum", float(jnp.sum(y)), flush=True)
    except Exception as e:
        print("vmem-scatter FAIL:", type(e).__name__, str(e)[:300], flush=True)


# ---------------------------------------------------------- C: bitonic stages
def probe_bitonic():
    header("C bitonic CE throughput, (R,128) i32 key + f32 payload")
    R, L = 512, 128  # 64K elements
    n = R * L
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    eidx = row * L + lane  # element index, row-major

    def ce_stage(k, v, d, span):
        """One compare-exchange stage: partner = e XOR d; ascending iff
        (e & span)==0 (standard bitonic)."""
        if d < L:
            mask_lo = (lane & d) == 0
            pk = jnp.where(mask_lo, pltpu.roll(k, -d, 1), pltpu.roll(k, d, 1))
            pv = jnp.where(mask_lo, pltpu.roll(v, -d, 1), pltpu.roll(v, d, 1))
        else:
            rd = d // L
            mask_lo = (row & rd) == 0
            pk = jnp.where(mask_lo, pltpu.roll(k, -rd, 0),
                           pltpu.roll(k, rd, 0))
            pv = jnp.where(mask_lo, pltpu.roll(v, -rd, 0),
                           pltpu.roll(v, rd, 0))
        up = (eidx & span) == 0
        keep = jnp.where(mask_lo, (k <= pk) == up, (pk <= k) == up)
        return (jnp.where(keep, k, pk), jnp.where(keep, v, pv))

    def full_sort_kernel(k_ref, v_ref, ok_ref, ov_ref):
        k, v = k_ref[...], v_ref[...]
        stages = []
        span = 2
        while span <= n:
            d = span // 2
            while d >= 1:
                stages.append((d, span))
                d //= 2
            span *= 2
        for d, span in stages:
            k, v = ce_stage(k, v, d, span if span < n else n * 2)
        ok_ref[...] = k
        ov_ref[...] = v

    rng = np.random.default_rng(0)
    k0 = jnp.asarray(rng.integers(0, 1 << 30, (R, L), dtype=np.int32))
    v0 = jnp.asarray(rng.uniform(-1, 1, (R, L)).astype(np.float32))
    nstages = sum(i + 1 for i in range(int(np.log2(n))))
    try:
        f = pl.pallas_call(full_sort_kernel, out_shape=(
            jax.ShapeDtypeStruct((R, L), jnp.int32),
            jax.ShapeDtypeStruct((R, L), jnp.float32)))
        jf = jax.jit(lambda a, b: f(a, b))
        ks, vs = jf(k0, v0)
        ks_h = np.asarray(ks).reshape(-1)
        ok = bool((np.diff(ks_h) >= 0).all())
        perm_ok = np.array_equal(np.sort(np.asarray(k0).ravel()), ks_h)
        print(f"bitonic {n} elems: sorted={ok} perm={perm_ok} "
              f"stages={nstages}", flush=True)

        def chain(kk):
            a, b = f(kk, v0)
            return a
        t = slope_time(jax.jit(chain), k0, iters=8, reps=2)
        print(f"bitonic sort {n}: {t*1e6:.0f} us  "
              f"({n/t/1e6:.1f} Melem/s; {t/nstages*1e6:.2f} us/stage; "
              f"{n*nstages/t/1e9:.1f} G CE/s)", flush=True)
    except Exception as e:
        print("bitonic FAIL:", type(e).__name__, str(e)[:500], flush=True)


# ------------------------------------------------------- D: one-hot permutes
def probe_onehot_mxu():
    header("D one-hot permute via MXU, 128-blocks")
    R, L = 512, 128

    def kern(x_ref, r_ref, o_ref):
        x = x_ref[...]
        rk = r_ref[...]
        iot = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        acc = jnp.zeros_like(x)
        # per 128-row group: P^T @ x rows (one-hot of rank)
        for g in range(R // L):
            xg = x[g * L:(g + 1) * L]
            rg = rk[g * L:(g + 1) * L]
            oh = (rg[:, 0][:, None] == iot[:128]).astype(jnp.float32)
            acc = acc.at[g * L:(g + 1) * L].set(jax.lax.dot_general(
                oh, xg, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))
        o_ref[...] = acc

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (R, L)).astype(np.float32))
    perm = np.stack([rng.permutation(L) for _ in range(R)]).astype(np.int32)
    try:
        f = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(
            (R, L), jnp.float32))
        y = jax.jit(lambda a, b: f(a, b))(x, jnp.asarray(perm[:, :1]))
        print("onehot-permute lowers", flush=True)
        t = slope_time(jax.jit(lambda v: f(v, jnp.asarray(perm[:, :1]))), x,
                       iters=16, reps=2)
        print(f"onehot permute {R*L}: {t*1e6:.1f} us "
              f"({R*L/t/1e6:.0f} Melem/s)", flush=True)
    except Exception as e:
        print("onehot FAIL:", type(e).__name__, str(e)[:300], flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    probe_lax_sort()
    probe_vmem_gather()
    probe_bitonic()
    probe_onehot_mxu()
    print(f"\ntotal {time.time()-t0:.0f}s", flush=True)
