"""Round-5 primitive-rate probes (TPU, non-x64 process).

Establishes the hardware floors that decide the round-5 kernel designs:

1. MXU floor: back-to-back 128x128x128 bf16 matmuls on VMEM-resident
   tiles (no DMA) — the compute bound for the window SpGEMM (config 4).
2. Per-entry dynamic VMEM row read-modify-write rate — the scatter
   floor for any Y-resident scattered-SpMM kernel (config 3b).
3. In-kernel lane take_along_axis rate on (128,128) blocks — the
   gather floor for the transposed-X formulation (config 3b).
4. XLA row-take from HBM: random vs column-sorted indices — does
   monotonicity help the XLA gather at all? (config 3b baseline).

Run: timeout 1800 python probes/probe_r5_prims.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spsparse_tpu.utils.compilecache import enable_persistent_cache

enable_persistent_cache()

T = 128


def wide_slope(step, init, fetch, u_lo=8, u_hi=40, reps=5):
    def chain(state, n):
        for _ in range(n):
            state = step(state)
        return state

    f_lo = jax.jit(lambda s: chain(s, u_lo))
    f_hi = jax.jit(lambda s: chain(s, u_hi))
    for f in (f_lo, f_hi):
        fetch(f(init))
    los, his = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); fetch(f_lo(init)); los.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fetch(f_hi(init)); his.append(time.perf_counter() - t0)
    return float(np.median(his) - np.median(los)) / (u_hi - u_lo)


# ---------------------------------------------------------------- 1. MXU floor
def mxu_floor(dtype=jnp.bfloat16):
    # time(M=8192) - time(M=1024) with an in-kernel fori_loop: the arm
    # contrast (~7k matmuls, hundreds of us) towers over tunnel noise.
    # Accumulation keeps every matmul live (and mirrors what the real
    # SpGEMM kernels do per pair).
    def make(M):
        def kern(a_ref, b_ref, o_ref):
            def body(i, acc):
                return acc + jax.lax.dot_general(
                    a_ref[i % 8], b_ref[i % 8],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            o_ref[...] = jax.lax.fori_loop(
                0, M, body, jnp.zeros((T, T), jnp.float32))

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((T, T), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, b)
        return run

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, (8, T, T)).astype(np.float32)).astype(dtype)
    b = jnp.asarray(rng.uniform(-1, 1, (8, T, T)).astype(np.float32)).astype(dtype)
    M_LO, M_HI = 1024, 8192
    f_lo, f_hi = make(M_LO), make(M_HI)
    for f in (f_lo, f_hi):
        jax.block_until_ready(f(a, b))
    los, his = [], []
    for _ in range(9):
        t0 = time.perf_counter(); float(jnp.sum(f_lo(a, b))); los.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(jnp.sum(f_hi(a, b))); his.append(time.perf_counter() - t0)
    per_mm = (float(np.median(his) - np.median(los))) / (M_HI - M_LO)
    print(f"1. MXU floor ({np.dtype(dtype).name}): {per_mm*1e9:.1f} ns per "
          f"128^3 matmul ({2.097e6/max(per_mm,1e-12)/1e12:.1f} TMAC/s "
          f"effective)")
    return per_mm


# ------------------------------------- 2. dynamic VMEM row RMW (scatter floor)
def scatter_floor(rows=4096, E=8192):
    def kern(idx_ref, p_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)

        def body(e, _):
            r = idx_ref[e]
            o_ref[pl.ds(r, 1), :] += p_ref[pl.ds(e % 128, 1), :]
            return 0

        jax.lax.fori_loop(0, E, body, 0)

    @jax.jit
    def run(idx, p):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((rows, T), jnp.float32),
        )(idx, p)

    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, rows, E).astype(np.int32))
    p = jnp.asarray(rng.uniform(-1, 1, (T, T)).astype(np.float32))

    def step(st):
        p_, _ = st
        o = run(idx, p_)
        return (p_.at[0, 0].add(o[0, 0] * 1e-30), st[1])

    t = wide_slope(step, (p, jnp.zeros(())), lambda st: float(jnp.sum(st[0])))
    print(f"2. dynamic VMEM row RMW: {t/E*1e9:.1f} ns/row "
          f"({E} rows into ({rows},128) f32)")
    return t / E


# ---------------------------------- 3. in-kernel lane gather (take_along_axis)
def lane_gather_rate(B=64):
    # B blocks: gather 128 lanes from a (128,128) block by per-block index
    def kern(idx_ref, x_ref, o_ref):
        for b in range(B):
            idx = jnp.broadcast_to(idx_ref[b][None, :], (T, T))
            o_ref[b] = jnp.take_along_axis(x_ref[b], idx, axis=1)

    @jax.jit
    def run(idx, x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, T, T), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, x)

    rng = np.random.default_rng(2)
    idx = jnp.asarray(rng.integers(0, T, (B, T)).astype(np.int32))
    x = jnp.asarray(rng.uniform(-1, 1, (B, T, T)).astype(np.float32))

    def step(st):
        x_, _ = st
        o = run(idx, x_)
        return (x_.at[0, 0, 0].add(o[0, 0, 0] * 1e-30), st[1])

    t = wide_slope(step, (x, jnp.zeros(())), lambda st: float(jnp.sum(st[0])))
    per_block = t / B
    print(f"3. lane take_along_axis: {per_block*1e9:.1f} ns per (128,128) "
          f"block gather ({B*T*T/t/1e9:.1f} Gelem/s)")
    return per_block


# --------------------------------------------- 4. XLA take: sorted vs unsorted
def xla_take(nrows=1 << 17, E=1 << 17, N=128):
    rng = np.random.default_rng(3)
    Xf = rng.uniform(-1, 1, (nrows, N)).astype(np.float32)
    rnd = rng.integers(0, nrows, E).astype(np.int32)
    srt = np.sort(rnd).astype(np.int32)

    for dt in (jnp.float32, jnp.bfloat16):
        X = jnp.asarray(Xf).astype(dt)
        for name, idx in [("random", rnd), ("sorted", srt)]:
            idxj = jnp.asarray(idx)

            @jax.jit
            def run(Xv):
                return jnp.take(Xv, idxj, axis=0)

            def step(Xv):
                o = run(Xv)
                # consume the WHOLE gathered block — consuming one
                # element lets XLA slice the gather away (first version
                # of this probe measured exactly that)
                return Xv.at[0, 0].add(
                    (jnp.sum(o.astype(jnp.float32)) * 1e-30).astype(dt))

            t = wide_slope(step, X, lambda Xv: float(Xv[0, 0]), u_lo=2,
                           u_hi=10, reps=5)
            es = np.dtype(dt).itemsize
            print(f"4. XLA take {np.dtype(dt).name} {name}: {t*1e3:.3f} ms"
                  f" for {E} rows ({t/E*1e9:.2f} ns/row, "
                  f"{E*N*es/t/1e9:.0f} GB/s)")


if __name__ == "__main__":
    import sys
    print("devices:", jax.devices())
    which = sys.argv[1:] or ["mxu", "scatter", "gather", "take"]
    if "mxu" in which:
        mxu_floor(jnp.bfloat16)
        mxu_floor(jnp.float32)
    if "scatter" in which:
        scatter_floor()
    if "gather" in which:
        lane_gather_rate()
    if "take" in which:
        xla_take()
