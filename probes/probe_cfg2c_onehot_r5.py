"""Round 5 (VERDICT r4 item 5): MEASURE the one-hot MXU exchange for
unstructured SpMV instead of estimating it.

Context: config 2c (1M x 1M, 10 nnz/row uniform) ships via the static
shuffle (sort) at 49.5 ms / 0.212 Gnnz/s. PERFORMANCE.md round-4 argued
a one-hot MXU exchange is slower, but its own arithmetic ("128 VPU ops +
16K MAC-slots per entry ~= 2.6+2.2 ms per 10M") implies ~5 ms/10M — 10x
FASTER than the shipped sort path. VERDICT r4 demanded the measurement.

What the exchange must do: gathered values g arrive in column-block
order (1024-entry groups); each value must reach its destination
(row-block, slot). With a uniform-random pattern the (dst-group,
src-group) pair occupancy is ~1 entry, so per ENTRY the exchange pays a
full 128x128 one-hot construction + a matvec (or a dynamic row read) —
the "per-entry VPU/MXU slots" of the estimate cannot batch to full
utilization. Two implementations measured:

  A. pair-loop: per (d,s) pair build OH from (out_row, src_pos) via two
     iota compares, matvec into the dst accumulator.
  B. dst-batched gather: per dst group, dynamic-read the ~128 source
     group rows it needs, then one lane take_along_axis.

E is capped at 2^15: the pair tables ride scalar-prefetch (SMEM) and
four 2^17 i32 tables overflowed the 1 MB SMEM (measured HTTP-500).
Per-entry costs extrapolate linearly (every entry is independent work).

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 1800 python probes/probe_cfg2c_onehot_r5.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spsparse_tpu.utils.compilecache import enable_persistent_cache

enable_persistent_cache()

T = 128


def wide_slope(step, init, fetch, u_lo=4, u_hi=20, reps=5):
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


def make_problem(E=1 << 17, seed=0):
    """E values in src-group order + a random destination permutation."""
    rng = np.random.default_rng(seed)
    ngrp = E // T
    g = rng.uniform(-1, 1, (ngrp, T)).astype(np.float32)
    perm = rng.permutation(E)          # dst position of each src element
    # pair list: for each element, (dst_group, src_group, out_row, src_pos)
    src_grp = np.arange(E) // T
    src_pos = np.arange(E) % T
    dst_grp = perm // T
    out_row = perm % T
    order = np.argsort(dst_grp, kind="stable")   # process per dst group
    return (jnp.asarray(g), dst_grp[order].astype(np.int32),
            src_grp[order].astype(np.int32),
            out_row[order].astype(np.int32),
            src_pos[order].astype(np.int32), ngrp)


def variant_a_pairloop(E=1 << 15):
    g, dg, sg, orow, spos, ngrp = make_problem(E)
    NP = E                            # ~1 entry per pair: npairs ~= E

    def kern(dg_ref, sg_ref, or_ref, sp_ref, g_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)
        io = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        ii = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)

        def body(p, _):
            oh = jnp.logical_and(io == or_ref[p],
                                 ii == sp_ref[p]).astype(jnp.float32)
            contrib = jax.lax.dot_general(
                oh, g_ref[sg_ref[p]],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[pl.ds(dg_ref[p], 1), :] += contrib[None, :]
            return 0

        jax.lax.fori_loop(0, NP, body, 0)

    @jax.jit
    def run(dg, sg, orow, spos, g):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((ngrp, T), jnp.float32),
        )(dg, sg, orow, spos, g)

    # correctness first
    out = np.asarray(jax.block_until_ready(run(dg, sg, orow, spos, g)))
    want = np.zeros(E, np.float32)
    gh = np.asarray(g).reshape(-1)
    dstpos = np.asarray(dg) * T + np.asarray(orow)
    srcpos = np.asarray(sg) * T + np.asarray(spos)
    want[dstpos] = gh[srcpos]
    np.testing.assert_allclose(out.reshape(-1), want, rtol=1e-6)

    def step(st):
        gv, _ = st
        o = run(dg, sg, orow, spos, gv)
        return (gv.at[0, 0].add(o[0, 0] * 1e-30), st[1])

    t = wide_slope(step, (g, jnp.zeros(())),
                   lambda st: float(jnp.sum(st[0])), u_lo=1, u_hi=3,
                   reps=5)
    print(f"A. pair-loop one-hot exchange: {t*1e3:.2f} ms for {E} "
          f"entries = {t/E*1e9:.1f} ns/entry "
          f"-> {t/E*10e6*1e3:.0f} ms per 10M entries")
    return t / E


def variant_b_dst_gather(E=1 << 15):
    g, dg, sg, orow, spos, ngrp = make_problem(E)
    # per dst group: the source (group, pos) for each of its T slots
    src_of = np.zeros((ngrp, T), np.int32)     # source group per slot
    pos_of = np.zeros((ngrp, T), np.int32)     # source pos per slot
    src_of[np.asarray(dg), np.asarray(orow)] = np.asarray(sg)
    pos_of[np.asarray(dg), np.asarray(orow)] = np.asarray(spos)
    src_of = jnp.asarray(src_of)
    pos_of = jnp.asarray(pos_of)

    def kern(src_ref, pos_vmem, g_ref, o_ref, rows):
        # src stays scalar-prefetch (SMEM scalar reads); pos is a VMEM
        # input (vector loads from SMEM are not supported — measured)
        def body(d, _):
            def inner(j, _):
                rows[pl.ds(j, 1), :] = g_ref[pl.ds(src_ref[d * T + j], 1), :]
                return 0
            jax.lax.fori_loop(0, T, inner, 0)
            idx = pos_vmem[pl.ds(d, 1), :][0]
            # out[j] = rows[j, idx[j]] — per-row lane gather (Mosaic's
            # gather lowering needs FULL-shape indices)
            idx_full = jnp.broadcast_to(idx[:, None], (T, T))
            gathered = jnp.take_along_axis(rows[...], idx_full,
                                           axis=1)[:, 0]
            o_ref[pl.ds(d, 1), :] = gathered[None, :]
            return 0

        jax.lax.fori_loop(0, ngrp, body, 0)

    @jax.jit
    def run(src, pos, g):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((T, T), jnp.float32)]),
            out_shape=jax.ShapeDtypeStruct((ngrp, T), jnp.float32),
        )(src.reshape(-1), pos, g)

    out = np.asarray(jax.block_until_ready(run(src_of, pos_of, g)))
    want = np.zeros(E, np.float32)
    gh = np.asarray(g).reshape(-1)
    dstpos = np.asarray(dg) * T + np.asarray(orow)
    srcpos = np.asarray(sg) * T + np.asarray(spos)
    want[dstpos] = gh[srcpos]
    # diagonal gather: every slot was filled (perm is a bijection)
    np.testing.assert_allclose(out.reshape(-1), want, rtol=1e-6)

    def step(st):
        gv, _ = st
        o = run(src_of, pos_of, gv)
        return (gv.at[0, 0].add(o[0, 0] * 1e-30), st[1])
    # (src stays the scalar-prefetch operand; pos rides VMEM)

    t = wide_slope(step, (g, jnp.zeros(())),
                   lambda st: float(jnp.sum(st[0])), u_lo=1, u_hi=3,
                   reps=5)
    print(f"B. dst-batched row-read + lane gather: {t*1e3:.2f} ms for "
          f"{E} entries = {t/E*1e9:.1f} ns/entry "
          f"-> {t/E*10e6*1e3:.0f} ms per 10M entries")
    return t / E


if __name__ == "__main__":
    print("devices:", jax.devices())
    print("shipped static-shuffle baseline: 49.5 ms / 10M entries "
          "(4.95 ns/entry, bench_detail config 2c)")
    variant_a_pairloop()
    variant_b_dst_gather()
