"""Round-4 unstructured-SpMV design probe (VERDICT item 2).

Design under test ("super-group MXU-exchange SpMV"): entries sorted by
(row-super-group, col-block); per super-group of 16K rows:

  1. gather x values with in-kernel lane-axis take_along_axis against
     x2d slabs (8 col-blocks resident per step, sublane = cb mod 8);
  2. exchange products from col-order to row-order THROUGH THE MXU:
     Y (128, 128) = (OneHotHi * p)^T @ OneHotLo, where hi/lo are the
     7+7 bit split of the row-within-group.

This probe times the two primitives in isolation on synthetic shapes to
validate the end-to-end cost estimate (expected: gather ~free at
~1 Telem/s; the reduction floor is one-hot construction ~256 VPU
ops/entry + 16K MAC-slots/entry => ~2-4 Gnnz/s end-to-end at 10 nnz/row,
1M rows). 10 Gnnz/s (the VERDICT aspiration) would need a scatter or
>128-window gather primitive Mosaic does not lower.
"""
import functools
import json

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spsparse_tpu.utils.benchtime import bench_slope


def gather_kernel(x_ref, idx_ref, out_ref):
    # operand (8,128) slabs; idx (8, E): out[s, e] = x[s, idx[s, e]]
    out_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=1)


@functools.partial(jax.jit, static_argnames=("S", "E"))
def run_gather(x, idx, *, S, E):
    # grid over S slabs; per step gather E values from an (8,128) slab
    return pl.pallas_call(
        gather_kernel,
        grid=(S,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda s: (s, 0, 0)),
                  pl.BlockSpec((1, 8, E), lambda s: (s, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, E), lambda s: (s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((S, 8, E), jnp.float32),
    )(x, idx)


def reduce_kernel(hi_ref, lo_ref, p_ref, y_ref):
    iot = jax.lax.broadcasted_iota(jnp.int32, hi_ref.shape[1:] + (128,), 2)
    oh_hi = (hi_ref[0][:, :, None] == iot).astype(jnp.bfloat16)
    oh_lo = (lo_ref[0][:, :, None] == iot).astype(jnp.bfloat16)
    cap8, E = hi_ref.shape[1:]
    a1 = (oh_hi * p_ref[0][:, :, None].astype(jnp.bfloat16)).reshape(
        cap8 * E, 128)
    a2 = oh_lo.reshape(cap8 * E, 128)
    y_ref[...] = jax.lax.dot_general(
        a1, a2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("G",))
def run_reduce(hi, lo, p, *, G):
    return pl.pallas_call(
        reduce_kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((1,) + hi.shape[1:], lambda g: (g, 0, 0)),
                  pl.BlockSpec((1,) + hi.shape[1:], lambda g: (g, 0, 0)),
                  pl.BlockSpec((1,) + hi.shape[1:], lambda g: (g, 0, 0))],
        out_specs=pl.BlockSpec((1, 128, 128), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, 128, 128), jnp.float32),
    )(hi, lo, p)


def main():
    rng = np.random.default_rng(0)
    out = {}

    # --- primitive 1: slab lane-gather throughput ---
    S, E = 512, 512                           # 512 slabs x 4096 gathers
    x = jnp.asarray(rng.uniform(-1, 1, (S, 8, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (S, 8, E)).astype(np.int32))
    g = run_gather(x, idx, S=S, E=E)          # compile + correctness
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=2)
    assert np.abs(np.asarray(g) - ref).max() == 0
    def step_g(st):
        xs, ids = st
        r = run_gather(xs, ids, S=S, E=E)
        return (xs.at[0, 0, 0].add(r[0, 0, 0] * jnp.float32(1e-30)), ids)

    t = bench_slope(step_g, (x, idx), iters=8, reps=5, u_lo=2, u_hi=10)
    n_el = S * 8 * E
    out["gather"] = {"elems": n_el, "time_s": t,
                     "gelem_per_s": n_el / t / 1e9}
    print("gather", json.dumps(out["gather"]), flush=True)

    # --- primitive 2: one-hot build + MXU exchange ---
    G, cap8, E2 = 64, 16, 128                 # 64 groups x 2048 entries
    hi = jnp.asarray(rng.integers(0, 128, (G, cap8, E2)).astype(np.int32))
    lo = jnp.asarray(rng.integers(0, 128, (G, cap8, E2)).astype(np.int32))
    p = jnp.asarray(rng.uniform(-1, 1, (G, cap8, E2)).astype(np.float32))
    y = run_reduce(hi, lo, p, G=G)
    # correctness vs numpy scatter
    Y0 = np.zeros((128, 128))
    h0, l0, p0 = (np.asarray(hi[0]).ravel(), np.asarray(lo[0]).ravel(),
                  np.asarray(p[0]).ravel())
    np.add.at(Y0, (h0, l0), p0.astype(np.float32))
    err = np.abs(np.asarray(y[0]) - Y0).max() / np.abs(Y0).max()
    t2 = bench_slope(lambda st: (st[0].at[0, 0, 0].add(
        run_reduce(st[0], st[1], st[2], G=G)[0, 0, 0].astype(jnp.int32)
        * 0), st[1], st[2]), (hi, lo, p), iters=8, reps=5, u_lo=2,
        u_hi=10)
    nent = G * cap8 * E2
    out["reduce"] = {"entries": nent, "time_s": t2, "rel_err_bf16": float(err),
                     "gentry_per_s": nent / t2 / 1e9,
                     "ns_per_entry": t2 / nent * 1e9}
    print("reduce", json.dumps(out["reduce"]), flush=True)
    est_1m = 10e6 * (t2 / nent) + 10e6 / (n_el / t)
    print(json.dumps({"est_10m_entries_ms": est_1m * 1e3 * 1.3,
                      "est_gnnz_per_s": 10e6 / (est_1m * 1.3) / 1e9}))


if __name__ == "__main__":
    main()
