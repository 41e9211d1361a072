"""Probe (real TPU): tiled MXU SpGEMM (config 4), bf16 dense-block SpMM
(config 3), and segmented-scan consolidate cost.

Big operands ride through bench_slope's ``init`` (jit arguments);
closures become HLO constants and blow the axon tunnel's remote_compile
body limit (HTTP 413, probes/probe_cfg34_scale.py).
"""
import dataclasses
import json
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def section(name):
    def deco(fn):
        def run(*a, **k):
            t0 = time.time()
            try:
                fn(*a, **k)
            except Exception:
                print(f"FAIL {name}:", flush=True)
                traceback.print_exc()
            print(f"  [{name}] wall={time.time()-t0:.1f}s", flush=True)
        return run
    return deco


def _regrid(n_dst, rng):
    from spsparse_tpu import CooBuilder
    per = 4
    r = np.repeat(np.arange(n_dst), per)
    c = np.minimum(r * 2 + rng.integers(0, 3, r.size), n_dst * 2 - 1)
    b = CooBuilder((n_dst, n_dst * 2), dtype=np.float32)
    b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
    return b.build()


@section("cfg4_tiled")
def cfg4_tiled(n_dst, dtype_name):
    from spsparse_tpu.core.tiled import to_tiled, TILE
    from spsparse_tpu.ops.spgemm_tiled import (densify_tiled,
                                               plan_tiled_spgemm,
                                               _spgemm_tiled_pallas,
                                               tiled_blocks_to_coo,
                                               TiledBlocks)
    from spsparse_tpu.utils.benchtime import bench_slope
    from spsparse_tpu.utils.roofline import device_hbm_bandwidth

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    A = _regrid(n_dst, rng)
    ta = densify_tiled(to_tiled(A), dtype=dtype)
    plan = plan_tiled_spgemm(ta, ta, transpose_b=True)
    P, Tout = plan.n_pairs, plan.n_out_tiles
    pa, pb, oid = (jnp.asarray(plan.pa), jnp.asarray(plan.pb),
                   jnp.asarray(plan.oid))

    def step(blocks):
        out = _spgemm_tiled_pallas(blocks, blocks, pa, pb, oid,
                                   transpose_b=True, n_out=Tout,
                                   interpret=False)
        eps = (out[0, 0, 0] * jnp.float32(1e-30)).astype(blocks.dtype)
        return blocks.at[0, 0, 0].add(eps)

    t = bench_slope(step, ta.blocks, iters=8, reps=5, u_lo=2, u_hi=10)
    esize = jnp.dtype(dtype).itemsize
    bytes_moved = P * 2 * TILE * TILE * esize + Tout * TILE * TILE * 4
    kind, bw = device_hbm_bandwidth()
    t_sol = bytes_moved / bw
    print(json.dumps({
        "cfg": "4-tiled", "n_dst": n_dst, "dtype": dtype_name,
        "nnz_a": int(A.nnz), "P_pairs": P, "T_out": Tout, "t": t,
        "bytes_moved": bytes_moved, "gb_s": bytes_moved / t / 1e9,
        "pct_of_roofline": 100.0 * t_sol / t}), flush=True)

    # extraction cost (jit, static cap)
    out = _spgemm_tiled_pallas(ta.blocks, ta.blocks, pa, pb, oid,
                               transpose_b=True, n_out=Tout,
                               interpret=False)
    tb = TiledBlocks(tile_row=jnp.asarray(plan.out_tile_row),
                     tile_col=jnp.asarray(plan.out_tile_col),
                     blocks=out, shape=plan.out_shape)
    nnz_out = int(jnp.sum(out != 0))
    cap = 1 << int(np.ceil(np.log2(max(nnz_out, 1))))

    def step_ex(blocks):
        tb2 = dataclasses.replace(tb, blocks=blocks)
        coo = tiled_blocks_to_coo(tb2, cap=cap)
        eps = (coo.vals[0] * jnp.float32(1e-30)).astype(blocks.dtype)
        return blocks.at[0, 0, 0].add(eps)

    t_ex = bench_slope(step_ex, out, iters=8, reps=3, u_lo=2, u_hi=6)
    print(json.dumps({"cfg": "4-tiled-extract", "n_dst": n_dst,
                      "nnz_out": nnz_out, "cap": cap, "t": t_ex}),
          flush=True)


@section("cfg3_bf16")
def cfg3_bf16(m, dtype_name):
    from spsparse_tpu.core.tiled import to_tiled, TILE
    from spsparse_tpu.ops.pallas_tiled import (prepare_tiled_dense,
                                               spmm_tiled_dense_pallas)
    from spsparse_tpu.utils.benchtime import bench_slope
    from spsparse_tpu.utils.roofline import device_hbm_bandwidth
    from bench import _regrid_matrix

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    K, N = 50, 128
    A = _regrid_matrix(m, K, rng)
    tl = to_tiled(A)
    prep = prepare_tiled_dense(tl, dtype=dtype)
    X = jnp.asarray(rng.uniform(-1, 1, (A.shape[1], N)).astype(np.float32))

    def step(state):
        p, Xc = state
        Y = spmm_tiled_dense_pallas(p, Xc)
        return (p, Xc.at[0, 0].add(Y[0, 0] * jnp.float32(1e-38)))

    t = bench_slope(step, (prep, X), iters=8, reps=5, u_lo=2, u_hi=10)
    nnz = int(A.nnz)
    n_tiles = int(tl.n_tiles)
    esize = jnp.dtype(dtype).itemsize
    kind, bw = device_hbm_bandwidth()
    # ideal model: padded payload at 2+2+esize B/entry, X tile per
    # occupied tile at esize, Y once at f32
    bytes_model = (n_tiles * tl.tile_cap * (2 + 2 + esize)
                   + n_tiles * TILE * N * esize
                   + -(-m // TILE) * TILE * N * 4)
    # actual traffic: dense blocks
    bytes_actual = (n_tiles * TILE * TILE * esize
                    + n_tiles * TILE * N * esize
                    + -(-m // TILE) * TILE * N * 4)
    sol_nnz = bw / (bytes_model / nnz)
    achieved = nnz / t
    print(json.dumps({
        "cfg": "3", "m": m, "dtype": dtype_name, "nnz": nnz,
        "n_tiles": n_tiles, "tile_cap": tl.tile_cap, "t": t,
        "nnz_per_s": achieved, "actual_gb_s": bytes_actual / t / 1e9,
        "pct_of_roofline": 100.0 * achieved / sol_nnz}), flush=True)


@section("cfg2b_mrhs_v2")
def cfg2b_mrhs_v2():
    from bench import build_banded_dia
    from spsparse_tpu.ops.pallas_dia import prepare_dia
    from spsparse_tpu.ops.pallas_dia_mrhs import spmm_dia_mrhs_pallas
    from spsparse_tpu.utils.benchtime import bench_slope
    from spsparse_tpu.utils.roofline import device_hbm_bandwidth

    rng = np.random.default_rng(0)
    n = 1 << 20
    dia, nnz = build_banded_dia(n, 5)
    prep = prepare_dia(dia)
    X = jnp.asarray(rng.uniform(-1, 1, (8, n)).astype(np.float32))

    def step(state):
        p, Xc = state
        Y = spmm_dia_mrhs_pallas(p, Xc)
        return (p, Xc.at[0, 0].add(Y[0, 0] * jnp.float32(1e-38)))

    t = bench_slope(step, (prep, X), iters=8, reps=5, u_lo=2, u_hi=10)
    kind, bw = device_hbm_bandwidth()
    bytes_model = nnz * 4 + 8 * 2 * n * 4
    agg = 8 * nnz / t
    sol = bw / (bytes_model / (8 * nnz))
    print(json.dumps({"cfg": "2b-v2", "nnz": nnz, "t": t,
                      "agg_nnz_s": agg,
                      "pct_of_roofline": 100.0 * agg / sol}), flush=True)


@section("consolidate8M")
def consolidate8M(n):
    from spsparse_tpu import CooBuilder
    from spsparse_tpu.core.consolidate import consolidate
    from spsparse_tpu.utils.benchtime import bench_slope

    rng = np.random.default_rng(0)
    side = 1 << 15
    idx = np.stack([rng.integers(0, side, n), rng.integers(0, side, n)], 1)
    b = CooBuilder((side, side), dtype=np.float32)
    b.add_many(idx, rng.uniform(-1, 1, n).astype(np.float32))
    A = b.build()

    def step(a):
        out = consolidate(a, (0, 1), cap=a.cap)
        eps = out.vals[0] * jnp.float32(1e-30)
        return dataclasses.replace(a, vals=a.vals.at[0].add(eps))

    t = bench_slope(step, A, iters=4, reps=3, u_lo=1, u_hi=3)
    print(json.dumps({"cfg": "consolidate", "n": n, "t": t,
                      "melem_s": n / t / 1e6}), flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    cfg3_bf16(1 << 15, "bf16")
    cfg4_tiled(1 << 15, "f32")
    cfg2b_mrhs_v2()
    cfg4_tiled(1 << 15, "bf16")
    consolidate8M(1 << 23)
    cfg4_tiled(1 << 17, "bf16")
    cfg3_bf16(1 << 17, "bf16")
