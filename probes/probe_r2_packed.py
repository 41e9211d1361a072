"""TPU probe: pack_columns effect on the tiled kernels (run on real chip).

Measures the scattered-column SpMM (bench config 3b family) with and
without column packing, on whichever kernel prepare_general picks, plus
forced one-hot vs dense-block comparisons. Slope-timed (bench_slope);
detach with:  setsid nohup python probes/probe_r2_packed.py > /tmp/probe_packed.log 2>&1 &
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def section(name):
    def deco(fn):
        def wrapped(*a, **k):
            print(f"== {name}", flush=True)
            try:
                fn(*a, **k)
            except Exception as e:  # noqa: BLE001
                print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)
        return wrapped
    return deco


def scattered(rng, m, K, width):
    from spsparse_tpu import CooBuilder
    ncols = width * m
    rr = np.repeat(np.arange(m), K)
    cc = rng.integers(0, ncols, rr.size)
    b = CooBuilder((m, ncols), dtype=np.float32)
    b.add_many(np.stack([rr, cc], 1),
               rng.uniform(-1, 1, rr.size).astype(np.float32))
    return b.build()


@section("packed_vs_raw")
def packed_vs_raw(m, K, width, N=128):
    from spsparse_tpu.core.tiled import to_tiled, TILE
    from spsparse_tpu.ops import prepare_general
    from spsparse_tpu.ops.general import spmm_general
    from spsparse_tpu.ops.pallas_tiled import PreparedTiledDense
    from spsparse_tpu.utils.benchtime import bench_slope
    from spsparse_tpu.utils.roofline import device_hbm_bandwidth

    rng = np.random.default_rng(0)
    A = scattered(rng, m, K, width)
    nnz = m * K
    kind, bw = device_hbm_bandwidth()
    for pack in (False, True):
        pg = prepare_general(A, pack=pack)
        X = jnp.asarray(rng.uniform(-1, 1, (A.shape[1], N))
                        .astype(np.float32))

        def step(state):
            p, Xc = state
            Y = spmm_general(p, Xc)
            return (p, Xc.at[0, 0].add(Y[0, 0] * jnp.float32(1e-38)))

        t = bench_slope(step, (pg, X), iters=8, reps=5, u_lo=2, u_hi=10)
        from spsparse_tpu.ops.general import PreparedGather
        if isinstance(pg.prep, PreparedGather):
            n_tiles = 0
            bytes_moved = nnz * (12 + N * 4) + -(-m // TILE) * TILE * N * 4
        else:
            n_tiles = int(np.sum(np.asarray(pg.prep.tcols) < pg.prep.nbc))
            if isinstance(pg.prep, PreparedTiledDense):
                a_bytes = n_tiles * TILE * TILE * 4
            else:
                a_bytes = n_tiles * pg.prep.tile_cap * 6
            bytes_moved = (a_bytes + n_tiles * TILE * N * 4
                           + -(-m // TILE) * TILE * N * 4)
        sol = bw / (bytes_moved / nnz)
        print(json.dumps({
            "pack": pack, "kernel": pg.kernel, "m": m, "K": K,
            "width": width, "n_tiles": n_tiles, "t": t,
            "nnz_per_s": nnz / t,
            "pct_of_roofline": 100.0 * (nnz / t) / sol}), flush=True)


@section("forced_kernels")
def forced_kernels(m, K, width, N=128):
    from spsparse_tpu.core.tiled import pack_columns, to_tiled
    from spsparse_tpu.ops.pallas_tiled import (prepare_tiled_dense,
                                               prepare_tiled_rows,
                                               spmm_tiled_dense_pallas,
                                               spmm_tiled_pallas)
    from spsparse_tpu.utils.benchtime import bench_slope

    rng = np.random.default_rng(0)
    A = scattered(rng, m, K, width)
    Ap, order = pack_columns(A)
    tl = to_tiled(Ap)
    X = jnp.asarray(rng.uniform(-1, 1, (A.shape[1], N)).astype(np.float32))
    Xp = X[order]
    for name, prep, fn in (
            ("one_hot", prepare_tiled_rows(tl), spmm_tiled_pallas),
            ("dense", prepare_tiled_dense(tl), spmm_tiled_dense_pallas)):
        def step(state, fn=fn):
            p, Xc = state
            Y = fn(p, Xc)
            return (p, Xc.at[0, 0].add(Y[0, 0] * jnp.float32(1e-38)))

        t = bench_slope(step, (prep, Xp), iters=8, reps=5, u_lo=2, u_hi=10)
        print(json.dumps({"forced": name, "t": t,
                          "nnz_per_s": m * K / t}), flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    packed_vs_raw(1 << 14, 8, 8)
    forced_kernels(1 << 14, 8, 8)
    packed_vs_raw(1 << 14, 32, 4)
