"""Probe: configs 3/4 pct_of_roofline vs problem size on the real TPU.

BASELINE config 3 specifies 5M rows; the bench currently uses 2^15. This
probe measures the same code paths at increasing sizes to find where the
throughput saturates (fixed dispatch overheads amortized away).
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def cfg3(m):
    from bench import _regrid_matrix
    from spsparse_tpu.core.tiled import to_tiled, TILE
    from spsparse_tpu.ops.pallas_tiled import (prepare_tiled_dense,
                                               spmm_tiled_dense_pallas)
    from spsparse_tpu.utils.benchtime import bench_slope
    from spsparse_tpu.utils.roofline import device_hbm_bandwidth

    rng = np.random.default_rng(0)
    K, N = 50, 128
    A = _regrid_matrix(m, K, rng)
    tl = to_tiled(A)
    X = jnp.asarray(rng.uniform(-1, 1, (A.shape[1], N)).astype(np.float32))
    prep = prepare_tiled_dense(tl)
    kernel = lambda Y: spmm_tiled_dense_pallas(prep, Y)  # noqa: E731

    def step(Xc):
        Y = kernel(Xc)
        return Xc.at[0, 0].add(Y[0, 0] * jnp.float32(1e-38))

    t = bench_slope(step, X, iters=8, reps=5, u_lo=2, u_hi=10)
    nnz = m * K
    n_tiles = int(tl.n_tiles)
    kind, bw = device_hbm_bandwidth()
    bytes_moved = (n_tiles * tl.tile_cap * 6
                   + n_tiles * TILE * N * 4
                   + -(-m // TILE) * TILE * N * 4)
    sol_nnz = bw / (bytes_moved / nnz)
    achieved = nnz / t
    print(json.dumps({"cfg": 3, "m": m, "nnz": nnz, "n_tiles": n_tiles,
                      "tile_cap": tl.tile_cap, "t": t,
                      "nnz_per_s": achieved,
                      "pct": 100.0 * achieved / sol_nnz}), flush=True)


def cfg4(n_dst):
    import dataclasses
    from spsparse_tpu import CooBuilder
    from spsparse_tpu.ops.spgemm import spgemm_aat, plan_spgemm_caps
    from spsparse_tpu.utils.benchtime import bench_slope
    from spsparse_tpu.utils.roofline import (device_hbm_bandwidth,
                                             spgemm_esc_stats)

    rng = np.random.default_rng(0)
    per = 4
    r = np.repeat(np.arange(n_dst), per)
    c = np.minimum(r * 2 + rng.integers(0, 3, r.size), n_dst * 2 - 1)
    b = CooBuilder((n_dst, n_dst * 2), dtype=np.float32)
    b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
    A = b.build()
    expand_cap, out_cap = plan_spgemm_caps(A, A, transpose_b=True)

    def step(a):
        res = spgemm_aat(a, cap=out_cap, expand_cap=expand_cap)
        eps = jnp.sum(res.vals) * jnp.float32(1e-38)
        return dataclasses.replace(a, vals=a.vals + eps)

    t = bench_slope(step, A, iters=8, reps=5, u_lo=2, u_hi=10)
    res = spgemm_aat(A, cap=out_cap, expand_cap=expand_cap)
    nnz_out = int(res.nnz)
    stats = spgemm_esc_stats(r.size, r.size, expand_cap, nnz_out)
    kind, bw = device_hbm_bandwidth()
    achieved = expand_cap / t
    sol = stats.sol_nnz_per_s(bw)
    print(json.dumps({"cfg": 4, "n_dst": n_dst, "nnz_a": r.size,
                      "expand_cap": expand_cap, "nnz_out": nnz_out, "t": t,
                      "prod_per_s": achieved,
                      "pct": 100.0 * achieved / sol}), flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    for m in (1 << 15, 1 << 17, 1 << 19, 1 << 21):
        t0 = time.time()
        cfg3(m)
        print(f"  cfg3 m={m} wall={time.time()-t0:.1f}s", flush=True)
    for n in (1 << 15, 1 << 18, 1 << 20, 1 << 22):
        t0 = time.time()
        cfg4(n)
        print(f"  cfg4 n={n} wall={time.time()-t0:.1f}s", flush=True)
