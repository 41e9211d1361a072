"""Window-kernel measurement on the config-3 matrix (wide-arm method).
Per-tile kernel baseline (robust): 172.6 us = 47.4% of model.
X traffic drops from n_tiles*32KB (~33 MB) to nsuper*Ws*32KB."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu.core.tiled import to_tiled, TILE
from spsparse_tpu.ops.pallas_tiled_window import (prepare_tiled_window,
                                                  spmm_tiled_window_pallas)
from spsparse_tpu.utils.roofline import device_hbm_bandwidth
from probes.probe_cfg3_r4 import regrid


def main():
    import dataclasses
    rng = np.random.default_rng(0)
    m, K, N = 1 << 15, 50, 128
    A = regrid(m, K, rng)
    tl = to_tiled(A)
    nnz = m * K
    n_tiles = int(tl.n_tiles)
    kind, bw = device_hbm_bandwidth()
    X = jnp.asarray(rng.uniform(-1, 1, (A.shape[1], N))
                    .astype(np.float32))
    want = None

    model = (n_tiles * tl.tile_cap * 4 + n_tiles * TILE * N * 2
             + -(-m // TILE) * TILE * N * 4)

    for group in (8, 16, 32):
        prep = prepare_tiled_window(tl, group=group)
        nsuper = prep.wstart.shape[0]
        # correctness once (host scipy oracle on a row sample — the full
        # dense A would need 8.6 GB)
        Y = np.asarray(jax.block_until_ready(
            spmm_tiled_window_pallas(prep, X)))
        if want is None:
            import scipy.sparse as sp
            nnz_live = int(A.nnz)
            S = sp.coo_matrix(
                (np.asarray(A.vals[:nnz_live]),
                 (np.asarray(A.indices[:nnz_live, 0]),
                  np.asarray(A.indices[:nnz_live, 1]))),
                shape=A.shape).tocsr()
            sel = rng.integers(0, m, 256)
            want = (sel, S[sel] @ np.asarray(X, np.float64))
        rel = (np.abs(Y[want[0]] - want[1]).max()
               / np.abs(want[1]).max())

        def step(state):
            p, Xc = state
            Yv = spmm_tiled_window_pallas(p, Xc)
            eps = (Yv[0, 0] * jnp.float32(1e-30)).astype(p.blocks.dtype)
            return (dataclasses.replace(
                p, blocks=p.blocks.at[0, 0, 0, 0].add(eps)), Xc)

        def chain(state, n):
            for _ in range(n):
                state = step(state)
            return state

        u_lo, u_hi = 16, 144
        f_lo = jax.jit(lambda s: chain(s, u_lo))
        f_hi = jax.jit(lambda s: chain(s, u_hi))
        st = (prep, X)
        for f in (f_lo, f_hi):
            float(jnp.sum(f(st)[0].blocks.astype(jnp.float32)))
        los, his = [], []
        for _ in range(7):
            t0 = time.perf_counter()
            float(jnp.sum(f_lo(st)[0].blocks.astype(jnp.float32)))
            los.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(jnp.sum(f_hi(st)[0].blocks.astype(jnp.float32)))
            his.append(time.perf_counter() - t0)
        t = (np.median(his) - np.median(los)) / (u_hi - u_lo)
        actual = (prep.nbr * prep.tiles_per_row * TILE * TILE * 2
                  + nsuper * prep.ws * TILE * TILE * 2
                  + -(-m // TILE) * TILE * N * 4)
        print(json.dumps({
            "group": group, "ws": prep.ws, "nsuper": nsuper,
            "rel_err": float(rel), "time_us": t * 1e6,
            "nnz_per_s": nnz / t,
            "actual_mb": actual / 1e6,
            "actual_gb_s": actual / t / 1e9,
            "pct_of_model": 100.0 * (model / bw) / t,
        }), flush=True)


if __name__ == "__main__":
    main()
