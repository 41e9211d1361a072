"""Round-4 config-3 diagnosis: where do the bytes go?

Variants measured (slope method) on the config-3 matrix (32K rows,
50 nnz/row, column-local spread 128, N=128):

  a) round-3 bench step exactly: f32 X carried, astype(bf16)+pad inside
     every call (the conversion is a full extra pass over X);
  b) bf16 X carried across the loop (conversion pass eliminated —
     BASELINE's mixed mode: bf16 operands, f32 accumulation);
  c) f32 blocks + f32 X (reference point).

Prints per-variant time, implied GB/s on the *actual* traffic, and pct
of the config-3 pattern-aware model.
"""
import json

import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.tiled import to_tiled, TILE
from spsparse_tpu.ops.pallas_tiled import (prepare_tiled_dense,
                                           spmm_tiled_dense_pallas)
from spsparse_tpu.utils.benchtime import bench_slope
from spsparse_tpu.utils.roofline import device_hbm_bandwidth


def regrid(m, k, rng, spread=128):
    ncols = 2 * m
    rr = np.repeat(np.arange(m), k)
    cc = np.clip(rr * 2 + rng.integers(-spread, spread + 1, rr.size),
                 0, ncols - 1)
    b = CooBuilder((m, ncols), dtype=np.float32)
    b.add_many(np.stack([rr, cc], 1),
               rng.uniform(-1, 1, rr.size).astype(np.float32))
    return b.build()


def main():
    rng = np.random.default_rng(0)
    m, K, N = 1 << 15, 50, 128
    A = regrid(m, K, rng)
    tl = to_tiled(A)
    nnz = m * K
    n_tiles = int(tl.n_tiles)
    kind, bw = device_hbm_bandwidth()
    X32 = jnp.asarray(rng.uniform(-1, 1, (A.shape[1], N))
                      .astype(np.float32))

    results = {"n_tiles": n_tiles, "tile_cap": tl.tile_cap,
               "fill": nnz / n_tiles, "device": kind}

    def model_bytes(esize):
        return (n_tiles * tl.tile_cap * (2 + esize)
                + n_tiles * TILE * N * esize
                + -(-m // TILE) * TILE * N * 4)

    for name, dtype in (("a_f32X_bf16blocks", jnp.bfloat16),
                        ("b_bf16X_bf16blocks", jnp.bfloat16),
                        ("c_f32X_f32blocks", jnp.float32)):
        prep = prepare_tiled_dense(tl, dtype=dtype)
        Rt = prep.tiles_per_row
        X = X32 if name.startswith(("a", "c")) else X32.astype(jnp.bfloat16)

        def step(state):
            p, Xc = state
            Y = spmm_tiled_dense_pallas(p, Xc)
            return (p, Xc.at[0, 0].add((Y[0, 0] * jnp.float32(1e-38))
                                       .astype(Xc.dtype)))

        t = bench_slope(step, (prep, X), iters=8, reps=5, u_lo=2, u_hi=10)
        esize = 2 if dtype == jnp.bfloat16 else 4
        # actual traffic: A blocks incl Rt padding, X per stored tile,
        # Y once, plus the conversion/pad pass when X dtype != block dtype
        conv = (X.dtype != dtype) * (A.shape[1] * N * (4 + esize))
        actual = (prep.nbr * Rt * TILE * TILE * esize
                  + n_tiles * TILE * N * esize
                  + -(-m // TILE) * TILE * N * 4 + conv)
        results[name] = {
            "time_s": t, "nnz_per_s": nnz / t,
            "Rt": Rt,
            "actual_bytes": actual, "actual_gb_s": actual / t / 1e9,
            "pct_of_model": 100.0 * (model_bytes(esize) / bw) / t,
        }
        print(name, json.dumps(results[name]), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
