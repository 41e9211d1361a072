"""Round-4 config-3, part b: carry the iteration dependency through the
BLOCKS (X loop-invariant, like the config-4 harness) so the X pad/convert
hoists out of the chain and no per-iteration X copy exists. Variants:

  d) bf16 blocks perturbed, X f32 constant (conversion hoisted once);
  e) bf16 blocks perturbed, X bf16 constant;
  f) f32 blocks perturbed, X f32 constant.
"""
import json

import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu.core.tiled import to_tiled, TILE
from spsparse_tpu.ops.pallas_tiled import (prepare_tiled_dense,
                                           spmm_tiled_dense_pallas)
from spsparse_tpu.utils.benchtime import bench_slope
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
    X32 = jnp.asarray(rng.uniform(-1, 1, (A.shape[1], N))
                      .astype(np.float32))

    def model_bytes(esize):
        return (n_tiles * tl.tile_cap * (2 + esize)
                + n_tiles * TILE * N * esize
                + -(-m // TILE) * TILE * N * 4)

    print(json.dumps({"n_tiles": n_tiles, "cap": tl.tile_cap,
                      "device": kind}), flush=True)
    for name, dtype, xdt in (("d_bf16blk_f32X", jnp.bfloat16, jnp.float32),
                             ("e_bf16blk_bf16X", jnp.bfloat16, jnp.bfloat16),
                             ("f_f32blk_f32X", jnp.float32, jnp.float32)):
        prep = prepare_tiled_dense(tl, dtype=dtype)
        Rt = prep.tiles_per_row
        X = X32.astype(xdt)

        def step(state):
            p, Xc = state
            Y = spmm_tiled_dense_pallas(p, Xc)
            eps = (Y[0, 0] * jnp.float32(1e-30)).astype(p.blocks.dtype)
            p2 = dataclasses.replace(
                p, blocks=p.blocks.at[0, 0, 0, 0].add(eps))
            return (p2, Xc)

        t = bench_slope(step, (prep, X), iters=8, reps=5, u_lo=2, u_hi=10)
        esize = 2 if dtype == jnp.bfloat16 else 4
        actual = (prep.nbr * Rt * TILE * TILE * esize
                  + n_tiles * TILE * N * esize
                  + -(-m // TILE) * TILE * N * 4)
        print(name, json.dumps({
            "time_s": t, "nnz_per_s": nnz / t, "Rt": Rt,
            "actual_gb_s": actual / t / 1e9,
            "pct_of_model": 100.0 * (model_bytes(esize) / bw) / t,
        }), flush=True)


if __name__ == "__main__":
    main()
