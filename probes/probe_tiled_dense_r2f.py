"""Slope-time the SHIPPED dense-block kernel (cross-row DMA prefetch) on
the config-3 matrix, 3 reps."""
import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.tiled import to_tiled, TILE
from spsparse_tpu.ops.pallas_tiled import (prepare_tiled_dense,
                                           spmm_tiled_dense_pallas)
from spsparse_tpu.utils.benchtime import bench_slope

rng = np.random.default_rng(0)
m, K, N = 1 << 15, 50, 128
ncols = 2 * m
rr = np.repeat(np.arange(m), K)
cc = np.clip(rr * 2 + rng.integers(-128, 129, rr.size), 0, ncols - 1)
b = CooBuilder((m, ncols), dtype=np.float32)
b.add_many(np.stack([rr, cc], 1),
           rng.uniform(-1, 1, rr.size).astype(np.float32))
A = b.build()
tl = to_tiled(A)
prep = prepare_tiled_dense(tl)
X = jnp.asarray(rng.uniform(-1, 1, (ncols, N)).astype(np.float32))

Y = np.asarray(jax.block_until_ready(spmm_tiled_dense_pallas(prep, X)))
import scipy.sparse as sp_
ref = sp_.coo_matrix((np.asarray(A.vals)[:int(A.nnz)],
                      (np.asarray(A.indices)[:int(A.nnz), 0],
                       np.asarray(A.indices)[:int(A.nnz), 1])),
                     shape=(m, ncols)).tocsr() @ np.asarray(X)
print("err:", np.abs(Y - ref).max() / np.abs(ref).max())

nnz = m * K
n_tiles = int(tl.n_tiles)
real = (int(np.prod(prep.blocks.shape)) * 4 + n_tiles * TILE * N * 4
        + -(-m // TILE) * TILE * N * 4)
model = (n_tiles * tl.tile_cap * 6 + n_tiles * TILE * N * 4
         + -(-m // TILE) * TILE * N * 4)
sol = 8.19e11 / (model / nnz)
for rep in range(3):
    def step(Xc):
        Yv = spmm_tiled_dense_pallas(prep, Xc)
        return Xc.at[0, 0].add(Yv[0, 0] * jnp.float32(1e-38))
    t = bench_slope(step, X, iters=8, reps=5, u_lo=2, u_hi=10)
    print(f"rep{rep}: t={t*1e3:.3f} ms  {real/t/1e9:.0f} GB/s actual  "
          f"pct_of_model={100.0*nnz/t/sol:.1f}%")
