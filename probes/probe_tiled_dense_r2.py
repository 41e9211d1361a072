"""Probe: dense-block tiled SpMM vs one-hot kernel on the config-3 matrix
(32K rows, 50 nnz/row column-local, 128-col block). Run on the real chip."""
import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.tiled import to_tiled, TILE
from spsparse_tpu.ops.pallas_tiled import (prepare_tiled_rows,
                                           spmm_tiled_pallas,
                                           prepare_tiled_dense,
                                           spmm_tiled_dense_pallas)
from spsparse_tpu.utils.benchtime import bench_fori
from spsparse_tpu.utils.roofline import device_hbm_bandwidth

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
X = jnp.asarray(rng.uniform(-1, 1, (ncols, N)).astype(np.float32))
nnz = m * K
print("n_tiles", int(tl.n_tiles), "tile_cap", tl.tile_cap)

ref = None
for name, prep, fn in [
    ("dense", prepare_tiled_dense(tl), spmm_tiled_dense_pallas),
    ("onehot", prepare_tiled_rows(tl), spmm_tiled_pallas),
]:
    Y = np.asarray(jax.block_until_ready(fn(prep, X)))
    if ref is None:
        import scipy.sparse as sp
        ref = sp.coo_matrix((np.asarray(A.vals)[:int(A.nnz)],
                             (np.asarray(A.indices)[:int(A.nnz), 0],
                              np.asarray(A.indices)[:int(A.nnz), 1])),
                            shape=(m, ncols)).tocsr() @ np.asarray(X)
    err = np.abs(Y - ref).max() / np.abs(ref).max()
    def step(Xc, fn=fn, prep=prep):
        Y = fn(prep, Xc)
        return Xc + jnp.sum(Y) * jnp.float32(1e-38)
    t = bench_fori(step, X, iters=3, reps=2)
    kind, bw = device_hbm_bandwidth()
    # pattern-aware sparse bytes model (same as bench config 3)
    n_tiles = int(tl.n_tiles)
    bytes_sparse = (n_tiles * tl.tile_cap * 6 + n_tiles * TILE * N * 4
                    + -(-m // TILE) * TILE * N * 4)
    sol = bw / (bytes_sparse / nnz)
    print(f"{name}: t={t*1e3:.3f} ms err={err:.2e} "
          f"nnz/s={nnz/t:.3e} pct_of_sparse_roofline="
          f"{100.0*nnz/t/sol:.1f}%")
    if name == "dense":
        real = (int(np.prod(prep.blocks.shape)) * 4
                + n_tiles * TILE * N * 4 + -(-m // TILE) * TILE * N * 4)
        print(f"  dense actual bytes {real/1e6:.0f} MB -> "
              f"{real/t/1e9:.0f} GB/s of {bw/1e9:.0f}")
