"""Precision sweep for the dense-block kernel: HIGHEST vs HIGH vs DEFAULT
matmul passes — time (robust slope) and accuracy vs f64 oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.tiled import to_tiled
from spsparse_tpu.ops import pallas_tiled as PT
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
prep = PT.prepare_tiled_dense(tl)
X = jnp.asarray(rng.uniform(-1, 1, (ncols, N)).astype(np.float32))

import scipy.sparse as sp_
ref = sp_.coo_matrix((np.asarray(A.vals)[:int(A.nnz)].astype(np.float64),
                      (np.asarray(A.indices)[:int(A.nnz), 0],
                       np.asarray(A.indices)[:int(A.nnz), 1])),
                     shape=(m, ncols)).tocsr() @ \
    np.asarray(X).astype(np.float64)

import spsparse_tpu.ops.pallas_tiled as mod
orig_kernel = mod._tiled_dense_kernel

for prec_name in ("HIGHEST", "HIGH", "DEFAULT"):
    prec = getattr(jax.lax.Precision, prec_name)

    # monkeypatch precision by rebuilding the kernel closure
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from spsparse_tpu.core.tiled import TILE

    def kern(tcols_ref, blocks_ref, x_hbm, y_ref, xtile, sem, *,
             tiles_per_row, nbc, _prec=prec):
        Rt = tiles_per_row
        bq = pl.program_id(0)

        def get_dma(slot, t):
            tc = jnp.minimum(tcols_ref[bq * Rt + t], nbc - 1)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(tc * TILE, TILE)], xtile.at[slot],
                sem.at[slot])

        get_dma(0, 0).start()
        y_ref[...] = jnp.zeros_like(y_ref)

        def body(t, _):
            @pl.when(t + 1 < Rt)
            def _():
                get_dma((t + 1) % 2, t + 1).start()
            get_dma(t % 2, t).wait()

            @pl.when(tcols_ref[bq * Rt + t] < nbc)
            def _():
                y_ref[...] += jax.lax.dot_general(
                    blocks_ref[0, t], xtile[t % 2],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_prec)
            return 0

        jax.lax.fori_loop(0, Rt, body, 0)

    nbr, Rt = prep.tcols.shape
    nbc = prep.nbc
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nbr,),
        in_specs=[
            pl.BlockSpec((1, Rt, TILE, TILE), lambda b_, t: (b_, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, N), lambda b_, t: (b_, 0)),
        scratch_shapes=[pltpu.VMEM((2, TILE, N), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    f = pl.pallas_call(
        functools.partial(kern, tiles_per_row=Rt, nbc=nbc),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((nbr * TILE, N), jnp.float32))
    g = jax.jit(lambda Xc: f(prep.tcols.reshape(-1), prep.blocks, Xc))
    Y = np.asarray(jax.block_until_ready(g(X)))
    err = np.abs(Y[:m] - ref).max() / np.abs(ref).max()

    def step(Xc, g=g):
        Y = g(Xc)
        return Xc.at[0, 0].add(Y[0, 0] * jnp.float32(1e-38))

    t = bench_slope(step, X, iters=8, reps=5, u_lo=2, u_hi=10)
    real = (int(np.prod(prep.blocks.shape)) * 4
            + int(tl.n_tiles) * TILE * N * 4 + nbr * TILE * N * 4)
    print(f"{prec_name}: t={t*1e3:.3f} ms rel_err={err:.2e} "
          f"{real/t/1e9:.0f} GB/s actual")
