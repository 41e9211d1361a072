"""Slope-method timing of the dense-block SpMM kernel (cancels this rig's
fixed per-loop-iteration cost that polluted the bench_fori probes)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.tiled import to_tiled, TILE
from spsparse_tpu.ops.pallas_tiled import prepare_tiled_dense
from spsparse_tpu.utils.benchtime import bench_slope

rng = np.random.default_rng(0)
m, K, N = 1 << 15, 50, 128
ncols = 2 * m
rr = np.repeat(np.arange(m), K)
cc = np.clip(rr * 2 + rng.integers(-128, 129, rr.size), 0, ncols - 1)
b = CooBuilder((m, ncols), dtype=np.float32)
b.add_many(np.stack([rr, cc], 1),
           rng.uniform(-1, 1, rr.size).astype(np.float32))
tl = to_tiled(b.build())
prep = prepare_tiled_dense(tl)
nbr, Rt = prep.tcols.shape
nbc = prep.nbc
Xp = jnp.pad(jnp.asarray(rng.uniform(-1, 1, (ncols, N)).astype(np.float32)),
             ((0, nbc * TILE - ncols), (0, 0)))
nnz = m * K

# empty kernel: slope = per-pallas_call overhead


def kern0(o_ref):
    o_ref[...] = o_ref[...] + 1.0


f0 = pl.pallas_call(
    kern0, grid=(256,),
    out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
t = bench_slope(lambda x: f0() * 1e-38 + x, jnp.zeros((8, 128), jnp.float32),
                iters=6, reps=3, u_lo=1, u_hi=5)
print(f"empty 256-step kernel slope: {t*1e3:.3f} ms/call")


def make(do_dma, do_matmul, precision):
    def kern2(tcols_ref, blocks_ref, x_hbm, y_ref, xtile, sem):
        bq = pl.program_id(0)

        def get_dma(slot, t):
            tc = jnp.minimum(tcols_ref[bq * Rt + t], nbc - 1)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(tc * TILE, TILE)], xtile.at[slot],
                sem.at[slot])

        if do_dma:
            get_dma(0, 0).start()
        y_ref[...] = jnp.zeros_like(y_ref)

        def body(t, _):
            if do_dma:
                @pl.when(t + 1 < Rt)
                def _():
                    get_dma((t + 1) % 2, t + 1).start()
                get_dma(t % 2, t).wait()

            @pl.when(tcols_ref[bq * Rt + t] < nbc)
            def _():
                if do_matmul:
                    y_ref[...] += jax.lax.dot_general(
                        blocks_ref[0, t], xtile[t % 2],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision)
                else:
                    y_ref[...] += xtile[t % 2]
            return 0

        jax.lax.fori_loop(0, Rt, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr,),
        in_specs=[
            pl.BlockSpec((1, Rt, TILE, TILE), lambda b_, t: (b_, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, N), lambda b_, t: (b_, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, TILE, N), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    f = pl.pallas_call(
        kern2, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((nbr * TILE, N), jnp.float32))
    return jax.jit(lambda Xc: f(prep.tcols.reshape(-1), prep.blocks, Xc))


for name, g in [
    ("dense dma+mm HIGHEST", make(True, True, jax.lax.Precision.HIGHEST)),
    ("dense dma+mm DEFAULT", make(True, True, jax.lax.Precision.DEFAULT)),
    ("dense dma only", make(True, False, None)),
]:
    def step(Xc, g=g):
        Y = g(Xc)
        return Xc.at[0, 0].add(Y[0, 0] * jnp.float32(1e-38))
    t = bench_slope(step, Xp, iters=4, reps=3, u_lo=1, u_hi=3)
    bytes_real = (int(np.prod(prep.blocks.shape)) * 4
                  + int(tl.n_tiles) * TILE * N * 4 + nbr * TILE * N * 4)
    print(f"{name}: {t*1e3:.3f} ms/call  {nnz/t:.3e} nnz/s  "
          f"{bytes_real/t/1e9:.0f} GB/s actual")
