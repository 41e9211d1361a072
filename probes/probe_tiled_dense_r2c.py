"""Isolate per-grid-step overhead: empty kernels at various step counts;
dense-block SpMM with inner fori (fewer grid steps); VMEM-resident X."""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.tiled import to_tiled, TILE
from spsparse_tpu.ops.pallas_tiled import prepare_tiled_dense
from spsparse_tpu.utils.benchtime import bench_fori

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

# --- 1. empty kernel step-count scan ---------------------------------------
for steps in (64, 256, 1024):
    def kern(o_ref):
        o_ref[...] = jnp.ones_like(o_ref)
    f = pl.pallas_call(
        kern, grid=(steps,),
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    g = jax.jit(lambda x: f() + x)
    t = bench_fori(lambda x: g(x), jnp.zeros((8, 128), jnp.float32),
                   iters=5, reps=2)
    print(f"empty kernel {steps} steps: {t*1e3:.3f} ms "
          f"({t/steps*1e6:.2f} us/step)")

# --- 2. dense blocks with inner fori over Rt (grid = nbr) ------------------


def kern2(tcols_ref, blocks_ref, x_hbm, y_ref, xtile, sem):
    bq = pl.program_id(0)

    def get_dma(slot, t):
        tc = jnp.minimum(tcols_ref[bq * Rt + t], nbc - 1)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tc * TILE, TILE)], xtile.at[slot], sem.at[slot])

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
                precision=jax.lax.Precision.HIGHEST)
        return 0

    jax.lax.fori_loop(0, Rt, body, 0)


grid_spec = pltpu.PrefetchScalarGridSpec(
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
f2 = pl.pallas_call(
    kern2, grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((nbr * TILE, N), jnp.float32))
g2 = jax.jit(lambda Xc: f2(prep.tcols.reshape(-1), prep.blocks, Xc))
Y = np.asarray(jax.block_until_ready(g2(Xp)))
import scipy.sparse as sp_
A = b.build()
ref = sp_.coo_matrix((np.asarray(A.vals)[:int(A.nnz)],
                      (np.asarray(A.indices)[:int(A.nnz), 0],
                       np.asarray(A.indices)[:int(A.nnz), 1])),
                     shape=(m, ncols)).tocsr() @ np.asarray(Xp)[:ncols]
print("inner-fori err:", np.abs(Y[:m] - ref).max() / np.abs(ref).max())


def step(Xc):
    Yv = g2(Xc)
    return Xc.at[0, 0].add(Yv[0, 0] * jnp.float32(1e-38))


t = bench_fori(step, Xp, iters=3, reps=2)
print(f"dense inner-fori (grid {nbr}): {t*1e3:.3f} ms ({nnz/t:.3e} nnz/s)")

# --- 3. same but X entirely VMEM-resident (no manual DMA) ------------------
# X is (nbc*TILE, N) = 33 MB -> fits VMEM? try; if compile fails, skip.
try:
    def kern3(tcols_ref, blocks_ref, x_ref, y_ref):
        bq = pl.program_id(0)
        y_ref[...] = jnp.zeros_like(y_ref)

        def body(t, _):
            tc = jnp.minimum(tcols_ref[bq * Rt + t], nbc - 1)

            @pl.when(tcols_ref[bq * Rt + t] < nbc)
            def _():
                xt = x_ref[pl.ds(tc * TILE, TILE)]
                y_ref[...] += jax.lax.dot_general(
                    blocks_ref[0, t], xt,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            return 0

        jax.lax.fori_loop(0, Rt, body, 0)

    gs3 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr,),
        in_specs=[
            pl.BlockSpec((1, Rt, TILE, TILE), lambda b_, t: (b_, 0, 0, 0)),
            pl.BlockSpec((nbc * TILE, N), lambda b_, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, N), lambda b_, t: (b_, 0)),
    )
    f3 = pl.pallas_call(
        kern3, grid_spec=gs3,
        out_shape=jax.ShapeDtypeStruct((nbr * TILE, N), jnp.float32))
    g3 = jax.jit(lambda Xc: f3(prep.tcols.reshape(-1), prep.blocks, Xc))
    Y3 = np.asarray(jax.block_until_ready(g3(Xp)))
    print("vmem-X err:", np.abs(Y3[:m] - ref).max() / np.abs(ref).max())

    def step3(Xc):
        Yv = g3(Xc)
        return Xc.at[0, 0].add(Yv[0, 0] * jnp.float32(1e-38))

    t = bench_fori(step3, Xp, iters=3, reps=2)
    print(f"dense vmem-X (grid {nbr}): {t*1e3:.3f} ms ({nnz/t:.3e} nnz/s)")
except Exception as e:
    print("vmem-X variant failed:", str(e)[:300])
