"""Bisect the dense-block tiled SpMM cost on the real chip: DMA vs matmul
vs grid overhead vs precision, plus a pure-XLA gather+einsum baseline."""
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
X = jnp.asarray(rng.uniform(-1, 1, (ncols, N)).astype(np.float32))
Xp = jnp.pad(X, ((0, nbc * TILE - ncols), (0, 0)))
nnz = m * K
print(f"nbr={nbr} Rt={Rt} steps={nbr*Rt}")


def make_kernel(do_dma, do_matmul, precision):
    def kern(tcols_ref, blocks_ref, x_hbm, y_ref, xtile, sem):
        bq = pl.program_id(0)
        s = pl.program_id(1)
        i = bq * Rt + s

        def get_dma(slot, step):
            tc = jnp.minimum(tcols_ref[step], nbc - 1)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(tc * TILE, TILE)], xtile.at[slot],
                sem.at[slot])

        if do_dma:
            @pl.when(i == 0)
            def _():
                get_dma(0, 0).start()

            @pl.when(i + 1 < nbr * Rt)
            def _():
                get_dma((i + 1) % 2, i + 1).start()

            get_dma(i % 2, i).wait()

        @pl.when(s == 0)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        @pl.when(tcols_ref[i] < nbc)
        def _():
            if do_matmul:
                y_ref[...] += jax.lax.dot_general(
                    blocks_ref[0, 0], xtile[i % 2],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
            else:
                y_ref[...] += xtile[i % 2]
    return kern


def build(do_dma, do_matmul, precision):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr, Rt),
        in_specs=[
            pl.BlockSpec((1, 1, TILE, TILE), lambda b_, s_, t: (b_, s_, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, N), lambda b_, s_, t: (b_, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, TILE, N), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    f = pl.pallas_call(
        make_kernel(do_dma, do_matmul, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * TILE, N), jnp.float32),
    )
    return jax.jit(lambda Xc: f(prep.tcols.reshape(-1), prep.blocks, Xc))


cases = [
    ("dma+mm HIGHEST", build(True, True, jax.lax.Precision.HIGHEST)),
    ("dma+mm DEFAULT", build(True, True, jax.lax.Precision.DEFAULT)),
    ("dma only", build(True, False, None)),
    ("mm only (stale xtile)", build(False, True,
                                    jax.lax.Precision.DEFAULT)),
]
for name, f in cases:
    def step(Xc, f=f):
        Y = f(Xc)
        return Xc.at[0, 0].add(Y[0, 0] * jnp.float32(1e-38))
    t = bench_fori(step, Xp, iters=3, reps=2)
    print(f"{name}: {t*1e3:.3f} ms  ({nnz/t:.3e} nnz/s)")

# Pure-XLA baseline: gather X tiles + batched einsum.
Xt = Xp.reshape(nbc + 0, TILE, N) if (nbc * TILE == Xp.shape[0]) else None
Xt = Xp.reshape(-1, TILE, N)
tcols_clamped = jnp.minimum(prep.tcols, nbc - 1)
mask = (prep.tcols < nbc).astype(jnp.float32)


@jax.jit
def xla_dense(Xc):
    Xtl = Xc.reshape(-1, TILE, N)
    G = jnp.take(Xtl, tcols_clamped, axis=0)       # (nbr, Rt, TILE, N)
    Y = jnp.einsum("brij,brjn->bin", prep.blocks * mask[..., None, None],
                   G, precision=jax.lax.Precision.DEFAULT)
    return Y.reshape(nbr * TILE, N)


def step(Xc):
    Y = xla_dense(Xc)
    return Xc.at[0, 0].add(Y[0, 0] * jnp.float32(1e-38))


t = bench_fori(step, Xp, iters=3, reps=2)
print(f"xla gather+einsum DEFAULT: {t*1e3:.3f} ms  ({nnz/t:.3e} nnz/s)")
