"""Pallas TPU kernel: chained DIA SpMV iterations, device-resident.

Standard steady-state kernel benchmarking (and power-method-style
workloads): run ``y <- scale * (A @ y)`` ``T`` times inside ONE
``pallas_call``, with the iterate kept flat in VMEM and only the diagonal
data streaming from HBM each iteration. Per-iteration cost is then pure
kernel time — this machine's ~100 us per-launch dispatch floor is paid
once per chain instead of once per SpMV (docs/PERFORMANCE.md).

``scale`` (static) keeps f32 iterates bounded across iterations; use the
multi-RHS kernel for throughput on independent vectors and
:mod:`spsparse_tpu.ops.pallas_cg` for actual solves.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dia import PreparedDIA, diag_slice, prepare_dia
from ..core.dia import SparseDIA

Array = Any

__all__ = ["spmv_dia_chain_pallas"]

PAD = 128


def _chain_kernel(data_hbm, x0_flat, y_out, xa, xb, dscr, sems, *, T: int,
                  nsuper: int, block: int, offsets: tuple, scale: float,
                  interpret: bool):
    # Ping-pong flats: iteration t reads one flat buffer and stores the
    # scaled SpMV straight into the other's live region (margins stay
    # zero, so the next iteration's aligned window loads are valid).
    # The first version staged y into a blocked buffer and copied it back
    # flat every iteration — a whole extra VMEM sweep per SpMV that the
    # swap removes (and its (nblocks, block) VMEM buffer: y now lives in
    # HBM and is written once at the end).
    roll = jnp.roll if interpret else pltpu.roll
    L = block + 2 * PAD

    c = pltpu.make_async_copy(x0_flat, xa, sems.at[3])
    c.start()
    c.wait()
    # Zero xb's margins (and everything else) once; live region is fully
    # overwritten each iteration.
    xb[...] = jnp.zeros_like(xb)

    def dget(slot, i):
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(i * 8, 8)], dscr.at[slot], sems.at[slot])

    def one_iter(t, _):
        dget(0, 0).start()

        def sb_into(src, dst, i):
            w8 = jnp.concatenate(
                [src[0:1, pl.ds(pl.multiple_of((i * 8 + r) * block, 128),
                                L)]
                 for r in range(8)], axis=0)
            acc = jnp.zeros((8, block), jnp.float32)
            cur = i % 2
            for k, off in enumerate(offsets):
                s = off + PAD
                shifted = roll(w8, (L - s) % L, axis=1)[:, :block]
                acc = acc + diag_slice(dscr[cur], k, block).astype(jnp.float32) * shifted
            acc = acc * jnp.float32(scale)
            for r in range(8):
                o = pl.multiple_of(PAD + (i * 8 + r) * block, 128)
                dst[0:1, pl.ds(o, block)] = acc[r:r + 1, :]

        def sb(i, _):
            cur = i % 2

            @pl.when(i + 1 < nsuper)
            def _():
                dget((i + 1) % 2, i + 1).start()

            dget(cur, i).wait()

            @pl.when(t % 2 == 0)
            def _():
                sb_into(xa, xb, i)

            @pl.when(t % 2 == 1)
            def _():
                sb_into(xb, xa, i)

            return 0

        jax.lax.fori_loop(0, nsuper, sb, 0)
        return 0

    jax.lax.fori_loop(0, T, one_iter, 0)
    # Final iterate lives in xa (T even) or xb (T odd): one DMA out.
    src = xa if T % 2 == 0 else xb
    npad = nsuper * 8 * block
    c = pltpu.make_async_copy(src.at[0:1, pl.ds(PAD, npad)], y_out,
                              sems.at[3])
    c.start()
    c.wait()


@functools.partial(jax.jit, static_argnames=("offsets", "n", "block",
                                             "iters", "scale", "interpret"))
def _chain(data3, x0_flat, *, offsets: tuple, n: int, block: int,
           iters: int, scale: float, interpret: bool):
    nblocks = data3.shape[0]
    nsuper = nblocks // 8
    y = pl.pallas_call(
        functools.partial(_chain_kernel, T=iters, nsuper=nsuper,
                          block=block, offsets=offsets, scale=scale,
                          interpret=interpret),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # HBM; one final DMA
        out_shape=jax.ShapeDtypeStruct((1, nblocks * block), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, nblocks * block + 2 * PAD), jnp.float32),
            pltpu.VMEM((1, nblocks * block + 2 * PAD), jnp.float32),
            pltpu.VMEM((2, 8) + data3.shape[1:], data3.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(data3, x0_flat)
    return y.reshape(-1)[:n]


def spmv_dia_chain_pallas(dia, x: Array, *, iters: int, scale: float = 1.0,
                          block: int = 4096,
                          interpret: bool = False) -> Array:
    """``y = (scale * A)^iters @ x`` computed with one kernel launch."""
    if isinstance(dia, SparseDIA):
        dia = prepare_dia(dia, block=block)
    if max((abs(o) for o in dia.offsets), default=0) > PAD:
        raise ValueError(f"chain kernel supports |offset| <= {PAD}")
    n, m = dia.shape
    block = dia.block
    nblocks = dia.data3.shape[0]
    x0 = jnp.zeros((1, nblocks * block + 2 * PAD), jnp.float32)
    x0 = x0.at[0, PAD:PAD + m].set(x.astype(jnp.float32))
    return _chain(dia.data3, x0, offsets=dia.offsets, n=n, block=block,
                  iters=iters, scale=float(scale), interpret=interpret)
