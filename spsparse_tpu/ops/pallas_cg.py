"""Pallas TPU megakernel: conjugate gradients on a DIA operator.

Solver loops are dispatch-bound on this runtime (~0.1 ms per op launch,
~0.7 ms per chained-loop iteration — docs/PERFORMANCE.md); a CG iteration
is a dozen small ops, so the XLA-composed loop pays ~1 ms of overhead per
iteration. This kernel runs ``T`` whole CG iterations inside a single
``pallas_call``: the banded SpMV, both dot products, and the vector
updates all stream block-by-block through VMEM with the solver scalars
(``rs``, ``p.Ap``) living in SMEM. One launch per *solve*, not per op.

Operator: the :class:`~spsparse_tpu.ops.pallas_dia.PreparedDIA` diagonal
layout plus a ``shift * I`` Tikhonov term (callers typically solve
``(A + shift I) x = b`` with A SPD banded).

Memory layout: state vectors are stored *guarded* — ``(nblocks+2, block)``
with zero blocks at both ends — so every 10-block window DMA used to build
the shifted SpMV inputs stays in bounds without edge cases. Vector blocks
move HBM<->VMEM by explicit DMA; the diagonal data streams anew each
iteration (it cannot fit VMEM).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dia import PreparedDIA, prepare_dia
from ..core.dia import SparseDIA

Array = Any

__all__ = ["cg_solve_dia_pallas"]

PAD = 128  # guard width used for diagonal shifts; >= max |offset|, lane-aligned


def _win8(pwin, r, block):
    """Window r of 8: elements [(r+1)*block - PAD, ... + block + 2*PAD) of
    the 10-block flat span, built from static aligned slices."""
    return jnp.concatenate([
        pwin[r:r + 1, block - PAD:],
        pwin[r + 1:r + 2, :],
        pwin[r + 2:r + 3, :PAD],
    ], axis=1)


def _cg_kernel(data_hbm, b0, xg, rg, pg, apg, stats, vec_scr, dscr, smem,
               sems, *, T: int, nsuper: int, block: int, offsets: tuple,
               shift: float, interpret: bool):
    roll = jnp.roll if interpret else pltpu.roll
    L = block + 2 * PAD
    RS, PAP, RSNEW = 0, 1, 2

    def dma_vec(hbm, slot, i, n8=10):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(i, n8)], vec_scr.at[slot, pl.ds(0, n8)],
            sems.at[slot])

    def dma_out(slot, hbm, i, n8=8):
        return pltpu.make_async_copy(
            vec_scr.at[slot, pl.ds(0, n8)], hbm.at[pl.ds(i, n8)],
            sems.at[slot])

    def copy_hbm(src, dst):
        c = pltpu.make_async_copy(src, dst, sems.at[3])
        c.start()
        c.wait()

    # ---- init: x = 0; r = p = b0; rs = b.b  (Pallas outputs start as
    # garbage, so x's interior is zeroed explicitly; only p is ever
    # windowed, and its guard blocks come zeroed from b0.)
    copy_hbm(b0, rg)
    copy_hbm(b0, pg)
    smem[RS] = jnp.float32(0.0)

    def init_blk(i, _):
        vec_scr[2, 0:8, :] = jnp.zeros((8, block), jnp.float32)
        do = dma_out(2, xg, i * 8 + 1)
        do.start()
        do.wait()
        d = dma_vec(rg, 0, i * 8 + 1, 8)
        d.start()
        d.wait()
        blk = vec_scr[0, 0:8, :]
        smem[RS] += jnp.sum(blk * blk)
        return 0

    jax.lax.fori_loop(0, nsuper, init_blk, 0)

    def cg_iter(t, _):
        # ---- pass A: Ap = (A + shift I) p ; pap = p . Ap
        smem[PAP] = jnp.float32(0.0)

        def passA(i, _):
            dp = dma_vec(pg, 0, i * 8)           # 10 guarded blocks
            dd = pltpu.make_async_copy(
                data_hbm.at[pl.ds(i * 8, 8)], dscr, sems.at[2])
            dp.start()
            dd.start()
            dp.wait()
            dd.wait()
            pwin = vec_scr[0]
            acc = jnp.zeros((8, block), jnp.float32)
            w8 = jnp.concatenate(
                [_win8(pwin, r, block) for r in range(8)], axis=0)
            for k, off in enumerate(offsets):
                s = off + PAD
                shifted = roll(w8, (L - s) % L, axis=1)[:, :block]
                acc = acc + dscr[:, k, :].astype(jnp.float32) * shifted
            pblk = pwin[1:9, :]
            acc = acc + jnp.float32(shift) * pblk
            vec_scr[1, 0:8, :] = acc
            smem[PAP] += jnp.sum(pblk * acc)
            do = dma_out(1, apg, i * 8 + 1)
            do.start()
            do.wait()
            return 0

        jax.lax.fori_loop(0, nsuper, passA, 0)
        alpha = smem[RS] / jnp.where(smem[PAP] == 0, 1.0, smem[PAP])

        # ---- pass B: x += alpha p ; r -= alpha Ap ; rsnew = r.r
        smem[RSNEW] = jnp.float32(0.0)

        def passB(i, _):
            for slot, hbm in ((0, pg), (1, apg), (2, xg), (3, rg)):
                d = dma_vec(hbm, slot, i * 8 + 1, 8)
                d.start()
                d.wait()
            pblk = vec_scr[0, 0:8, :]
            apblk = vec_scr[1, 0:8, :]
            xblk = vec_scr[2, 0:8, :] + alpha * pblk
            rblk = vec_scr[3, 0:8, :] - alpha * apblk
            smem[RSNEW] += jnp.sum(rblk * rblk)
            vec_scr[2, 0:8, :] = xblk
            vec_scr[3, 0:8, :] = rblk
            do = dma_out(2, xg, i * 8 + 1)
            do.start()
            do.wait()
            do = dma_out(3, rg, i * 8 + 1)
            do.start()
            do.wait()
            return 0

        jax.lax.fori_loop(0, nsuper, passB, 0)
        beta = smem[RSNEW] / jnp.where(smem[RS] == 0, 1.0, smem[RS])

        # ---- pass C: p = r + beta p
        def passC(i, _):
            for slot, hbm in ((0, pg), (3, rg)):
                d = dma_vec(hbm, slot, i * 8 + 1, 8)
                d.start()
                d.wait()
            vec_scr[0, 0:8, :] = (vec_scr[3, 0:8, :]
                                  + beta * vec_scr[0, 0:8, :])
            do = dma_out(0, pg, i * 8 + 1)
            do.start()
            do.wait()
            return 0

        jax.lax.fori_loop(0, nsuper, passC, 0)
        smem[RS] = smem[RSNEW]
        return 0

    jax.lax.fori_loop(0, T, cg_iter, 0)
    stats[0, 0] = smem[RS]


@functools.partial(jax.jit, static_argnames=("offsets", "n", "block",
                                             "iters", "shift", "interpret"))
def _cg_dia(data3, b_guard, *, offsets: tuple, n: int, block: int,
            iters: int, shift: float, interpret: bool):
    nblocks = data3.shape[0]
    nsuper = nblocks // 8
    gshape = (nblocks + 2, block)
    x, r, p, ap, stats = pl.pallas_call(
        functools.partial(_cg_kernel, T=iters, nsuper=nsuper, block=block,
                          offsets=offsets, shift=shift, interpret=interpret),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # data3
            pl.BlockSpec(memory_space=pltpu.ANY),   # b (guarded)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),   # x
            pl.BlockSpec(memory_space=pltpu.ANY),   # r
            pl.BlockSpec(memory_space=pltpu.ANY),   # p
            pl.BlockSpec(memory_space=pltpu.ANY),   # Ap scratch
            pl.BlockSpec(memory_space=pltpu.SMEM),  # stats
        ),
        out_shape=(
            jax.ShapeDtypeStruct(gshape, jnp.float32),
            jax.ShapeDtypeStruct(gshape, jnp.float32),
            jax.ShapeDtypeStruct(gshape, jnp.float32),
            jax.ShapeDtypeStruct(gshape, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, 10, block), jnp.float32),
            pltpu.VMEM((8, data3.shape[1], block), data3.dtype),
            pltpu.SMEM((4,), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(data3, b_guard)
    return x[1:-1].reshape(-1)[:n], stats[0, 0]


def cg_solve_dia_pallas(dia, b: Array, *, iters: int, shift: float = 0.0,
                        block: int = 4096, interpret: bool = False):
    """Solve ``(A + shift I) x = b`` by ``iters`` CG iterations in one
    kernel launch. ``dia`` is a :class:`SparseDIA` or
    :class:`PreparedDIA` (must describe an SPD operator for CG to apply).
    Returns ``(x, final_rs)``.
    """
    if isinstance(dia, SparseDIA):
        dia = prepare_dia(dia, block=block)
    if max((abs(o) for o in dia.offsets), default=0) > PAD:
        raise ValueError(f"CG megakernel supports |offset| <= {PAD}")
    n = dia.shape[0]
    block = dia.block
    nblocks = dia.data3.shape[0]
    b_guard = jnp.zeros((nblocks + 2, block), jnp.float32)
    b_guard = b_guard.at[1:-1].set(
        jnp.pad(b.astype(jnp.float32), (0, nblocks * block - n))
        .reshape(nblocks, block))
    return _cg_dia(dia.data3, b_guard, offsets=dia.offsets, n=n, block=block,
                   iters=iters, shift=float(shift), interpret=interpret)
