"""Pallas TPU megakernel: conjugate gradients on a DIA operator.

Solver loops are dispatch-bound on this runtime (~0.1 ms per op launch,
~0.7 ms per chained-loop iteration — docs/PERFORMANCE.md); a CG iteration
is a dozen small ops, so the XLA-composed loop pays ~1 ms of overhead per
iteration. This kernel runs ``T`` whole CG iterations inside a single
``pallas_call``: the banded SpMV, both dot products, and the vector
updates, with the solver scalars (``rs``, ``p.Ap``) in SMEM. One launch
per *solve*, not per op.

**When to use**: the many-small-solves regime, where per-solve dispatch
dominates (n up to ~100K, or batches of tiny systems). At 1M rows the
XLA-composed loop (:func:`spsparse_tpu.solvers.cg_solve`, the *default*
CG path) wins — measured ~1.6 ms/iter vs ~2.3 ms/iter here, because this
kernel's passes serialize on the SMEM solver scalars while XLA overlaps
across ops (docs/PERFORMANCE.md "CG megakernel"). Making it win at scale
needs cross-superblock async DMA chaining — a roadmap item, not shipped.

Operator: :class:`~spsparse_tpu.ops.pallas_dia.PreparedDIA` diagonals plus
a ``shift * I`` Tikhonov term (callers solve ``(A + shift I) x = b`` with
the operator SPD).

Memory plan (sized for n up to ~1M f32):

* ``p`` lives *flat* in VMEM (``(1, npad + 2*PAD)``, zero margins) — the
  SpMV windows are aligned lane loads + in-register rolls, the pattern
  proven by the DIA SpMV kernel.
* ``Ap`` lives in VMEM as ``(nblocks, block)`` (aligned row stores).
* ``x`` and ``r`` stream through HBM in aligned 8-row-block DMAs (Mosaic
  requires HBM DMA row offsets/counts divisible by the 8-sublane tiling).
* Diagonal data streams from HBM per superblock, as in the SpMV kernel.
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

PAD = 128  # flat-p margin; >= max |offset|, lane-aligned


def _cg_kernel(data_hbm, b_flat, b_blk, xg, rg, stats, p_flat, ap2, vscr,
               dscr, smem, sems, *, T: int, nsuper: int, block: int,
               offsets: tuple, shift: float, interpret: bool):
    roll = jnp.roll if interpret else pltpu.roll
    L = block + 2 * PAD
    RS, PAP, RSNEW = 0, 1, 2

    def pload(r0blk, r):
        """Aligned (1, L) window load for block r0blk + r from flat p."""
        off = pl.multiple_of((r0blk + r) * block, 128)
        return p_flat[0:1, pl.ds(off, L)]

    def pblk8(r0blk):
        """(8, block) of p values for blocks [r0blk, r0blk+8)."""
        return jnp.concatenate(
            [p_flat[0:1, pl.ds(pl.multiple_of(PAD + (r0blk + r) * block,
                                              128), block)]
             for r in range(8)], axis=0)

    def dma_rows(hbm, slot, i, out=False):
        src = vscr.at[slot] if out else hbm.at[pl.ds(i * 8, 8)]
        dst = hbm.at[pl.ds(i * 8, 8)] if out else vscr.at[slot]
        d = pltpu.make_async_copy(src, dst, sems.at[slot])
        d.start()
        d.wait()

    # ---- init: p_flat = b (flat); x = 0; r = b; rs = b.b
    c = pltpu.make_async_copy(b_flat, p_flat, sems.at[3])
    c.start()
    c.wait()
    c = pltpu.make_async_copy(b_blk, rg, sems.at[3])
    c.start()
    c.wait()
    smem[RS] = jnp.float32(0.0)

    def init_sb(i, _):
        vscr[0] = jnp.zeros((8, block), jnp.float32)
        dma_rows(xg, 0, i, out=True)                  # x = 0
        blk = pblk8(i * 8)
        smem[RS] += jnp.sum(blk * blk)
        return 0

    jax.lax.fori_loop(0, nsuper, init_sb, 0)

    def cg_iter(t, _):
        # ---- pass A: Ap = (A + shift I) p ; pap = p.Ap   (Ap kept in VMEM;
        # diagonal-data DMA double-buffered against the shifted-FMA compute)
        smem[PAP] = jnp.float32(0.0)

        def dget(slot, i):
            return pltpu.make_async_copy(
                data_hbm.at[pl.ds(i * 8, 8)], dscr.at[slot], sems.at[slot])

        dget(0, 0).start()

        def passA(i, _):
            cur = i % 2

            @pl.when(i + 1 < nsuper)
            def _():
                dget((i + 1) % 2, i + 1).start()

            dget(cur, i).wait()
            w8 = jnp.concatenate([pload(i * 8, r) for r in range(8)], axis=0)
            acc = jnp.zeros((8, block), jnp.float32)
            for k, off in enumerate(offsets):
                s = off + PAD
                shifted = roll(w8, (L - s) % L, axis=1)[:, :block]
                acc = acc + dscr[cur][:, k, :].astype(jnp.float32) * shifted
            blk = pblk8(i * 8)
            acc = acc + jnp.float32(shift) * blk
            ap2[pl.ds(i * 8, 8), :] = acc
            smem[PAP] += jnp.sum(blk * acc)
            return 0

        jax.lax.fori_loop(0, nsuper, passA, 0)
        alpha = smem[RS] / jnp.where(smem[PAP] == 0, 1.0, smem[PAP])

        # ---- pass B: x += alpha p ; r -= alpha Ap ; rsnew = r.r
        smem[RSNEW] = jnp.float32(0.0)

        def passB(i, _):
            dma_rows(xg, 0, i)
            dma_rows(rg, 1, i)
            blk = pblk8(i * 8)
            apblk = ap2[pl.ds(i * 8, 8), :]
            rnew = vscr[1] - alpha * apblk
            vscr[0] = vscr[0] + alpha * blk
            vscr[1] = rnew
            smem[RSNEW] += jnp.sum(rnew * rnew)
            dma_rows(xg, 0, i, out=True)
            dma_rows(rg, 1, i, out=True)
            return 0

        jax.lax.fori_loop(0, nsuper, passB, 0)
        beta = smem[RSNEW] / jnp.where(smem[RS] == 0, 1.0, smem[RS])

        # ---- pass C: p = r + beta p  (row-wise stores into flat p)
        def passC(i, _):
            dma_rows(rg, 1, i)
            for r in range(8):
                off = pl.multiple_of(PAD + (i * 8 + r) * block, 128)
                pr = p_flat[0:1, pl.ds(off, block)]
                rr = vscr[1, r:r + 1, :]
                p_flat[0:1, pl.ds(off, block)] = rr + beta * pr
            return 0

        jax.lax.fori_loop(0, nsuper, passC, 0)
        smem[RS] = smem[RSNEW]
        return 0

    jax.lax.fori_loop(0, T, cg_iter, 0)
    stats[0, 0] = smem[RS]


@functools.partial(jax.jit, static_argnames=("offsets", "n", "block",
                                             "iters", "shift", "interpret"))
def _cg_dia(data3, b_flat, b_blk, *, offsets: tuple, n: int, block: int,
            iters: int, shift: float, interpret: bool):
    nblocks = data3.shape[0]
    nsuper = nblocks // 8
    K_pad = data3.shape[1]
    x, r, stats = pl.pallas_call(
        functools.partial(_cg_kernel, T=iters, nsuper=nsuper, block=block,
                          offsets=offsets, shift=shift, interpret=interpret),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # data3
            pl.BlockSpec(memory_space=pl.ANY),   # b flat
            pl.BlockSpec(memory_space=pl.ANY),   # b blocked
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),   # x
            pl.BlockSpec(memory_space=pl.ANY),   # r
            pl.BlockSpec(memory_space=pltpu.SMEM),  # stats
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, block), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, block), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, nblocks * block + 2 * PAD), jnp.float32),  # p
            pltpu.VMEM((nblocks, block), jnp.float32),                # Ap
            pltpu.VMEM((2, 8, block), jnp.float32),                   # x/r
            pltpu.VMEM((2, 8, K_pad, block), data3.dtype),            # data
            pltpu.SMEM((4,), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(data3, b_flat, b_blk)
    return x.reshape(-1)[:n], stats[0, 0]


def cg_solve_dia_pallas(dia, b: Array, *, iters: int, shift: float = 0.0,
                        block: int = 4096, interpret: bool = False):
    """Solve ``(A + shift I) x = b`` by ``iters`` CG iterations in one
    kernel launch. ``dia`` is a :class:`SparseDIA` or :class:`PreparedDIA`
    (must describe an SPD operator for CG to apply). Returns
    ``(x, final_rs)``."""
    if isinstance(dia, SparseDIA):
        dia = prepare_dia(dia, block=block)
    if max((abs(o) for o in dia.offsets), default=0) > PAD:
        raise ValueError(f"CG megakernel supports |offset| <= {PAD}")
    n = dia.shape[0]
    block = dia.block
    nblocks = dia.data3.shape[0]
    bp = jnp.pad(b.astype(jnp.float32), (0, nblocks * block - n))
    b_flat = jnp.zeros((1, nblocks * block + 2 * PAD), jnp.float32)
    b_flat = b_flat.at[0, PAD:PAD + nblocks * block].set(bp)
    b_blk = bp.reshape(nblocks, block)
    return _cg_dia(dia.data3, b_flat, b_blk, offsets=dia.offsets, n=n,
                   block=block, iters=iters, shift=float(shift),
                   interpret=interpret)
