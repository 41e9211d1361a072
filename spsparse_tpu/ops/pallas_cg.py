"""Pallas TPU megakernel: conjugate gradients on a DIA operator.

Runs ``T`` whole CG iterations inside a single ``pallas_call``: the banded
SpMV, both dot products, and the vector updates, with the solver scalars
(``rs``, ``p.Ap``) in SMEM. One launch per *solve*, not per op.

Round-2 rework (v2): the first version streamed ``x``/``r`` through HBM
with serialized start+wait DMAs in every pass — measured ~2.3 ms/iter at
1M rows, LOSING to the XLA-composed loop. v2 keeps ``p``/``r`` (flat,
zero margins) and ``Ap`` VMEM-resident, so per-iteration HBM traffic is
the diagonal-data stream plus one double-buffered x-block update pass:
``nnz*4 + 2*n*4`` bytes/iter. Measured (v5e, 1M rows, 11 diagonals):
177 us/iter, parity with the composed loop's 148-217 us (v1 lost 1.44x),
while keeping the one-launch advantage for small/eager solves; agrees
with the composed loop to 1.9e-6. ``x`` lives in the HBM output buffer (the TPU scoped-VMEM limit is
16 MB; p + r + Ap + the data double-buffer already take ~14.5 MB at 1M
rows with the default ``block=2048``).

Iteration structure (scalars in SMEM serialize only at pass boundaries):

* pass P: ``p = r + beta p``       (VMEM sweep; beta=0 folds the classic
  first-iteration ``p = r`` and keeps one uniform loop body)
* pass A: ``Ap = (A + shift I) p``; ``pap = p.Ap``  (HBM data stream,
  double-buffered)
* pass B: ``x += alpha p``; ``r -= alpha Ap``; ``rs' = r.r``  (VMEM sweep
  + double-buffered x-block DMAs against the HBM output buffer)

Operator: :class:`~spsparse_tpu.ops.pallas_dia.PreparedDIA` diagonals plus
a ``shift * I`` Tikhonov term (callers solve ``(A + shift I) x = b`` with
the operator SPD).

Measured reference points (v5e, 1M rows, 11 diagonals, ~±30% tunnel
variance): composed ``solvers.cg_solve`` over the Pallas SpMV =
148-217 us/iter (the XLA-DIA matvec variant = 0.37-1.7 ms/iter); bare
SpMV = 137-153 us (probes/probe_cg_step_r2.py).
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

__all__ = ["cg_solve_dia_pallas", "VMEM_BUDGET", "CG_BLOCK"]

PAD = 128  # flat p/r margin; >= max |offset|, lane-aligned

# The TPU scoped-VMEM limit defaults to 16 MB (measured: a 20.04M
# allocation was rejected with "limit 16.00M" by the v5e compiler);
# the kernel requests a raised per-kernel limit via
# ``CompilerParams(vmem_limit_bytes=...)`` so larger solves fit —
# v5e physical VMEM is far larger. The budget below is what the
# wrapper's guard enforces (validated on chip; see
# probes/probe_cg_step_r2.py).
VMEM_BUDGET = 60 * 1024 * 1024

# Smaller than the SpMV kernel's 4096: halves the diagonal-data double
# buffer so p/r/Ap fit beside it under the 16 MB scoped-VMEM limit.
CG_BLOCK = 2048


def _cg_kernel(data_hbm, b_flat, xg, stats, p_flat, r_flat, ap2, xbuf,
               dscr, smem, sems, xsems, *, T: int, nsuper: int, block: int,
               offsets: tuple, shift: float, interpret: bool):
    roll = jnp.roll if interpret else pltpu.roll
    L = block + 2 * PAD
    RS, PAP, RSNEW, BETA = 0, 1, 2, 3

    def win(flat, r0blk, r):
        """Aligned (1, L) window load for block r0blk + r."""
        off = pl.multiple_of((r0blk + r) * block, 128)
        return flat[0:1, pl.ds(off, L)]

    def blk8(flat, r0blk):
        """(8, block) of live values for blocks [r0blk, r0blk+8)."""
        return jnp.concatenate(
            [flat[0:1, pl.ds(pl.multiple_of(PAD + (r0blk + r) * block,
                                            128), block)]
             for r in range(8)], axis=0)

    def store8(flat, r0blk, vals8):
        for r in range(8):
            off = pl.multiple_of(PAD + (r0blk + r) * block, 128)
            flat[0:1, pl.ds(off, block)] = vals8[r:r + 1, :]

    def xin_dma(slot, i):
        return pltpu.make_async_copy(
            xg.at[pl.ds(i * 8, 8)], xbuf.at[slot], xsems.at[slot])

    def xout_dma(slot, i):
        return pltpu.make_async_copy(
            xbuf.at[2 + slot], xg.at[pl.ds(i * 8, 8)], xsems.at[2 + slot])

    # ---- init: p = r = b (flat, zero margins); x = 0; rs = b.b
    for dst in (p_flat, r_flat):
        c = pltpu.make_async_copy(b_flat, dst, sems.at[3])
        c.start()
        c.wait()
    smem[RS] = jnp.float32(0.0)
    smem[BETA] = jnp.float32(0.0)
    xbuf[2] = jnp.zeros((8, block), jnp.float32)

    def init_sb(i, _):
        d = xout_dma(0, i)  # x = 0 (serialized; one-time init)
        d.start()
        d.wait()
        blk = blk8(r_flat, i * 8)
        smem[RS] += jnp.sum(blk * blk)
        return 0

    jax.lax.fori_loop(0, nsuper, init_sb, 0)

    def dget(slot, i):
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(i * 8, 8)], dscr.at[slot], sems.at[slot])

    def cg_iter(t, _):
        # ---- pass P: p = r + beta p (VMEM-only sweep; beta=0 on t==0)
        beta = smem[BETA]

        def passP(i, _):
            pn = blk8(r_flat, i * 8) + beta * blk8(p_flat, i * 8)
            store8(p_flat, i * 8, pn)
            return 0

        jax.lax.fori_loop(0, nsuper, passP, 0)

        # ---- pass A: Ap = (A + shift I) p ; pap = p.Ap (data streamed,
        # double-buffered against the shifted-FMA compute)
        smem[PAP] = jnp.float32(0.0)
        dget(0, 0).start()

        def passA(i, _):
            cur = i % 2

            @pl.when(i + 1 < nsuper)
            def _():
                dget((i + 1) % 2, i + 1).start()

            dget(cur, i).wait()
            w8 = jnp.concatenate([win(p_flat, i * 8, r) for r in range(8)],
                                 axis=0)
            acc = jnp.zeros((8, block), jnp.float32)
            for k, off in enumerate(offsets):
                s = off + PAD
                shifted = roll(w8, (L - s) % L, axis=1)[:, :block]
                acc = acc + diag_slice(dscr[cur], k, block).astype(jnp.float32) * shifted
            blk = blk8(p_flat, i * 8)
            acc = acc + jnp.float32(shift) * blk
            ap2[pl.ds(i * 8, 8), :] = acc
            smem[PAP] += jnp.sum(blk * acc)
            return 0

        jax.lax.fori_loop(0, nsuper, passA, 0)
        alpha = smem[RS] / jnp.where(smem[PAP] == 0, 1.0, smem[PAP])

        # ---- pass B: x += alpha p (x blocks double-buffered against the
        # HBM output buffer) ; r -= alpha Ap ; rsnew = r.r (VMEM)
        smem[RSNEW] = jnp.float32(0.0)
        xin_dma(0, 0).start()

        def passB(i, _):
            cur = i % 2

            @pl.when(i + 1 < nsuper)
            def _():
                xin_dma((i + 1) % 2, i + 1).start()

            xin_dma(cur, i).wait()

            @pl.when(i >= 2)
            def _():
                xout_dma(cur, i - 2).wait()   # slot free before reuse

            blk = blk8(p_flat, i * 8)
            apblk = ap2[pl.ds(i * 8, 8), :]
            xbuf[2 + cur] = xbuf[cur] + alpha * blk
            xout_dma(cur, i).start()
            rnew = blk8(r_flat, i * 8) - alpha * apblk
            store8(r_flat, i * 8, rnew)
            smem[RSNEW] += jnp.sum(rnew * rnew)
            return 0

        jax.lax.fori_loop(0, nsuper, passB, 0)
        # epilogue: drain the last in-flight x writes (static bounds)
        for tail in range(max(nsuper - 2, 0), nsuper):
            xout_dma(tail % 2, tail).wait()
        smem[BETA] = smem[RSNEW] / jnp.where(smem[RS] == 0, 1.0, smem[RS])
        smem[RS] = smem[RSNEW]
        return 0

    jax.lax.fori_loop(0, T, cg_iter, 0)
    stats[0, 0] = smem[RS]


@functools.partial(jax.jit, static_argnames=("offsets", "n", "block",
                                             "iters", "shift", "interpret"))
def _cg_dia(data3, b_flat, *, offsets: tuple, n: int, block: int,
            iters: int, shift: float, interpret: bool):
    nblocks = data3.shape[0]
    nsuper = nblocks // 8
    x, stats = pl.pallas_call(
        functools.partial(_cg_kernel, T=iters, nsuper=nsuper, block=block,
                          offsets=offsets, shift=shift, interpret=interpret),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # data3
            pl.BlockSpec(memory_space=pl.ANY),   # b flat
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),   # x (HBM; DMA'd in pass B)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # stats
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, block), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, nblocks * block + 2 * PAD), jnp.float32),  # p
            pltpu.VMEM((1, nblocks * block + 2 * PAD), jnp.float32),  # r
            pltpu.VMEM((nblocks, block), jnp.float32),                # Ap
            pltpu.VMEM((4, 8, block), jnp.float32),   # x in/out buffers
            pltpu.VMEM((2, 8) + data3.shape[1:], data3.dtype),  # data
            pltpu.SMEM((4,), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),       # x in (0-1) / out (2-3)
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET + (1 << 20)),
        interpret=interpret,
    )(data3, b_flat)
    return x.reshape(-1)[:n], stats[0, 0]


def _vmem_bytes(data3, block: int) -> int:
    import math

    nblocks = data3.shape[0]
    npad = nblocks * block
    dscr = 2 * 8 * math.prod(data3.shape[1:]) * data3.dtype.itemsize
    return (2 * (npad + 2 * PAD) + npad + 4 * 8 * block) * 4 + dscr


def cg_solve_dia_pallas(dia, b: Array, *, iters: int, shift: float = 0.0,
                        block: int = CG_BLOCK, interpret: bool = False):
    """Solve ``(A + shift I) x = b`` by ``iters`` CG iterations in one
    kernel launch. ``dia`` is a :class:`SparseDIA` or :class:`PreparedDIA`
    (must describe an SPD operator for CG to apply; prefer the default
    ``CG_BLOCK`` blocking — a 4096-block ``PreparedDIA`` doubles the
    data buffer and shrinks the max solvable n). Returns
    ``(x, final_rs)``."""
    if isinstance(dia, SparseDIA):
        dia = prepare_dia(dia, block=block)
    if max((abs(o) for o in dia.offsets), default=0) > PAD:
        raise ValueError(f"CG megakernel supports |offset| <= {PAD}")
    n = dia.shape[0]
    block = dia.block
    nblocks = dia.data3.shape[0]
    npad = nblocks * block
    vmem = _vmem_bytes(dia.data3, block)
    if vmem > VMEM_BUDGET:
        hint = (" (re-prepare with prepare_dia(..., block=2048))"
                if block > CG_BLOCK else "")
        raise ValueError(
            f"cg_solve_dia_pallas needs ~{vmem / (1 << 20):.1f} MiB of "
            f"VMEM for n={n}, block={block} (scoped-VMEM budget "
            f"{VMEM_BUDGET >> 20} MiB){hint}; use "
            "spsparse_tpu.solvers.cg_solve (XLA-composed) at this scale")
    bp = jnp.pad(b.astype(jnp.float32), (0, npad - n))
    b_flat = jnp.zeros((1, npad + 2 * PAD), jnp.float32)
    b_flat = b_flat.at[0, PAD:PAD + npad].set(bp)
    return _cg_dia(dia.data3, b_flat, offsets=dia.offsets, n=n,
                   block=block, iters=iters, shift=float(shift),
                   interpret=interpret)
