"""Pallas TPU megakernel: conjugate gradients on a DIA operator.

Runs ``T`` whole CG iterations inside a single ``pallas_call``: the banded
SpMV, both dot products, and the vector updates, with the solver scalars
(``rs``, ``p.Ap``) in SMEM. One launch per *solve*, not per op.

Round-2 rework (v2): the first version streamed ``x``/``r`` through HBM
with serialized start+wait DMAs in every pass — measured ~2.3 ms/iter at
1M rows, LOSING to the XLA-composed loop (~1.6 ms/iter). v2 keeps **every
solver vector VMEM-resident** (``p`` and ``r`` flat with zero margins,
``x``/``Ap`` blocked) so the only HBM traffic per iteration is the
diagonal-data stream (double-buffered, as in the SpMV kernel) — the
speed-of-light plan for banded CG: ``nnz*4`` bytes/iter. ``x`` is written
out once, after the last iteration.

Iteration structure (scalars in SMEM serialize only at pass boundaries):

* pass P: ``p = r + beta p``       (VMEM sweep; beta=0 folds the classic
  first-iteration ``p = r`` and keeps one uniform loop body)
* pass A: ``Ap = (A + shift I) p``; ``pap = p.Ap``  (HBM data stream)
* pass B: ``x += alpha p``; ``r -= alpha Ap``; ``rs' = r.r``  (VMEM sweep)

Operator: :class:`~spsparse_tpu.ops.pallas_dia.PreparedDIA` diagonals plus
a ``shift * I`` Tikhonov term (callers solve ``(A + shift I) x = b`` with
the operator SPD).

VMEM budget: ``~4.1 * n * 4`` bytes of vectors (p, r margins included; x,
Ap) plus the data double-buffer (``2*8*K_pad*block*4``); n = 1M f32 needs
~18.5 MB. The wrapper raises beyond ``VMEM_BUDGET`` — larger systems
belong on the XLA-composed :func:`spsparse_tpu.solvers.cg_solve` loop
(or a future superblock-streamed variant).
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

__all__ = ["cg_solve_dia_pallas", "VMEM_BUDGET"]

PAD = 128  # flat p/r margin; >= max |offset|, lane-aligned

# Conservative per-kernel VMEM allowance (v5e TensorCore VMEM is larger,
# but leave headroom for Mosaic's own buffers). Checked by the wrapper.
VMEM_BUDGET = 96 * 1024 * 1024


def _cg_kernel(data_hbm, b_flat, xg, stats, p_flat, r_flat, x2, ap2, dscr,
               smem, sems, *, T: int, nsuper: int, block: int,
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

    # ---- init: p = r = b (flat, zero margins); x = 0; rs = b.b
    for dst in (p_flat, r_flat):
        c = pltpu.make_async_copy(b_flat, dst, sems.at[3])
        c.start()
        c.wait()
    smem[RS] = jnp.float32(0.0)
    smem[BETA] = jnp.float32(0.0)

    def init_sb(i, _):
        x2[pl.ds(i * 8, 8), :] = jnp.zeros((8, block), jnp.float32)
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
                acc = acc + dscr[cur][:, k, :].astype(jnp.float32) * shifted
            blk = blk8(p_flat, i * 8)
            acc = acc + jnp.float32(shift) * blk
            ap2[pl.ds(i * 8, 8), :] = acc
            smem[PAP] += jnp.sum(blk * acc)
            return 0

        jax.lax.fori_loop(0, nsuper, passA, 0)
        alpha = smem[RS] / jnp.where(smem[PAP] == 0, 1.0, smem[PAP])

        # ---- pass B: x += alpha p ; r -= alpha Ap ; rsnew = r.r (VMEM)
        smem[RSNEW] = jnp.float32(0.0)

        def passB(i, _):
            blk = blk8(p_flat, i * 8)
            apblk = ap2[pl.ds(i * 8, 8), :]
            x2[pl.ds(i * 8, 8), :] += alpha * blk
            rnew = blk8(r_flat, i * 8) - alpha * apblk
            store8(r_flat, i * 8, rnew)
            smem[RSNEW] += jnp.sum(rnew * rnew)
            return 0

        jax.lax.fori_loop(0, nsuper, passB, 0)
        smem[BETA] = smem[RSNEW] / jnp.where(smem[RS] == 0, 1.0, smem[RS])
        smem[RS] = smem[RSNEW]
        return 0

    jax.lax.fori_loop(0, T, cg_iter, 0)

    # ---- write x out once
    c = pltpu.make_async_copy(x2, xg, sems.at[3])
    c.start()
    c.wait()
    stats[0, 0] = smem[RS]


@functools.partial(jax.jit, static_argnames=("offsets", "n", "block",
                                             "iters", "shift", "interpret"))
def _cg_dia(data3, b_flat, *, offsets: tuple, n: int, block: int,
            iters: int, shift: float, interpret: bool):
    nblocks = data3.shape[0]
    nsuper = nblocks // 8
    K_pad = data3.shape[1]
    x, stats = pl.pallas_call(
        functools.partial(_cg_kernel, T=iters, nsuper=nsuper, block=block,
                          offsets=offsets, shift=shift, interpret=interpret),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # data3
            pl.BlockSpec(memory_space=pl.ANY),   # b flat
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),   # x
            pl.BlockSpec(memory_space=pltpu.SMEM),  # stats
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, block), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, nblocks * block + 2 * PAD), jnp.float32),  # p
            pltpu.VMEM((1, nblocks * block + 2 * PAD), jnp.float32),  # r
            pltpu.VMEM((nblocks, block), jnp.float32),                # x
            pltpu.VMEM((nblocks, block), jnp.float32),                # Ap
            pltpu.VMEM((2, 8, K_pad, block), data3.dtype),            # data
            pltpu.SMEM((4,), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(data3, b_flat)
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
    npad = nblocks * block
    K_pad = dia.data3.shape[1]
    vmem = (2 * (npad + 2 * PAD) + 2 * npad) * 4 \
        + 2 * 8 * K_pad * block * dia.data3.dtype.itemsize
    if vmem > VMEM_BUDGET:
        raise ValueError(
            f"cg_solve_dia_pallas needs ~{vmem >> 20} MiB of VMEM for "
            f"n={n} (budget {VMEM_BUDGET >> 20} MiB); use "
            "spsparse_tpu.solvers.cg_solve (XLA-composed) at this scale")
    bp = jnp.pad(b.astype(jnp.float32), (0, npad - n))
    b_flat = jnp.zeros((1, npad + 2 * PAD), jnp.float32)
    b_flat = b_flat.at[0, PAD:PAD + npad].set(bp)
    return _cg_dia(dia.data3, b_flat, offsets=dia.offsets, n=n,
                   block=block, iters=iters, shift=float(shift),
                   interpret=interpret)
