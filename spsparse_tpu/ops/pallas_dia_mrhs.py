"""Pallas TPU kernel: multi-RHS DIA SpMM (8 right-hand sides per pass).

Banded SpMV is dominated by streaming the diagonal data; with ``R`` right-
hand sides that stream is amortized ``R``-fold. This kernel maps the RHS
axis onto the *sublane* dimension — ``X (8, n)`` — so the per-diagonal
shifted windows are naturally full-sublane ``(8, L)`` rolls (the layout
lesson from the single-RHS kernel), and each grid-free block step does

    Y[:, blk] += data[k, blk] * roll(X_window)     for each diagonal k

with the data row broadcast across all 8 RHS. Traffic per block:
``K*block*4`` (data, once for all RHS) + ``8*L*4`` (X windows) +
``8*block*4`` (Y) — ~`(4/R + 8) B` per (nnz, rhs) pair instead of ~12.

The wrapper pre-builds the overlapped X windows ``(nblocks, 8, L)`` host-
side (XLA static slices) because Mosaic cannot DMA dynamic minor-dim
windows from HBM.
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

__all__ = ["spmm_dia_mrhs_pallas", "RHS_BLOCK"]

RHS_BLOCK = 8


def _mrhs_kernel(x3_hbm, data_hbm, y_hbm, xw, dscr, yscr, sems, *,
                 offsets: tuple, pad: int, block: int, nblocks: int,
                 interpret: bool):
    roll = jnp.roll if interpret else pltpu.roll
    L = block + 2 * pad

    def get_x(slot, i):
        return pltpu.make_async_copy(x3_hbm.at[i], xw.at[slot],
                                     sems.at[slot])

    def get_d(slot, i):
        return pltpu.make_async_copy(data_hbm.at[i], dscr.at[slot],
                                     sems.at[2 + slot])

    get_x(0, 0).start()
    get_d(0, 0).start()

    def body(i, _):
        cur = i % 2

        @pl.when(i + 1 < nblocks)
        def _():
            get_x((i + 1) % 2, i + 1).start()
            get_d((i + 1) % 2, i + 1).start()

        get_x(cur, i).wait()
        get_d(cur, i).wait()
        w = xw[cur]                                  # (8, L)
        acc = jnp.zeros((RHS_BLOCK, block), jnp.float32)
        for k, off in enumerate(offsets):
            s = off + pad
            shifted = roll(w, (L - s) % L, axis=1)[:, :block]
            acc = acc + dscr[cur][k:k + 1, :].astype(jnp.float32) * shifted
        yscr[...] = acc
        do = pltpu.make_async_copy(yscr, y_hbm.at[i], sems.at[3])
        do.start()
        do.wait()
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)


@functools.partial(jax.jit, static_argnames=("offsets", "n", "block",
                                             "interpret"))
def _spmm_mrhs(data3, x3, *, offsets: tuple, n: int, block: int,
               interpret: bool):
    nblocks, K_pad, _ = data3.shape
    pad = (x3.shape[2] - block) // 2
    y = pl.pallas_call(
        functools.partial(_mrhs_kernel, offsets=offsets, pad=pad,
                          block=block, nblocks=nblocks, interpret=interpret),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # X windows
            pl.BlockSpec(memory_space=pl.ANY),   # data
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nblocks, RHS_BLOCK, block),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, RHS_BLOCK, x3.shape[2]), jnp.float32),
            pltpu.VMEM((2, K_pad, block), data3.dtype),
            pltpu.VMEM((RHS_BLOCK, block), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(x3, data3)
    # (nblocks, 8, block) -> (8, n)
    return jnp.swapaxes(y, 0, 1).reshape(RHS_BLOCK, nblocks * block)[:, :n]


def spmm_dia_mrhs_pallas(dia, X: Array, *, block: int = 4096,
                         interpret: bool = False) -> Array:
    """``Y = A @ X`` for diagonal storage with ``X (R, n)`` (R right-hand
    sides as rows; R is padded up to 8). Returns ``(R, n)``."""
    if isinstance(dia, SparseDIA):
        dia = prepare_dia(dia, block=block)
    n, m = dia.shape
    block = dia.block
    offsets = dia.offsets
    maxoff = max((abs(o) for o in offsets), default=0)
    pad = -(-max(maxoff, 1) // 128) * 128
    nblocks = dia.data3.shape[0]
    npad = nblocks * block

    X = jnp.asarray(X)
    squeeze = X.ndim == 1
    if squeeze:
        X = X[None, :]
    R = X.shape[0]
    if R > RHS_BLOCK:
        raise ValueError(f"at most {RHS_BLOCK} right-hand sides per call")
    Xp = jnp.zeros((RHS_BLOCK, npad + 2 * pad), jnp.float32)
    Xp = Xp.at[:R, pad:pad + m].set(X.astype(jnp.float32))
    # Overlapped windows, built once per call with static slices.
    x3 = jnp.stack([
        jax.lax.dynamic_slice_in_dim(Xp, b * block, block + 2 * pad, axis=1)
        for b in range(nblocks)])
    y = _spmm_mrhs(dia.data3, x3, offsets=offsets, n=n, block=block,
                   interpret=interpret)
    y = y[:R]
    return y[0] if squeeze else y
