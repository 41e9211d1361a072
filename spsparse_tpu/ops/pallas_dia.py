"""Pallas TPU kernel: DIA (banded) SpMV in one streaming pass.

The XLA lowering of :func:`spsparse_tpu.ops.spmv_kernels.spmv_dia` performs
one slice-multiply-add per diagonal, each materializing a fresh copy of the
accumulator — ~3x the minimal HBM traffic. This kernel streams the diagonal
data exactly once, keeps the (padded) x vector VMEM-resident, and writes y
once: traffic = ``nnz*4 + n*8`` bytes, the speed-of-light model for banded
SpMV.

Layout contract: ``data (K, n)`` row-oriented DIA (``data[k, i] =
A[i, i+off_k]``, zero where out of range); ``x_pad (1, n + 2*pad)`` with
``pad = max(|offsets|)`` zeros on both sides so every shifted window read
is in bounds. Offsets are *static* (part of the format), so the per-
diagonal loop unrolls at trace time into pure VPU shifted-FMA.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.dia import SparseDIA

Array = Any

__all__ = ["spmv_dia_pallas"]


def _dia_kernel(x_ref, data_ref, y_ref, *, offsets: tuple, pad: int,
                block: int, interpret: bool):
    # Mosaic only vectorizes lane-aligned loads, so we load one aligned
    # superset window w = x_pad[r0 : r0 + block + 2*pad] (pad is a multiple
    # of 128) and realize each diagonal's small static shift in-register
    # with a roll — no unaligned memory access anywhere.
    b = pl.program_id(0)
    r0 = pl.multiple_of(b * block, 128)
    w = x_ref[0:1, pl.ds(r0, block + 2 * pad)]
    roll = jnp.roll if interpret else pltpu.roll
    L = block + 2 * pad
    acc = jnp.zeros((1, block), jnp.float32)
    for k, off in enumerate(offsets):
        s = off + pad  # static, in [0, 2*pad]
        # want shifted[i] = w[i + s]; roll-left by s == roll-right by L - s
        # (pltpu.roll only accepts non-negative shifts)
        shifted = roll(w, (L - s) % L, axis=1)[:, :block]
        acc = acc + data_ref[k, :][None, :].astype(jnp.float32) * \
            shifted.astype(jnp.float32)
    y_ref[...] = acc


@functools.partial(jax.jit,
                   static_argnames=("offsets", "n", "block", "interpret"))
def _spmv_dia_pallas(data, x_pad, *, offsets: tuple, n: int, block: int,
                     interpret: bool = False) -> Array:
    pad = (x_pad.shape[1] - data.shape[1]) // 2
    nblocks = pl.cdiv(n, block)
    y = pl.pallas_call(
        functools.partial(_dia_kernel, offsets=offsets, pad=pad,
                          block=block, interpret=interpret),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((len(offsets), block), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nblocks * block), jnp.float32),
        interpret=interpret,
    )(x_pad, data)
    return y[0, :n]


def spmv_dia_pallas(dia: SparseDIA, x: Array, *, block: int = 8192,
                    interpret: bool = False) -> Array:
    """``y = A @ x`` for diagonal storage via the streaming Pallas kernel.

    Requires ``n == ncols`` padding handled here: x is zero-padded by the
    max |offset| on both sides, and ``data`` is zero-padded along rows to a
    multiple of ``block``.
    """
    n, m = dia.shape
    offsets = tuple(int(o) for o in dia.offsets)
    maxoff = max((abs(o) for o in offsets), default=0)
    # pad must be a multiple of 128 so the aligned superset-window load
    # starts at a lane boundary (see _dia_kernel).
    pad = -(-max(maxoff, 1) // 128) * 128
    nblocks = -(-n // block)
    npad = nblocks * block
    data = dia.data.astype(jnp.float32)
    if npad != n:
        data = jnp.pad(data, ((0, 0), (0, npad - n)))
    x_pad = jnp.zeros((1, npad + 2 * pad), jnp.float32)
    x_pad = x_pad.at[0, pad:pad + m].set(x.astype(jnp.float32))
    return _spmv_dia_pallas(data, x_pad, offsets=offsets, n=n, block=block,
                            interpret=interpret)
