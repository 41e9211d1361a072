"""Pallas TPU kernel: DIA (banded) SpMV in one streaming pass.

The XLA lowering of :func:`spsparse_tpu.ops.spmv_kernels.spmv_dia` performs
one slice-multiply-add per diagonal, each materializing a fresh copy of the
accumulator — ~3x the minimal HBM traffic. Worse, on this runtime each
Pallas *grid step* carries ~13 us of fixed overhead (measured: kernel time
was independent of the data volume in a grid-per-block design), so this
kernel uses a single grid step with an explicit double-buffered DMA
pipeline over row blocks: the next block's diagonal data streams from HBM
while the current block computes, x stays VMEM-resident, and y is written
straight into the VMEM output. Traffic = ``nnz*4 + n*8`` bytes — the
speed-of-light model for banded SpMV.

Layout contract: ``data (K, n)`` row-oriented DIA (``data[k, i] =
A[i, i+off_k]``, zero where out of range); ``x_pad (1, n + 2*pad)`` with
``pad`` a multiple of 128 ≥ max |offset| so every aligned superset-window
load is in bounds. Offsets are *static* (part of the format), so the
per-diagonal loop unrolls into shifted FMAs, with the sub-lane shifts done
in-register via ``pltpu.roll``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.dia import SparseDIA

Array = Any

__all__ = ["spmv_dia_pallas", "prepare_dia", "PreparedDIA"]


def diag_slice(dcur, k: int, block: int):
    """(rows, block) view of diagonal ``k`` from either data layout:
    packed 2D ``(rows, K*block)`` (f32 — no padding diagonals, the
    layout that makes the stream exactly ``nnz*4`` bytes) or padded 3D
    ``(rows, K_pad, block)`` (bf16 — Mosaic DMAs need 16-row sublane
    slices, which the 8-block step cannot give in 2D)."""
    if dcur.ndim == 3:
        return dcur[:, k, :]
    return dcur[:, k * block:(k + 1) * block]


def _dia_stream_kernel(xwin_ref, data_hbm, y_ref, scratch, sems, *,
                       offsets: tuple, pad: int, block: int, nblocks: int,
                       interpret: bool):
    # Layouts are chosen so every vector op runs at full sublane width —
    # (1, L) shapes use 1/8 of the VPU and made the roll-based shifts the
    # bottleneck (measured: bf16 data gave zero speedup). Eight row blocks
    # are processed per step:
    #   xwin_ref (1, npad + 2*pad): flat padded x, VMEM-resident; each
    #     step builds its 8 overlapping windows from aligned loads;
    #   data_hbm (nblocks, K, block): pre-blocked diagonal data, DMA'd 8
    #     blocks at a time (leading-dim slice — Mosaic cannot slice the
    #     minor dim of tiled HBM memrefs dynamically);
    #   y_ref (nblocks, block): full-sublane stores.
    K = len(offsets)
    L = block + 2 * pad
    roll = jnp.roll if interpret else pltpu.roll
    nsuper = nblocks // 8

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(i * 8, 8)], scratch.at[slot], sems.at[slot])

    get_dma(0, 0).start()

    def body(i, _):
        cur = i % 2

        @pl.when(i + 1 < nsuper)
        def _():
            get_dma((i + 1) % 2, i + 1).start()

        get_dma(cur, i).wait()
        # Build the 8 overlapping windows in-register from the flat padded
        # x (8 cheap (1,L) loads beat 128 XLA dynamic-slice kernels in the
        # caller, each of which pays launch overhead).
        w8 = jnp.concatenate(
            [xwin_ref[0:1, pl.ds(pl.multiple_of((i * 8 + r) * block, 128), L)]
             for r in range(8)], axis=0)               # (8, L)
        acc = jnp.zeros((8, block), jnp.float32)
        for k, off in enumerate(offsets):
            s = off + pad  # static, in [0, 2*pad]
            shifted = roll(w8, (L - s) % L, axis=1)[:, :block]
            acc = acc + diag_slice(scratch[cur], k,
                                   block).astype(jnp.float32) * shifted
        y_ref[pl.ds(i * 8, 8), :] = acc
        return 0

    jax.lax.fori_loop(0, nsuper, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("offsets", "n", "block", "interpret"))
def _spmv_dia_pallas(data3, x_pad, *, offsets: tuple, n: int, block: int,
                     interpret: bool = False) -> Array:
    nblocks = data3.shape[0]
    pad = (x_pad.shape[1] - nblocks * block) // 2
    y = pl.pallas_call(
        functools.partial(_dia_stream_kernel, offsets=offsets, pad=pad,
                          block=block, nblocks=nblocks, interpret=interpret),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # data stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, block), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 8) + data3.shape[1:], data3.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_pad, data3)
    return y.reshape(-1)[:n]


# --- autodiff -------------------------------------------------------------
# pallas_call has no reverse-mode rule, so the kernel gets an explicit VJP.
# Forward math (see _dia_stream_kernel):
#     y[j] = sum_k data_flat[k, j] * x_pad[0, pad + j + off_k],  j < npad
# hence
#     d_x_pad[0, pad+off_k+j] += data_flat[k, j] * g[j]      (A^T g, shifted)
#     d_data_flat[k, j]        = g[j] * x_pad[0, pad+off_k+j]
# Both are static-offset shifted products — one streaming XLA pass each, the
# same traffic order as the forward kernel.


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _spmv_dia_ad(data3, x_pad, offsets: tuple, n: int, block: int,
                 interpret: bool):
    return _spmv_dia_pallas(data3, x_pad, offsets=offsets, n=n,
                            block=block, interpret=interpret)


def _spmv_dia_ad_fwd(data3, x_pad, offsets, n, block, interpret):
    y = _spmv_dia_ad(data3, x_pad, offsets, n, block, interpret)
    return y, (data3, x_pad)


def _unblock_data(data3, block: int):
    """Either prepared layout -> row-per-diagonal ``(K_eff, npad)`` f32."""
    nblocks = data3.shape[0]
    if data3.ndim == 2:                       # packed: (nblocks, K*block)
        K_eff = data3.shape[1] // block
        d3 = data3.reshape(nblocks, K_eff, block)
    else:                                     # padded: (nblocks, K_pad, b)
        K_eff = data3.shape[1]
        d3 = data3
    return (jnp.swapaxes(d3, 0, 1).reshape(K_eff, nblocks * block)
            .astype(jnp.float32)), K_eff


def _reblock_data(d_data, data3, block: int):
    """Inverse of :func:`_unblock_data` (cast back to the stored dtype)."""
    nblocks = data3.shape[0]
    K_eff = d_data.shape[0]
    d3 = jnp.swapaxes(d_data.reshape(K_eff, nblocks, block), 0, 1)
    if data3.ndim == 2:
        d3 = d3.reshape(nblocks, K_eff * block)
    return d3.astype(data3.dtype)


def _spmv_dia_ad_bwd(offsets, n, block, interpret, res, g):
    data3, x_pad = res
    nblocks = data3.shape[0]
    npad = nblocks * block
    pad = (x_pad.shape[1] - npad) // 2
    data, K_eff = _unblock_data(data3, block)
    g_pad = jnp.zeros((npad,), jnp.float32).at[:n].set(
        g.astype(jnp.float32))
    x_flat = x_pad[0]
    d_x = jnp.zeros((x_pad.shape[1],), jnp.float32)
    d_rows = []
    for k, off in enumerate(offsets):
        s = pad + off  # static, >= 0 (pad >= max|offset|)
        d_x = d_x.at[s:s + npad].add(data[k] * g_pad)
        d_rows.append(g_pad * jax.lax.slice_in_dim(x_flat, s, s + npad))
    if len(offsets) < K_eff:  # zero-padded diagonal rows (sublane align)
        d_rows.extend([jnp.zeros((npad,), jnp.float32)]
                      * (K_eff - len(offsets)))
    d_data = jnp.stack(d_rows)                                 # (K_eff, npad)
    d_data3 = _reblock_data(d_data, data3, block)
    return d_data3, d_x[None, :].astype(x_pad.dtype)


_spmv_dia_ad.defvjp(_spmv_dia_ad_fwd, _spmv_dia_ad_bwd)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PreparedDIA:
    """Kernel-ready DIA operand: diagonal data re-blocked so each
    row-block step is one leading-dim DMA. f32 uses the PACKED 2D layout
    ``(nblocks, K*block)`` — diagonal k of block b at lanes
    ``[k*block, (k+1)*block)`` — which streams exactly ``nnz*4`` bytes
    (the padded 3D layout wasted ``(K_pad-K)/K`` of all HBM traffic:
    45% for the 11-diagonal bench matrix). bf16 keeps the padded 3D
    ``(nblocks, K_pad, block)`` layout (its DMAs need 16-row sublane
    slices that the 8-block step cannot express in 2D). Build once
    (``prepare_dia``), reuse across many SpMV calls."""

    data3: Array = dataclasses.field(metadata=dict(static=False))
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    block: int = dataclasses.field(metadata=dict(static=True))


def prepare_dia(dia: SparseDIA, *, block: int = 4096,
                dtype=jnp.float32) -> PreparedDIA:
    """``dtype=jnp.bfloat16`` halves the dominant HBM traffic term
    (the diagonal data); accumulation stays f32 in the kernel. The block
    count is rounded to a multiple of 8 (the kernel processes 8 row blocks
    per step at full sublane width)."""
    n, _ = dia.shape
    nblocks = -(-(-(-n // block)) // 8) * 8
    npad = nblocks * block
    data = dia.data.astype(dtype)
    if npad != n:
        data = jnp.pad(data, ((0, 0), (0, npad - n)))
    K = data.shape[0]
    if dtype == jnp.bfloat16:
        # Mosaic DMAs require the sublane (second-to-minor) extent to be
        # a multiple of the dtype's tile height (16 for bf16): pad the
        # diagonal count with zero rows and keep the 3D layout.
        K_pad = -(-K // 16) * 16
        if K_pad != K:
            data = jnp.pad(data, ((0, K_pad - K), (0, 0)))
        data3 = jnp.swapaxes(data.reshape(K_pad, nblocks, block), 0, 1)
    else:
        # Packed 2D layout: no padding diagonals, stream = nnz*4 bytes.
        data3 = (data.reshape(K, nblocks, block).swapaxes(0, 1)
                 .reshape(nblocks, K * block))
    return PreparedDIA(data3=data3,
                       offsets=tuple(int(o) for o in dia.offsets),
                       shape=dia.shape, block=block)


def spmv_dia_pallas(dia, x: Array, *, block: int = 4096,
                    interpret: bool = False) -> Array:
    """``y = A @ x`` for diagonal storage via the streaming Pallas kernel.

    Accepts a :class:`SparseDIA` (re-blocked on the fly — fine for one-off
    calls) or a :class:`PreparedDIA` (preferred inside iteration loops so
    the re-blocking transpose is paid once).
    """
    if isinstance(dia, SparseDIA):
        dia = prepare_dia(dia, block=block)
    n, m = dia.shape
    offsets = dia.offsets
    block = dia.block
    maxoff = max((abs(o) for o in offsets), default=0)
    pad = -(-max(maxoff, 1) // 128) * 128
    npad = dia.data3.shape[0] * block
    x_pad = jnp.zeros((1, npad + 2 * pad), jnp.float32)
    x_pad = x_pad.at[0, pad:pad + m].set(x.astype(jnp.float32))
    return _spmv_dia_ad(dia.data3, x_pad, offsets, n, block, interpret)
