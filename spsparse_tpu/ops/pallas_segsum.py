"""Pallas TPU kernel: segmented merge-and-accumulate (CSR row reduction).

The hot inner step of CSR SpMV/SpMM and of consolidate's merge phase is a
*segmented sum*: given per-entry products in row-pointer order, produce
per-row totals. XLA lowers this as scatter-add, which serializes on
duplicate indices; this kernel instead processes a block of R rows per
grid step and computes all R row sums as one ``(R, E) @ (E,)`` masked
matmul — boundary masks built from the row pointers — so the reduction
runs on the MXU at full tile utilization with zero atomics. This is the
"segmented merge-and-accumulate" kernel called for by the project north
star (BASELINE.json).

Mosaic constraints shape the plumbing: dynamic VMEM slicing is not
lowerable, so the per-block entry offset comes in via scalar prefetch
(``PrefetchScalarGridSpec``) and is 128-aligned before use as a DMA
origin; the row-pointer bounds arrive as two *blocked* VMEM inputs
(``row_ptr[:-1]`` / ``row_ptr[1:]``), avoiding in-kernel slices entirely.

Blocking contract: grid step ``b`` covers rows ``[b*R, (b+1)*R)`` and DMAs
a 1024-aligned entry window (origin ``align1024(row_ptr[b*R])``, length
the next multiple of 1024 covering ``E`` entries plus alignment skew); the
static ``E`` must be >= the max entries under any R consecutive rows
(``entries_per_block``). ``pad_products`` pads the product buffer so
trailing windows stay in bounds. Row-pointer bounds ship as 2-D
``(nblocks, R)`` operands because XLA tiles 1-D i32 at T(1024), which a
(R,) block cannot match.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.structure import SparseCSR

Array = Any

__all__ = ["segmented_row_sums", "spmv_csr_pallas", "pad_products",
           "max_entries_per_rowblock"]


def _segsum_kernel(starts_ref, rp_lo_ref, rp_hi_ref, prod_hbm, y_ref,
                   scratch, sem, *, rows_per_block: int,
                   entries_per_block: int):
    b = pl.program_id(0)
    R, E = rows_per_block, entries_per_block
    # 1-D f32 HBM slices tile at 1024 elements: both the DMA origin and
    # window length must be 1024-aligned.
    W = -(-(E + 1024) // 1024) * 1024
    start = starts_ref[b]
    start_al = (start // 1024) * 1024

    dma = pltpu.make_async_copy(
        prod_hbm.at[pl.ds(start_al, W)], scratch, sem)
    dma.start()

    # Row-boundary mask while the DMA is in flight: window slot e holds the
    # product of global entry start_al + e, which belongs to row r iff
    # rp_lo[r] <= start_al + e < rp_hi[r].
    e_ids = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1) + start_al
    lo = jax.lax.broadcast_in_dim(rp_lo_ref[0, 0, :], (R, W), (0,))
    hi = jax.lax.broadcast_in_dim(rp_hi_ref[0, 0, :], (R, W), (0,))
    mask = ((e_ids >= lo) & (e_ids < hi)).astype(jnp.float32)

    dma.wait()
    y_ref[0, 0, :] = jax.lax.dot_general(
        mask, scratch[...].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def pad_products(prod: Array, entries_per_block: int) -> Array:
    """Zero-pad the product vector so every block window stays in bounds
    (window = 1024-aligned length covering E entries plus alignment skew)."""
    w = -(-(entries_per_block + 1024) // 1024) * 1024
    return jnp.pad(prod, (0, w + 1024))


@functools.partial(jax.jit, static_argnames=("rows_per_block",
                                             "entries_per_block", "nrows",
                                             "interpret"))
def segmented_row_sums(prod: Array, row_ptr: Array, *, nrows: int,
                       rows_per_block: int, entries_per_block: int,
                       interpret: bool = False) -> Array:
    """Per-row sums of ``prod`` (row-pointer order) via the Pallas kernel.

    ``prod`` must already be padded (``pad_products``); ``row_ptr`` is the
    int32 CSR pointer array of length >= nrows+1.
    """
    R, E = rows_per_block, entries_per_block
    nblocks = pl.cdiv(nrows, R)
    rp_needed = nblocks * R + 1
    if row_ptr.shape[0] < rp_needed:
        row_ptr = jnp.concatenate([
            row_ptr,
            jnp.broadcast_to(row_ptr[-1], (rp_needed - row_ptr.shape[0],))])
    row_ptr = row_ptr.astype(jnp.int32)
    # (nblocks, 1, R) layouts blocked only on the leading dim: 1-D blocked
    # operands would need 1024-wide blocks (XLA tiles 1-D i32 at T(1024)),
    # and 2-D (1, R) blocks violate the sublane-divisibility rule; a
    # leading-dim-only block sidesteps both.
    rp_lo = row_ptr[: nblocks * R].reshape(nblocks, 1, R)
    rp_hi = row_ptr[1: nblocks * R + 1].reshape(nblocks, 1, R)
    block_starts = row_ptr[0: nblocks * R: R]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 1, R), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, 1, R), lambda b, s: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # prod stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 1, R), lambda b, s: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((-(-(E + 1024) // 1024) * 1024,), prod.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    y = pl.pallas_call(
        functools.partial(_segsum_kernel, rows_per_block=R,
                          entries_per_block=E),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks, 1, R), jnp.float32),
        interpret=interpret,
    )(block_starts, rp_lo, rp_hi, prod)
    return y.reshape(-1)[:nrows]


def max_entries_per_rowblock(row_ptr, rows_per_block: int) -> int:
    """Host-side: max entry count under any aligned block of R rows."""
    rp = np.asarray(row_ptr)
    nrows = rp.shape[0] - 1
    R = rows_per_block
    nblocks = -(-nrows // R)
    pad = nblocks * R + 1 - rp.shape[0]
    if pad > 0:
        rp = np.concatenate([rp, np.full(pad, rp[-1], rp.dtype)])
    starts = rp[0:nblocks * R:R]
    ends = rp[R:nblocks * R + 1:R]
    return int((ends - starts).max(initial=0))


def spmv_csr_pallas(csr: SparseCSR, x: Array, *, rows_per_block: int = 256,
                    entries_per_block: int | None = None,
                    interpret: bool = False) -> Array:
    """CSR SpMV with XLA gather for ``x[cols]`` and the Pallas segmented-sum
    kernel for the row reduction (replacing XLA's scatter-add)."""
    if entries_per_block is None:
        entries_per_block = max(
            max_entries_per_rowblock(csr.row_ptr, rows_per_block), 8)
        entries_per_block = -(-entries_per_block // 128) * 128
    prod = csr.vals * jnp.take(x, csr.cols, mode="fill", fill_value=0)
    prod = jnp.where(csr.valid_mask(), prod, 0).astype(jnp.float32)
    prod = pad_products(prod, entries_per_block)
    return segmented_row_sums(
        prod, csr.row_ptr, nrows=csr.nrows, rows_per_block=rows_per_block,
        entries_per_block=entries_per_block, interpret=interpret)
