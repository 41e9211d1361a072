"""Unstructured (uniform-random) SpMV: slab-gather + static shuffle + ELL
reduce.

The TPU has no fast arbitrary gather or scatter (XLA's run per element at
~0.09 Gelem/s — docs/PERFORMANCE.md), so the round-3 general path capped
at ~0.1 Gnnz/s. This module rebuilds unstructured ``y = A @ x`` from the
three primitives the hardware DOES do fast:

1. **Slab lane-gather** (Pallas): entries are grouped at prepare time by
   column block (128 columns) into ``(8, 128)`` batches whose sublane
   ``s`` holds entries of column block ``octet*8 + s``; the kernel keeps
   the matching 8-row slab of ``x2d = x.reshape(ncb, 128)`` as its block
   input and gathers with in-kernel lane-axis ``take_along_axis``
   (measured ~1 Telem/s — the only fast gather Mosaic lowers), then
   multiplies by the entry values. Per-column-block entry counts (~nnz /
   ncb) set the lane fill; uniform-random matrices at >= ~8 nnz/row and
   >= 64K columns fill batches >90%.

2. **Static shuffle**: products emerge in column-block order; the
   reduction needs row order. The permutation is STATIC (pattern-only),
   and is applied by one sort keyed by the precomputed destination slot
   (``core.chunksort`` keeps it compile-bounded at any size). This is the
   honest cost center: sort bandwidth (~0.5-1 Gelem/s) bounds the whole
   op, which is why this path reaches single-digit Gnnz/s, not the HBM
   roofline — no lowerable primitive moves 4-byte elements across >128-
   lane windows faster (Mosaic has no vector scatter, no sublane gather,
   and per-segment DMA dies on descriptor overhead at ~10-entry runs).

3. **ELL reduce**: destination slots form a padded ``(virtual_rows, K)``
   grid (heavy rows pre-split at prepare; their partial sums are
   scatter-added at the end — a few % of rows), so the row reduction is
   one dense ``sum`` over the K axis — no segment scan, no row_ptr
   gathers.

Reference anchor: this is the general-matrix performance story of the
``multiply`` MV contract (``multiply_sparse.hpp:281-365``); the banded /
blocked / packable cases ride the DIA/BSR/tiled kernels instead (see
``ops.spmm.best_spmv`` routing).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.coo import SparseCOO
from ..core.errors import spsparse_error

Array = Any

__all__ = ["PreparedShuffleSpMV", "prepare_shuffle_spmv", "spmv_shuffle"]

_LANES = 128
_SUBL = 8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PreparedShuffleSpMV:
    """Static gather/shuffle layout for one sparsity pattern.

    ``octet (B,)`` x2d block-row per gather batch; ``idx/vals (B, 8,
    128)`` lane indices and entry values (padding: idx 0, vals 0);
    ``dest (B*1024,)`` destination ELL slot per gather slot (padding ->
    ``n_slots`` sentinel, drops in the shuffle); ``filler_dest (F,)``
    the unoccupied ELL slots (filled with zeros so the sorted stream is
    exactly the ELL grid); ``extra_rows (E,)`` real-row targets of the
    split virtual rows (``extra_vrows`` their virtual indices)."""

    octet: Array = dataclasses.field(metadata=dict(static=False))
    idx: Array = dataclasses.field(metadata=dict(static=False))
    vals: Array = dataclasses.field(metadata=dict(static=False))
    dest: Array = dataclasses.field(metadata=dict(static=False))
    filler_dest: Array = dataclasses.field(metadata=dict(static=False))
    extra_rows: Array = dataclasses.field(metadata=dict(static=False))
    extra_vrows: Array = dataclasses.field(metadata=dict(static=False))
    n_vrows: int = dataclasses.field(metadata=dict(static=True))
    ell_k: int = dataclasses.field(metadata=dict(static=True))
    shape: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def n_batches(self) -> int:
        return self.idx.shape[0]

    @property
    def n_slots(self) -> int:
        return self.n_vrows * self.ell_k


def prepare_shuffle_spmv(a: SparseCOO, *, ell_k: int = 16
                         ) -> PreparedShuffleSpMV:
    """Host-side layout build (eager; pattern-only, reusable across value
    updates of the same pattern via :func:`update_values` semantics —
    rebuild for new patterns)."""
    if a.rank != 2:
        spsparse_error(-1, "prepare_shuffle_spmv requires a rank-2 array")
    # host-side consolidation (prepare is eager/host anyway): avoids a
    # device consolidate whose large-shape program would also force the
    # x64 question — Pallas grid kernels fail Mosaic lowering when traced
    # under jax_enable_x64 on this stack (probes/probe_spmv_shuffle_r4)
    nrows, ncols = (int(s) for s in a.shape)
    live = np.asarray(a.valid_mask())
    r0 = np.asarray(a.indices[:, 0], np.int64)[live]
    c0 = np.asarray(a.indices[:, 1], np.int64)[live]
    v0 = np.asarray(a.vals, np.float32)[live]
    key = r0 * ncols + c0
    uk, inv = np.unique(key, return_inverse=True)
    vals = np.zeros(len(uk), np.float32)
    np.add.at(vals, inv, v0)
    rows = (uk // ncols).astype(np.int64)
    cols = (uk % ncols).astype(np.int64)
    nnz = len(uk)

    # ---- destination side: split heavy rows into virtual rows of <= K
    order = np.argsort(rows, kind="stable")
    rows_s, cols_s, vals_s = rows[order], cols[order], vals[order]
    cnt = np.bincount(rows_s, minlength=nrows)
    first = np.concatenate([[0], np.cumsum(cnt)])[:-1]
    within = np.arange(nnz) - first[rows_s]            # k within its row
    n_extra_per = np.maximum(0, -(-cnt // ell_k) - 1)  # ceil(cnt/K)-1
    extra_base = nrows + np.concatenate(
        [[0], np.cumsum(n_extra_per)])[:-1]
    n_vrows = nrows + int(n_extra_per.sum())
    part = within // ell_k
    vrow = np.where(part == 0, rows_s, extra_base[rows_s] + part - 1)
    dest_slot = vrow * ell_k + within % ell_k          # unique per entry
    # back-map for the entries as stored in COLUMN order below
    inv = np.empty(nnz, np.int64)
    inv[order] = np.arange(nnz)
    dest_of_entry = dest_slot[inv]
    extra_vrows = np.arange(nrows, n_vrows, dtype=np.int64)
    extra_rows = np.repeat(np.arange(nrows), n_extra_per)

    # ---- source side: gather batches grouped by column-block octet
    ncb = -(-ncols // _LANES)
    n_oct = -(-ncb // _SUBL)
    cb = cols // _LANES
    corder = np.argsort(cb, kind="stable")
    cb_s = cb[corder]
    # lane-row index of each entry within its column block
    cb_cnt = np.bincount(cb_s, minlength=ncb)
    cb_first = np.concatenate([[0], np.cumsum(cb_cnt)])[:-1]
    w = np.arange(nnz) - cb_first[cb_s]
    lrow = w // _LANES                                 # which lane-row
    lpos = w % _LANES
    # batches per octet = max lane-rows over its 8 column blocks
    rows_per_cb = -(-cb_cnt // _LANES)
    rpc = rows_per_cb.copy()
    rpc.resize(n_oct * _SUBL)                          # pad to octets
    batches_per_oct = np.maximum(rpc.reshape(n_oct, _SUBL).max(axis=1), 0)
    oct_first = np.concatenate([[0], np.cumsum(batches_per_oct)])[:-1]
    B = max(int(batches_per_oct.sum()), 1)

    idx = np.zeros((B, _SUBL, _LANES), np.int32)
    v8 = np.zeros((B, _SUBL, _LANES), np.float32)
    n_slots = n_vrows * ell_k
    dest = np.full((B, _SUBL, _LANES), n_slots, np.int64)  # sentinel
    b_of = oct_first[cb_s // _SUBL] + lrow
    s_of = cb_s % _SUBL
    idx[b_of, s_of, lpos] = (cols[corder] % _LANES).astype(np.int32)
    v8[b_of, s_of, lpos] = vals[corder]
    dest[b_of, s_of, lpos] = dest_of_entry[corder]
    octet = np.repeat(np.arange(n_oct), batches_per_oct).astype(np.int32)
    if octet.size == 0:
        octet = np.zeros(1, np.int32)

    # ---- filler slots (unoccupied ELL positions)
    occ = np.zeros(n_slots, bool)
    occ[dest_slot] = True
    filler = np.nonzero(~occ)[0]

    # padding gather slots get DISTINCT above-range sentinels so the
    # whole dest stream is a permutation fragment (globally unique) —
    # that lets the shuffle ride chunked_sort_unique directly, with no
    # (key, position) composite and hence no x64 requirement
    dest = dest.reshape(-1)
    pad_mask = dest == n_slots
    dest[pad_mask] = n_slots + np.arange(int(pad_mask.sum()))
    total_ids = n_slots + int(pad_mask.sum()) + 1
    dt = np.int64 if total_ids >= 2 ** 31 else np.int32
    return PreparedShuffleSpMV(
        octet=jnp.asarray(octet), idx=jnp.asarray(idx),
        vals=jnp.asarray(v8),
        dest=jnp.asarray(dest.astype(dt)),
        filler_dest=jnp.asarray(filler.astype(dt)),
        extra_rows=jnp.asarray(extra_rows.astype(np.int32)),
        extra_vrows=jnp.asarray(extra_vrows.astype(np.int32)),
        n_vrows=int(n_vrows), ell_k=int(ell_k),
        shape=(nrows, ncols))


def _gather_kernel(oct_ref, x_ref, idx_ref, vals_ref, out_ref):
    # trace with x64 off: under jax_enable_x64, take_along_axis builds
    # int64 index helpers internally and Mosaic rejects 64-bit types
    with jax.enable_x64(False):
        g = jnp.take_along_axis(x_ref[...], idx_ref[0], axis=1)
    out_ref[0] = vals_ref[0] * g


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_products(octet, idx, vals, x2d, *, interpret: bool):
    B = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((_SUBL, _LANES), lambda b, o: (o[b], 0)),
            pl.BlockSpec((1, _SUBL, _LANES), lambda b, o: (b, 0, 0)),
            pl.BlockSpec((1, _SUBL, _LANES), lambda b, o: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _SUBL, _LANES), lambda b, o: (b, 0, 0)),
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, _SUBL, _LANES), jnp.float32),
        interpret=interpret,
    )(octet, x2d, idx, vals)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_shuffle(prep: PreparedShuffleSpMV, x: Array, *,
                 interpret: bool = False) -> Array:
    """``y = A @ x`` through the shuffle layout (f32). jit-compatible;
    one compile per pattern geometry."""
    nrows, ncols = prep.shape
    ncb = -(-ncols // _LANES)
    n_oct = -(-ncb // _SUBL)
    x2d = jnp.pad(jnp.asarray(x, jnp.float32),
                  (0, n_oct * _SUBL * _LANES - ncols)).reshape(-1, _LANES)
    p = _gather_products(prep.octet, prep.idx, prep.vals, x2d,
                         interpret=interpret).reshape(-1)
    # static shuffle: sort (dest, p); filler slots carry 0, padding slots
    # carry distinct above-range sentinels and fall off the end. dest is
    # globally unique, so the compile-bounded PSRS applies directly (no
    # x64 composite needed).
    dest = jnp.concatenate([prep.dest, prep.filler_dest])
    pz = jnp.concatenate([p, jnp.zeros(prep.filler_dest.shape[0],
                                       jnp.float32)])
    from ..core import chunksort
    if dest.shape[0] > chunksort.ENGAGE_ELEMS:
        sentinel = jnp.iinfo(dest.dtype).max
        _, (p_sorted,) = chunksort.chunked_sort_unique(
            dest, (pz,), sentinel=sentinel)
    else:
        p_sorted = jax.lax.sort((dest, pz), num_keys=1,
                                is_stable=False)[1]
    p_ell = p_sorted[: prep.n_slots].reshape(prep.n_vrows, prep.ell_k)
    yv = jnp.sum(p_ell, axis=1)
    y = yv[:nrows]
    if prep.extra_rows.shape[0]:
        y = y.at[prep.extra_rows].add(yv[prep.extra_vrows])
    return y
