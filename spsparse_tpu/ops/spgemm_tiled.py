"""Tiled MXU SpGEMM — block-structured sparse x sparse on the matrix unit.

The general ESC SpGEMM (:mod:`spsparse_tpu.ops.multiply`) is sort-bound on
TPU: every elementary product goes through two stable ``lax.sort`` passes
at ~0.3-0.5 Gelem/s, which caps it ~400x under the HBM roofline (measured,
``docs/PERFORMANCE.md``).  For matrices whose nonzeros cluster into a
sparse pattern of dense(ish) 128x128 tiles — regridding / conservative-
interpolation operators, banded products, mesh couplings — the TPU-native
formulation is *block Gustavson on the MXU*: match operand tiles on the
contraction block index (host-side, static pattern), batch the matching
128x128 tile products onto the systolic array, and segment-sum them into
the (sparse) set of occupied output tiles.  No per-entry sort, no gather;
the only data-dependent step is the final (optional) extraction of
nonzero entries back to COO.

    C = A @ B           pairs (ta, tb) with A.tile_col[ta] == B.tile_row[tb]
    C = A @ B^T         pairs (ta, tb) with A.tile_col[ta] == B.tile_col[tb]
    out tile of a pair: (A.tile_row, B.tile_col or B.tile_row)

Two device paths with identical semantics:

* :func:`spgemm_tiled_xla` — gathered batched matmul + ``segment_sum``
  (runs anywhere; materializes the P x 128 x 128 product stream in HBM).
* :func:`spgemm_tiled_pallas` — one grid step per pair, operand tiles
  DMA'd by scalar-prefetched block ids, products accumulated in VMEM and
  each output tile written exactly once (pairs are plan-sorted by output
  tile).  HBM traffic = 2 operand tiles in per pair + 1 tile out per
  output tile.

Duplicate semantics are consolidate(ADD) — block accumulation sums
everything — and exact zeros are dropped at COO extraction, matching the
reference multiply contract (``multiply_sparse.hpp:238-243``: zero dot
products are not emitted).  This module is this framework's own design;
the reference has no tiled/blocked counterpart to cite.
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

from ..core.coo import SparseCOO, round_up_pow2
from ..core.errors import SpSparseError
from ..core.tiled import SparseTiledCOO, TILE, to_tiled

Array = Any

__all__ = ["TiledBlocks", "densify_tiled", "TiledGemmPlan",
           "plan_tiled_spgemm", "spgemm_tiled_xla", "spgemm_tiled_pallas",
           "spgemm_tiled", "tiled_blocks_to_coo"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TiledBlocks:
    """Sparse pattern of dense 128x128 blocks (flat layout).

    ``tile_row/tile_col (T,)`` int32 block coordinates; ``blocks
    (T, TILE, TILE)`` f32/bf16 dense blocks (zero-filled outside the
    stored entries and outside ``shape``). All ``T`` blocks are live,
    with one exception: an EMPTY input is represented as a single zero
    block at sentinel coordinates (= extents) so shapes stay static —
    consumers drop it (OOB scatters drop; the pair planner masks
    sentinels; to_prepared_dense filters ``tile_row < nbrows``).
    """

    tile_row: Array = dataclasses.field(metadata=dict(static=False))
    tile_col: Array = dataclasses.field(metadata=dict(static=False))
    blocks: Array = dataclasses.field(metadata=dict(static=False))
    shape: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return self.blocks.shape[0]

    @property
    def nbrows(self) -> int:
        return -(-self.shape[0] // TILE)

    @property
    def nbcols(self) -> int:
        return -(-self.shape[1] // TILE)

    def to_dense(self) -> Array:
        nr, nc = self.nbrows * TILE, self.nbcols * TILE
        dense = jnp.zeros((nr // TILE, nc // TILE, TILE, TILE),
                          jnp.promote_types(self.blocks.dtype, jnp.float32))
        dense = dense.at[self.tile_row, self.tile_col].add(
            self.blocks.astype(dense.dtype))
        dense = dense.transpose(0, 2, 1, 3).reshape(nr, nc)
        return dense[: self.shape[0], : self.shape[1]]

    def to_prepared_dense(self, dtype=None):
        """Row-grouped layout for the dense-block SpMM kernel (host-side,
        eager) — lets a tiled-SpGEMM result feed ``Y = C @ X`` directly
        on the MXU without a COO round trip."""
        from .pallas_tiled import PreparedTiledDense
        tr = np.asarray(self.tile_row)
        tc = np.asarray(self.tile_col)
        blocks = np.asarray(self.blocks)
        nbr, nbc = self.nbrows, self.nbcols
        live = tr < nbr
        counts = np.bincount(tr[live], minlength=nbr)
        Rt = max(int(counts.max(initial=1)), 1)
        est = nbr * Rt * TILE * TILE * blocks.dtype.itemsize
        if est > 8 << 30:
            raise SpSparseError(
                f"to_prepared_dense would materialize {est >> 30} GiB of "
                f"row-grouped blocks (nbr x Rt = {nbr} x {Rt}); extract "
                "to COO and use the one-hot kernel for such layouts")
        tcols = np.full((nbr, Rt), nbc, np.int32)
        out = np.zeros((nbr, Rt, TILE, TILE), blocks.dtype)
        # Vectorized fill (same slot-from-sorted-rows trick as
        # prepare_tiled_rows): group live tiles by block row with one
        # stable sort, then one fancy-indexed write per array.
        order = np.argsort(np.where(live, tr, nbr), kind="stable")
        order = order[: int(live.sum())]
        trs = tr[order]
        slot = np.arange(trs.size) - np.searchsorted(trs, trs, side="left")
        tcols[trs, slot] = tc[order]
        np.add.at(out, (trs, slot), blocks[order])
        prep = PreparedTiledDense(tcols=jnp.asarray(tcols),
                                  blocks=jnp.asarray(out),
                                  shape=self.shape)
        return prep if dtype is None else dataclasses.replace(
            prep, blocks=prep.blocks.astype(dtype))


def densify_tiled(tl: SparseTiledCOO, *, dtype=jnp.float32) -> TiledBlocks:
    """``SparseTiledCOO`` -> flat dense blocks (host-side, eager).

    Duplicate in-tile offsets accumulate (consolidate(ADD) semantics,
    same as :func:`to_tiled`'s contract).
    """
    nt = int(tl.n_tiles)
    tr = np.asarray(tl.tile_row)[:nt]
    tc = np.asarray(tl.tile_col)[:nt]
    rows = np.asarray(tl.rows)[:nt].astype(np.int64)
    cols = np.asarray(tl.cols)[:nt].astype(np.int64)
    vals = np.asarray(tl.vals)[:nt].astype(np.float32)
    blocks = np.zeros((max(nt, 1), TILE, TILE), np.float32)
    t_of = np.repeat(np.arange(max(nt, 1))[:nt], rows.shape[1] if nt else 0)
    np.add.at(blocks, (t_of, rows.reshape(-1), cols.reshape(-1)),
              vals.reshape(-1))
    if nt == 0:
        # Empty input still needs one (zero) block for static shapes; give
        # it SENTINEL coordinates (= extents) so plan_tiled_spgemm never
        # pairs it (a live-looking (0,0) filler used to generate spurious
        # pairs and register junk output tiles in the distributed
        # planner) and to_dense's scatter drops it (OOB indices drop).
        tr = np.asarray([tl.nbrows], np.int32)
        tc = np.asarray([tl.nbcols], np.int32)
    return TiledBlocks(tile_row=jnp.asarray(tr, jnp.int32),
                       tile_col=jnp.asarray(tc, jnp.int32),
                       blocks=jnp.asarray(blocks, dtype), shape=tl.shape)


@dataclasses.dataclass(frozen=True)
class TiledGemmPlan:
    """Static (host-side) pair plan for a tiled SpGEMM.

    ``pa/pb (P,)`` operand block indices, ``oid (P,)`` output-block index
    per pair (pairs sorted by ``oid``; each output block's pairs are
    contiguous), ``out_tile_row/out_tile_col (T_out,)`` output block
    coordinates (row-major sorted), ``transpose_b`` the contraction mode,
    ``out_shape`` the result extents.
    """

    pa: np.ndarray
    pb: np.ndarray
    oid: np.ndarray
    out_tile_row: np.ndarray
    out_tile_col: np.ndarray
    transpose_b: bool
    out_shape: tuple

    @property
    def n_pairs(self) -> int:
        return self.pa.shape[0]

    @property
    def n_out_tiles(self) -> int:
        return self.out_tile_row.shape[0]


def plan_tiled_spgemm(A: TiledBlocks, B: TiledBlocks, *,
                      transpose_b: bool = False) -> TiledGemmPlan:
    """Host-side pair matching on the static tile pattern.

    The plan depends only on the *pattern* (tile coordinates), so one plan
    serves any number of value updates under one compiled program.
    """
    atr = np.asarray(A.tile_row, np.int64)
    atc = np.asarray(A.tile_col, np.int64)
    btr = np.asarray(B.tile_row, np.int64)
    btc = np.asarray(B.tile_col, np.int64)
    if transpose_b:
        k_b, j_b = btc, btr
        inner_a, inner_b = A.shape[1], B.shape[1]
        out_shape = (A.shape[0], B.shape[0])
    else:
        k_b, j_b = btr, btc
        inner_a, inner_b = A.shape[1], B.shape[0]
        out_shape = (A.shape[0], B.shape[1])
    if inner_a != inner_b:
        raise SpSparseError(
            f"inner dimension mismatch: {inner_a} vs {inner_b} "
            "(reference raises via spsparse_error, "
            "multiply_sparse.hpp:172-174)")

    # Match A.tile_col == k_b via sort + searchsorted (host, numpy).
    # Sentinel-coordinate tiles (the empty-input fillers from
    # densify_tiled, coords = extents) must never pair — even with each
    # other — so mask them out of both sides of the join.
    nb_inner = -(-inner_a // TILE)
    atc = np.where(atc < nb_inner, atc, nb_inner + 1)
    k_b = np.where(k_b < nb_inner, k_b, nb_inner + 2)
    order_b = np.argsort(k_b, kind="stable")
    kb_s = k_b[order_b]
    lo = np.searchsorted(kb_s, atc, side="left")
    hi = np.searchsorted(kb_s, atc, side="right")
    cnt = hi - lo
    pa = np.repeat(np.arange(atr.shape[0]), cnt)
    if pa.size:
        within = np.arange(pa.size) - np.repeat(
            np.cumsum(cnt) - cnt, cnt)
        pb = order_b[np.repeat(lo, cnt) + within]
    else:
        pb = np.zeros(0, np.int64)

    nbc_out = -(-out_shape[1] // TILE)
    out_key = atr[pa] * nbc_out + j_b[pb]
    order = np.argsort(out_key, kind="stable")
    pa, pb, out_key = pa[order], pb[order], out_key[order]
    uniq, oid = np.unique(out_key, return_inverse=True)
    # Serpentine pair order within each output-tile group: even groups
    # ascend by pa, odd groups descend. Adjacent groups of one output
    # block row draw pairs from the same A block row, so the boundary
    # pair often reuses the previous group's A tile — Mosaic's pipeline
    # skips a DMA whose block index is unchanged between consecutive
    # grid steps, trimming operand refetches at zero model cost.
    if pa.size:
        pa_max = int(pa.max(initial=0)) + 1
        within = np.where(oid % 2 == 1, pa_max - 1 - pa, pa)
        sorder = np.lexsort((within, oid))
        pa, pb, oid = pa[sorder], pb[sorder], oid[sorder]
    return TiledGemmPlan(
        pa=pa.astype(np.int32), pb=pb.astype(np.int32),
        oid=oid.astype(np.int32),
        out_tile_row=(uniq // nbc_out).astype(np.int32),
        out_tile_col=(uniq % nbc_out).astype(np.int32),
        transpose_b=transpose_b, out_shape=out_shape)


def _pair_dot(a, b, transpose_b: bool):
    # bf16 operands accumulate in f32 on the MXU (preferred_element_type);
    # f32 operands use HIGHEST (6-pass) to keep oracle-level accuracy.
    prec = (jax.lax.Precision.DEFAULT if a.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    contract = ((1,), (1,)) if transpose_b else ((1,), (0,))
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


@functools.partial(jax.jit, static_argnames=("transpose_b", "n_out"))
def _spgemm_tiled_xla(a_blocks, b_blocks, pa, pb, oid, *,
                      transpose_b: bool, n_out: int):
    prods = jax.vmap(lambda i, j: _pair_dot(
        a_blocks[i], b_blocks[j], transpose_b))(pa, pb)
    return jax.ops.segment_sum(prods, oid, num_segments=n_out)


def spgemm_tiled_xla(A: TiledBlocks, B: TiledBlocks,
                     plan: TiledGemmPlan) -> TiledBlocks:
    """Tiled SpGEMM via XLA batched matmul + block segment-sum."""
    if plan.n_pairs == 0:
        # Empty result: sentinel-coordinate filler block (see TiledBlocks
        # docstring) — a live-looking (0,0) zero tile would pollute the
        # pattern of downstream plans.
        return TiledBlocks(
            tile_row=jnp.asarray([-(-plan.out_shape[0] // TILE)], jnp.int32),
            tile_col=jnp.asarray([-(-plan.out_shape[1] // TILE)], jnp.int32),
            blocks=jnp.zeros((1, TILE, TILE), jnp.float32),
            shape=plan.out_shape)
    out = _spgemm_tiled_xla(A.blocks, B.blocks,
                            jnp.asarray(plan.pa), jnp.asarray(plan.pb),
                            jnp.asarray(plan.oid),
                            transpose_b=plan.transpose_b,
                            n_out=plan.n_out_tiles)
    return TiledBlocks(tile_row=jnp.asarray(plan.out_tile_row),
                       tile_col=jnp.asarray(plan.out_tile_col),
                       blocks=out, shape=plan.out_shape)


def _pairs_kernel(pa_ref, pb_ref, oid_ref, a_ref, b_ref, out_ref, acc, *,
                  transpose_b: bool, n_pairs: int):
    p = pl.program_id(0)
    prev = oid_ref[jnp.maximum(p, 1) - 1]
    first = jnp.logical_or(p == 0, oid_ref[p] != prev)

    @pl.when(first)
    def _():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += _pair_dot(a_ref[0], b_ref[0], transpose_b)

    nxt = oid_ref[jnp.minimum(p + 1, n_pairs - 1)]
    last = jnp.logical_or(p == n_pairs - 1, oid_ref[p] != nxt)

    @pl.when(last)
    def _():
        out_ref[0] = acc[...]


@functools.partial(jax.jit,
                   static_argnames=("transpose_b", "n_out", "interpret"))
def _spgemm_tiled_pallas(a_blocks, b_blocks, pa, pb, oid, *,
                         transpose_b: bool, n_out: int, interpret: bool):
    P = pa.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, TILE, TILE),
                         lambda p, pa, pb, oid: (pa[p], 0, 0)),
            pl.BlockSpec((1, TILE, TILE),
                         lambda p, pa, pb, oid: (pb[p], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE, TILE),
                               lambda p, pa, pb, oid: (oid[p], 0, 0)),
        scratch_shapes=[pltpu.VMEM((TILE, TILE), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_pairs_kernel, transpose_b=transpose_b,
                          n_pairs=P),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, TILE, TILE), jnp.float32),
        interpret=interpret,
    )(pa, pb, oid, a_blocks, b_blocks)


def _pairs_stream_kernel(pstart_ref, pa_ref, pb_ref, a_hbm, b_hbm, out_ref,
                         abuf, bbuf, sem_a, sem_b, *, n_pairs: int,
                         transpose_b: bool):
    # Grid = one step per OUTPUT tile (not per pair): the out block is
    # written exactly once through a trivial t -> t out spec, so Mosaic
    # never pre-reads output blocks the way the revisit pattern of
    # _pairs_kernel makes it do (measured +1 out-tile read per tile ~=
    # the round-3 31% gap to roofline), and per-grid-step overhead is
    # paid once per output tile instead of once per pair.  Operand tiles
    # are DMA'd manually from HBM by the scalar-prefetched pair indices,
    # double-buffered across output-tile boundaries (global pair order),
    # exactly like the dense SpMM kernel's cross-row X prefetch.
    t = pl.program_id(0)
    ps = pstart_ref[t]
    pe = pstart_ref[t + 1]

    def dma_a(g):
        i = pa_ref[jnp.minimum(g, n_pairs - 1)]
        return pltpu.make_async_copy(a_hbm.at[i], abuf.at[g % 2],
                                     sem_a.at[g % 2])

    def dma_b(g):
        i = pb_ref[jnp.minimum(g, n_pairs - 1)]
        return pltpu.make_async_copy(b_hbm.at[i], bbuf.at[g % 2],
                                     sem_b.at[g % 2])

    @pl.when(t == 0)
    def _():
        dma_a(0).start()
        dma_b(0).start()

    def body(g, acc):
        @pl.when(g + 1 < n_pairs)
        def _():
            dma_a(g + 1).start()
            dma_b(g + 1).start()

        dma_a(g).wait()
        dma_b(g).wait()
        return acc + _pair_dot(abuf[g % 2], bbuf[g % 2], transpose_b)

    out_ref[0] = jax.lax.fori_loop(
        ps, pe, body, jnp.zeros((TILE, TILE), jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("transpose_b", "n_out", "interpret"))
def _spgemm_tiled_pallas_v2(a_blocks, b_blocks, pstart, pa, pb, *,
                            transpose_b: bool, n_out: int, interpret: bool):
    P = pa.shape[0]
    dt = a_blocks.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_out,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # A blocks in HBM
            pl.BlockSpec(memory_space=pl.ANY),      # B blocks in HBM
        ],
        out_specs=pl.BlockSpec((1, TILE, TILE),
                               lambda t, ps, pa, pb: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, TILE, TILE), dt),
            pltpu.VMEM((2, TILE, TILE), dt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_pairs_stream_kernel, n_pairs=P,
                          transpose_b=transpose_b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, TILE, TILE), jnp.float32),
        interpret=interpret,
    )(pstart, pa, pb, a_blocks, b_blocks)


def plan_pstart(plan: TiledGemmPlan) -> np.ndarray:
    """Per-output-tile pair ranges: ``pstart[t] .. pstart[t+1]`` indexes
    the pairs of output tile ``t`` (``oid`` is sorted/grouped by plan
    construction)."""
    return np.searchsorted(plan.oid,
                           np.arange(plan.n_out_tiles + 1)).astype(np.int32)


def spgemm_tiled_pallas(A: TiledBlocks, B: TiledBlocks,
                        plan: TiledGemmPlan, *,
                        interpret: bool = False) -> TiledBlocks:
    """Tiled SpGEMM via the Pallas pair-stream kernel.

    Pairs are consumed in plan order (grouped by output tile); operand
    tiles stream through double-buffered VMEM blocks, the running product
    accumulates in a VMEM scratch tile, and each output tile is stored
    once.  HBM traffic: ``P * 2`` operand tiles read + ``T_out`` tiles
    written.
    """
    if plan.n_pairs == 0:
        return spgemm_tiled_xla(A, B, plan)
    out = _spgemm_tiled_pallas(A.blocks, B.blocks,
                               jnp.asarray(plan.pa), jnp.asarray(plan.pb),
                               jnp.asarray(plan.oid),
                               transpose_b=plan.transpose_b,
                               n_out=plan.n_out_tiles, interpret=interpret)
    return TiledBlocks(tile_row=jnp.asarray(plan.out_tile_row),
                       tile_col=jnp.asarray(plan.out_tile_col),
                       blocks=out, shape=plan.out_shape)


def tiled_blocks_to_coo(tb: TiledBlocks, *, cap: int | None = None,
                        nnz_cap: int | None = None) -> SparseCOO:
    """Extract nonzero entries of a block-tiled result into (unsorted) COO.

    Exact zeros are dropped (reference contract: zero products are not
    emitted, ``multiply_sparse.hpp:238-243``).  ``cap`` is the static
    output capacity; when None it is computed eagerly from the concrete
    nonzero count (host sync).
    """
    blocks = tb.blocks.astype(jnp.float32)
    if cap is None and nnz_cap is not None:
        cap = nnz_cap
    if cap is None:
        cap = round_up_pow2(max(int(jnp.sum(blocks != 0)), 1))
    # jnp.nonzero(size=...) lowers to a per-element scatter on TPU
    # (~0.09 Gelem/s — measured 99 ms for a 668-tile config-4 result,
    # probes/probe_r2_tiled_gemm.py); compact with a sort instead. The
    # sort cost is linear in operand count (docs/PERFORMANCE.md), so pack
    # (dead-flag, position) into ONE integer key — a 1-operand sort at
    # ~1.8 Gelem/s vs ~0.5 for key+2-payload (measured 35 -> ~8 ms on the
    # config-4 result) — then gather the cap surviving values by position.
    flat = blocks.reshape(-1)
    nel = flat.shape[0]
    use64 = nel >= (1 << 30)
    if use64 and not jax.config.jax_enable_x64:
        raise SpSparseError(
            "tiled_blocks_to_coo: >=2^30 block slots needs x64 enabled "
            "for the packed extraction key")
    kdt = jnp.int64 if use64 else jnp.int32
    dead_bump = jnp.asarray(nel if use64 else (1 << 30), kdt)
    key = jnp.arange(nel, dtype=kdt) + jnp.where(flat != 0, 0, dead_bump)
    key_c = jax.lax.sort((key,), num_keys=1)[0][:cap]
    if cap > nel:
        key_c = jnp.pad(key_c, (0, cap - nel), constant_values=0)
    pos_c = jnp.where(key_c >= dead_bump, key_c - dead_bump, key_c)
    vals_c = flat[pos_c]
    n_sel = jnp.sum(flat != 0).astype(jnp.int32)
    # Clamp so nnz <= cap always holds even when an explicit static cap
    # undercounts (the compaction truncates the entry list; an unclamped
    # count would mark padding slots live downstream).
    nnz = jnp.minimum(n_sel, jnp.asarray(cap, n_sel.dtype)).astype(jnp.int32)
    live = jnp.arange(cap) < nnz
    t = (pos_c // (TILE * TILE)).astype(jnp.int32)
    rc = pos_c % (TILE * TILE)
    r = (rc // TILE).astype(jnp.int32)
    c = (rc % TILE).astype(jnp.int32)
    idx_dtype = SparseCOO.empty(tb.shape, 1).index_dtype
    rows = tb.tile_row[t].astype(idx_dtype) * TILE + r
    cols = tb.tile_col[t].astype(idx_dtype) * TILE + c
    sent = jnp.asarray(SparseCOO.sentinel_index(tb.shape, idx_dtype))
    idx = jnp.stack([jnp.where(live, rows, sent[0]),
                     jnp.where(live, cols, sent[1])], axis=1)
    vals = jnp.where(live, vals_c, 0)
    return SparseCOO(indices=idx.astype(idx_dtype), vals=vals, nnz=nnz,
                     shape=tb.shape)


def spgemm_tiled(A: SparseCOO, B: SparseCOO, *, transpose_b: bool = False,
                 dtype=jnp.float32, use_pallas: bool | None = None,
                 cap: int | None = None, use_window: bool | None = None,
                 interpret: bool = False) -> SparseCOO:
    """``C = A @ B^(T?)`` via the tiled MXU path (eager convenience).

    Tiling, densification, and pair planning run host-side; the block
    products run on device.  Result is an *unsorted* COO (consolidated
    values, zeros dropped); call ``.consolidate()`` for a sorted result.
    For matrices without block structure (entries scattered so each
    128x128 tile holds only a few) prefer the ESC path
    (:func:`spsparse_tpu.ops.spgemm.spgemm`) — densified tiles would
    waste ``64KB/tile`` of traffic on mostly-zero blocks.

    ``A @ B^T`` products whose pair structure is block-BANDED (regridding
    ``A A^T`` and friends) auto-route through the rolling-window kernel
    (:mod:`.spgemm_window` — operand rows streamed once per super-group
    instead of 2 scattered tile fetches per pair; measured 4.2x over the
    pair kernel on the config-4 family at 2^17 rows, round 5); non-banded
    plans fall back to the pair kernel. ``use_window=False`` disables."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_window is None:
        use_window = transpose_b and (use_pallas or interpret)
    if use_window and transpose_b:
        from .pallas_tiled import prepare_tiled_dense
        from .spgemm_window import (band_to_tiled_blocks,
                                    plan_window_spgemm,
                                    spgemm_window_pallas)
        try:
            pa_ = prepare_tiled_dense(to_tiled(A), dtype=dtype)
            pb_ = pa_ if B is A else prepare_tiled_dense(to_tiled(B),
                                                         dtype=dtype)
            plan = plan_window_spgemm(
                pa_.tcols, pb_.tcols, nbc=pa_.nbc,
                out_shape=(A.shape[0], B.shape[0]), dtype=dtype,
                shared=pa_ is pb_)
            band = spgemm_window_pallas(
                plan, pa_.blocks, None if plan.shared else pb_.blocks,
                interpret=interpret)
            return tiled_blocks_to_coo(band_to_tiled_blocks(band, plan),
                                       cap=cap)
        except SpSparseError:
            pass        # non-banded pair structure: pair kernel below
    ta = densify_tiled(to_tiled(A), dtype=dtype)
    tbk = densify_tiled(to_tiled(B), dtype=dtype)
    plan = plan_tiled_spgemm(ta, tbk, transpose_b=transpose_b)
    f = spgemm_tiled_pallas if use_pallas else spgemm_tiled_xla
    kw = {"interpret": interpret} if f is spgemm_tiled_pallas else {}
    out = f(ta, tbk, plan, **kw)
    return tiled_blocks_to_coo(out, cap=cap)
