"""Pallas TPU kernel: tiled one-hot SpMM (general sparsity on the MXU).

The XLA-level tiled one-hot path (:mod:`spsparse_tpu.ops.tiled_ops`)
materializes its ``(nt, cap, 128)`` one-hot tensors in HBM — gigabytes of
traffic that defeat the design. This kernel builds the one-hots in VMEM
registers per tile, so HBM traffic is just the tile payloads
(rows/cols/vals), one 128-row X tile per stored tile (DMA'd, double
buffered), and one Y tile per block row:

    per tile t at (block_row b, block_col c):
        oh_c[cap,128] = (cols_t[:,None] == iota)         # VPU, in VMEM
        g   = oh_c @ X_tile[c]                           # MXU (cap, N)
        oh_r[cap,128] = (rows_t[:,None] == iota)
        Y_b += oh_r^T @ (vals_t[:,None] * g)             # MXU (128, N)

Grid = one step per *block row*; each step loops over that row's (padded)
tile list with the X-tile DMA for tile ``t+1`` in flight while tile ``t``
computes. Requires the host-side layout from :func:`prepare_tiled_rows`
(tiles grouped by block row, padded to the max tiles-per-row).
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

from ..core.errors import SpSparseError
from ..core.tiled import SparseTiledCOO, TILE

Array = Any

__all__ = ["prepare_tiled_rows", "PreparedTiledRows", "spmm_tiled_pallas",
           "prepare_tiled_dense", "PreparedTiledDense",
           "spmm_tiled_dense_pallas", "DENSE_FILL_THRESHOLD"]

# Above this many entries per occupied tile, the dense-block kernel beats
# the one-hot kernel: a dense (128,128)@(128,N) matmul costs 128*128*N
# MACs per tile, while the one-hot formulation costs tile_cap*2*128*N —
# i.e. dense wins whenever tile_cap > 64, *and* its cost does not scale
# with padding. (Measured on v5e: one-hot at tile_cap=4096 runs ~64x more
# MXU work per tile than dense blocks.)
DENSE_FILL_THRESHOLD = 64


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PreparedTiledRows:
    """Row-grouped tile layout: ``tcols (nbr, Rt)`` block-col ids (sentinel
    nbc), ``rows/cols (nbr, Rt, cap)`` int32 in-tile offsets, ``vals`` f32."""

    tcols: Array = dataclasses.field(metadata=dict(static=False))
    rows: Array = dataclasses.field(metadata=dict(static=False))
    cols: Array = dataclasses.field(metadata=dict(static=False))
    vals: Array = dataclasses.field(metadata=dict(static=False))
    shape: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def nbr(self) -> int:
        return self.tcols.shape[0]

    @property
    def tiles_per_row(self) -> int:
        return self.tcols.shape[1]

    @property
    def tile_cap(self) -> int:
        return self.rows.shape[2]

    @property
    def nbc(self) -> int:
        return -(-self.shape[1] // TILE)


def prepare_tiled_rows(tl: SparseTiledCOO) -> PreparedTiledRows:
    """Group a :class:`SparseTiledCOO` by block row (host-side, eager)."""
    nt = int(tl.n_tiles)
    tr = np.asarray(tl.tile_row)[:nt]
    tc = np.asarray(tl.tile_col)[:nt]
    rows = np.asarray(tl.rows)[:nt].astype(np.int32)
    cols = np.asarray(tl.cols)[:nt].astype(np.int32)
    vals = np.asarray(tl.vals)[:nt]
    nbr, nbc = tl.nbrows, tl.nbcols
    cap = tl.tile_cap

    counts = np.bincount(tr, minlength=nbr)
    Rt = max(int(counts.max(initial=1)), 1)
    tcols = np.full((nbr, Rt), nbc, np.int32)
    r8 = np.zeros((nbr, Rt, cap), np.int32)
    c8 = np.zeros((nbr, Rt, cap), np.int32)
    v8 = np.zeros((nbr, Rt, cap), np.float32)
    # tiles are row-major sorted, so the slot of tile t within its block
    # row is t minus the first index of that row — vectorized (a Python
    # per-tile loop here cost O(n_tiles) interpreter time; matters at the
    # 1M-tile scale this targets).
    slot = np.arange(nt) - np.searchsorted(tr, tr, side="left")
    tcols[tr, slot] = tc
    r8[tr, slot] = rows
    c8[tr, slot] = cols
    v8[tr, slot] = vals
    return PreparedTiledRows(
        tcols=jnp.asarray(tcols), rows=jnp.asarray(r8),
        cols=jnp.asarray(c8), vals=jnp.asarray(v8), shape=tl.shape)


def _tiled_kernel(tcols_ref, rows_ref, cols_ref, vals_ref, x_hbm, y_ref,
                  xtile, sem, *, tiles_per_row: int, cap: int, n_block: int,
                  nbc: int, interpret: bool):
    # tcols_ref is a scalar-prefetch SMEM ref (nbr*Rt,): SMEM permits the
    # dynamic per-tile indexing that VMEM lane reads cannot express.
    Rt = tiles_per_row
    b = pl.program_id(0)
    iot = jax.lax.broadcasted_iota(jnp.int32, (cap, TILE), 1)

    def tcol(t):
        # Clamp: the t+1 prefetch condition evaluates tcol(Rt) on the last
        # slot; the clamped read keeps it in bounds (its value is masked
        # by the `t + 1 < Rt` conjunct).
        return tcols_ref[jnp.minimum(b * Rt + t, tcols_ref.shape[0] - 1)]

    def get_dma(slot, t):
        tc = jnp.minimum(tcol(t), nbc - 1)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tc * TILE, TILE)], xtile.at[slot], sem.at[slot])

    # Sentinel (padding) slots get NO DMA at all — a block row's tcols are
    # padded to the global max Rt, and fetching a clamped X tile for every
    # padding slot made the kernel's traffic scale with nbr*Rt instead of
    # n_tiles (measured 2.7x fewer tiles -> only 1.2x faster before this;
    # probes/probe_r2_packed.py). Start/wait conditions are identical per
    # slot, so the semaphores stay balanced.
    @pl.when(tcol(0) < nbc)
    def _():
        get_dma(0, 0).start()

    y_ref[...] = jnp.zeros_like(y_ref)

    def body(t, _):
        cur = t % 2

        @pl.when(jnp.logical_and(t + 1 < Rt, tcol(t + 1) < nbc))
        def _():
            get_dma((t + 1) % 2, t + 1).start()

        @pl.when(tcol(t) < nbc)
        def _():
            get_dma(cur, t).wait()

        @pl.when(tcol(t) < nbc)
        def _():
            oh_c = (cols_ref[0, t][:, None] == iot).astype(jnp.float32)
            g = jax.lax.dot_general(
                oh_c, xtile[cur],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)        # (cap, N)
            prod = vals_ref[0, t][:, None] * g
            oh_r = (rows_ref[0, t][:, None] == iot).astype(jnp.float32)
            y_ref[...] += jax.lax.dot_general(
                oh_r, prod,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)        # (TILE, N)
        return 0

    jax.lax.fori_loop(0, Rt, body, 0)


@functools.partial(jax.jit, static_argnames=("n_block", "nbc", "interpret"))
def _spmm_tiled_pallas(prep_tcols, prep_rows, prep_cols, prep_vals, Xp, *,
                       n_block: int, nbc: int, interpret: bool) -> Array:
    nbr, Rt = prep_tcols.shape
    cap = prep_rows.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr,),
        in_specs=[
            pl.BlockSpec((1, Rt, cap), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, Rt, cap), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, Rt, cap), lambda b, s: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),          # X in HBM
        ],
        out_specs=pl.BlockSpec((TILE, n_block), lambda b, s: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, TILE, n_block), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    y = pl.pallas_call(
        functools.partial(_tiled_kernel, tiles_per_row=Rt, cap=cap,
                          n_block=n_block, nbc=nbc, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * TILE, n_block), jnp.float32),
        interpret=interpret,
    )(prep_tcols.reshape(-1), prep_rows, prep_cols, prep_vals, Xp)
    return y


# --- autodiff (one-hot kernel) ---------------------------------------------
# Kernel math per valid tile (b, t):  y3[b, i, :] += sum_e [rows==i] *
# vals[b,t,e] * Xp[tc*TILE + cols[b,t,e], :].  The VJP is exact for that
# padded form (padding slots at (0,0) with val 0 get the corresponding —
# harmless — cotangent, matching what the forward actually computes).
# NB the backward is per-entry gather/scatter at the XLA level — correct
# everywhere but gather-bound on TPU (docs/PERFORMANCE.md); differentiate
# through the dense-block kernel when the fill allows it.


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _spmm_tiled_ad(tcols, rows, cols, vals, Xp, n_block: int, nbc: int,
                   interpret: bool):
    return _spmm_tiled_pallas(tcols, rows, cols, vals, Xp, n_block=n_block,
                              nbc=nbc, interpret=interpret)


def _spmm_tiled_ad_fwd(tcols, rows, cols, vals, Xp, n_block, nbc, interpret):
    y = _spmm_tiled_ad(tcols, rows, cols, vals, Xp, n_block, nbc, interpret)
    return y, (tcols, rows, cols, vals, Xp)


def _spmm_tiled_ad_bwd(n_block, nbc, interpret, res, g):
    tcols, rows, cols, vals, Xp = res
    nbr, Rt = tcols.shape
    cap = rows.shape[2]
    gf = g.astype(jnp.float32)                              # (nbr*TILE, N)
    valid = (tcols < nbc)[:, :, None]                       # (nbr, Rt, 1)
    tcc = jnp.minimum(tcols, nbc - 1)[:, :, None]
    brow = jax.lax.broadcasted_iota(jnp.int32, (nbr, Rt, cap), 0)
    grow = (brow * TILE + rows).reshape(-1)                 # global y rows
    gcol = (tcc * TILE + cols).reshape(-1)                  # global X rows
    vmask = valid.astype(jnp.float32)
    gr = jnp.take(gf, grow, axis=0)                         # (E, N)
    xc = jnp.take(Xp.astype(jnp.float32), gcol, axis=0)     # (E, N)
    d_vals = (jnp.sum(gr * xc, axis=-1).reshape(nbr, Rt, cap)
              * vmask if cap else jnp.zeros_like(vals))
    w = (vals.astype(jnp.float32) * vmask).reshape(-1, 1)
    d_Xp = jnp.zeros_like(Xp, jnp.float32).at[gcol].add(w * gr)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (f0(tcols), f0(rows), f0(cols), d_vals.astype(vals.dtype),
            d_Xp.astype(Xp.dtype))


_spmm_tiled_ad.defvjp(_spmm_tiled_ad_fwd, _spmm_tiled_ad_bwd)


def spmm_tiled_pallas(prep: PreparedTiledRows | SparseTiledCOO, X: Array, *,
                      interpret: bool = False) -> Array:
    """``Y = A @ X`` via the Pallas tiled one-hot kernel. Differentiable
    w.r.t. ``prep.vals`` and ``X`` (custom VJP; backward is gather-bound
    on TPU — prefer the dense-block kernel under ``jax.grad``)."""
    if isinstance(prep, SparseTiledCOO):
        prep = prepare_tiled_rows(prep)
    X = jnp.asarray(X)
    K, N = X.shape
    nbc = prep.nbc
    # Mosaic DMA slices must be 128-aligned on the lane (RHS) dim; pad N
    # up (thin RHS pays proportionally more X traffic — route genuinely
    # thin scattered products through the gather layout instead).
    Np = -(-N // TILE) * TILE
    Xp = jnp.pad(X.astype(jnp.float32),
                 ((0, nbc * TILE - K), (0, Np - N)))
    y = _spmm_tiled_ad(prep.tcols, prep.rows, prep.cols,
                       prep.vals, Xp, Np, nbc, interpret)
    return y[: prep.shape[0], :N]


# ---------------------------------------------------------------------------
# Dense-block variant: occupied tiles stored as dense (128,128) f32 blocks.
#
# The one-hot kernel uses the MXU as a gather engine — every *padded entry
# slot* costs 2*128*N MACs — so its runtime scales with tile_cap, not nnz,
# and at tile_cap >= 4096 it is compute-bound ~75x off the HBM roofline.
# Densifying each occupied tile flips the cost: one (128,128)@(128,N)
# matmul per tile regardless of fill, 64KB/tile of A traffic, which makes
# the kernel HBM-bound (the design target for general SpMM). The tile
# *pattern* stays sparse — only occupied tiles are stored and only their
# X tiles are fetched — so the sparsity still pays at the block level.
# Use for fill >= DENSE_FILL_THRESHOLD; below that the one-hot kernel
# moves fewer bytes.
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PreparedTiledDense:
    """Row-grouped dense-block layout: ``tcols (nbr, Rt)`` block-col ids
    (sentinel nbc), ``blocks (nbr, Rt, TILE, TILE)`` f32 densified tiles
    (zero where no entry)."""

    tcols: Array = dataclasses.field(metadata=dict(static=False))
    blocks: Array = dataclasses.field(metadata=dict(static=False))
    shape: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def nbr(self) -> int:
        return self.tcols.shape[0]

    @property
    def tiles_per_row(self) -> int:
        return self.tcols.shape[1]

    @property
    def nbc(self) -> int:
        return -(-self.shape[1] // TILE)


def prepare_tiled_dense(tl: SparseTiledCOO,
                        dtype=jnp.float32, *,
                        host_limit_bytes: int = 8 << 30
                        ) -> PreparedTiledDense:
    """Densify a :class:`SparseTiledCOO` into per-block-row dense tiles
    (host-side, eager).

    ``dtype=jnp.bfloat16`` halves the A-block and X-tile HBM traffic and
    runs the MXU at full rate (f32 blocks use 6-pass HIGHEST); products
    still accumulate in f32 (``preferred_element_type``) — the mixed
    bf16/f32 mode BASELINE config 3 specifies.

    ``host_limit_bytes`` bounds the host-side f32 staging of the dense
    blocks (the guard against feeding a genuinely-sparse matrix into the
    dense layout); callers that KNOW the fill is dense and the device
    copy fits HBM — the BASELINE 5M-row config 3 stages ~10.7 GiB f32
    for a 5.4 GiB bf16 device layout on a 125 GiB host — pass a higher
    limit."""
    nt = int(tl.n_tiles)
    tr = np.asarray(tl.tile_row)[:nt]
    tc = np.asarray(tl.tile_col)[:nt]
    rows = np.asarray(tl.rows)[:nt].astype(np.int64)
    cols = np.asarray(tl.cols)[:nt].astype(np.int64)
    vals = np.asarray(tl.vals)[:nt].astype(np.float32)
    nbr, nbc = tl.nbrows, tl.nbcols

    counts = np.bincount(tr, minlength=nbr)
    Rt = max(int(counts.max(initial=1)), 1)
    est = nbr * Rt * TILE * TILE * 4
    if est > host_limit_bytes:
        raise SpSparseError(
            f"prepare_tiled_dense would materialize {est >> 30} GiB of "
            "dense blocks (nbr x Rt = {nbr} x {Rt}); this matrix belongs "
            "on the one-hot kernel (prepare_tiled_rows / prepare_general "
            "picks it automatically at low fill)".format(nbr=nbr, Rt=Rt))
    tcols = np.full((nbr, Rt), nbc, np.int32)
    blocks = np.zeros((nbr, Rt, TILE, TILE), np.float32)
    # Vectorized fill (see prepare_tiled_rows): slot within block row from
    # the sorted tile-row stream, then ONE scatter-add over every entry of
    # every tile. Padding entries carry value 0 at offset (0,0); add.at
    # folds them into block[0,0] harmlessly. Live duplicate offsets
    # accumulate, matching consolidate(ADD).
    slot = np.arange(nt) - np.searchsorted(tr, tr, side="left")
    tcols[tr, slot] = tc
    cap = rows.shape[1] if rows.ndim == 2 else 0
    if nt and cap:
        bt = np.repeat(tr, cap).reshape(nt, cap)
        st = np.repeat(slot, cap).reshape(nt, cap)
        np.add.at(blocks, (bt, st, rows, cols), vals)
    return PreparedTiledDense(tcols=jnp.asarray(tcols),
                              blocks=jnp.asarray(blocks).astype(dtype),
                              shape=tl.shape)


def _tiled_dense_kernel(tcols_ref, blocks_ref, x_hbm, y_ref, xtile, sem, *,
                        tiles_per_row: int, n_rows: int, nbc: int):
    # Grid = one step per block row; inner fori over the row's Rt tiles.
    # X-tile DMAs are indexed by the GLOBAL step g = b*Rt + t and the DMA
    # for g+1 is issued while step g computes — including across the row
    # boundary (issuing only within a row leaves a DMA-latency stall at
    # the top of every row: ~256 rows x ~1-2 us was a measurable fraction
    # of the whole kernel). Measured v5e (slope method,
    # probes/probe_tiled_dense_r2d/e.py): ~600 GB/s of actual traffic at
    # f32 HIGHEST — HBM-bound, as designed.
    Rt = tiles_per_row
    b = pl.program_id(0)
    n_steps = n_rows * Rt

    def tcolg(g):
        return tcols_ref[jnp.minimum(g, n_steps - 1)]

    def get_dma(g):
        tc = jnp.minimum(tcolg(g), nbc - 1)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tc * TILE, TILE)], xtile.at[g % 2],
            sem.at[g % 2])

    # Sentinel slots get no DMA (same fix as the one-hot kernel: padding
    # slots otherwise fetch a clamped X tile each, scaling traffic with
    # nbr*Rt instead of n_tiles). Start/wait conditions match per g.
    @pl.when(jnp.logical_and(b == 0, tcolg(0) < nbc))
    def _():
        get_dma(0).start()

    y_ref[...] = jnp.zeros_like(y_ref)

    def body(t, _):
        g = b * Rt + t

        @pl.when(jnp.logical_and(g + 1 < n_steps, tcolg(g + 1) < nbc))
        def _():
            get_dma(g + 1).start()

        @pl.when(tcolg(g) < nbc)
        def _():
            get_dma(g).wait()

        @pl.when(tcolg(g) < nbc)
        def _():
            prec = (jax.lax.Precision.DEFAULT
                    if blocks_ref.dtype == jnp.bfloat16
                    else jax.lax.Precision.HIGHEST)
            y_ref[...] += jax.lax.dot_general(
                blocks_ref[0, t], xtile[g % 2],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)
        return 0

    jax.lax.fori_loop(0, Rt, body, 0)


@functools.partial(jax.jit, static_argnames=("n_block", "nbc", "interpret"))
def _spmm_tiled_dense(prep_tcols, prep_blocks, Xp, *, n_block: int,
                      nbc: int, interpret: bool) -> Array:
    nbr, Rt = prep_tcols.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr,),
        in_specs=[
            pl.BlockSpec((1, Rt, TILE, TILE), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),          # X in HBM
        ],
        out_specs=pl.BlockSpec((TILE, n_block), lambda b, t: (b, 0)),
        scratch_shapes=[
            # X tiles stream at the block dtype (bf16 halves the traffic).
            pltpu.VMEM((2, TILE, n_block), prep_blocks.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_tiled_dense_kernel, tiles_per_row=Rt,
                          n_rows=nbr, nbc=nbc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * TILE, n_block), jnp.float32),
        interpret=interpret,
    )(prep_tcols.reshape(-1), prep_blocks, Xp)


# --- autodiff (dense-block kernel) ------------------------------------------
# Kernel math: y3[b] += sum_t blocks[b,t] @ Xtile(tc[b,t]), so the backward
# is two batched (TILE,TILE,N) matmul sweeps plus one tile-granular
# segment_sum — MXU work at the same traffic order as the forward; this is
# the kernel to differentiate through on TPU.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _spmm_tiled_dense_ad(tcols, blocks, Xp, n_block: int, nbc: int,
                         interpret: bool):
    return _spmm_tiled_dense(tcols, blocks, Xp, n_block=n_block, nbc=nbc,
                             interpret=interpret)


def _spmm_tiled_dense_ad_fwd(tcols, blocks, Xp, n_block, nbc, interpret):
    y = _spmm_tiled_dense_ad(tcols, blocks, Xp, n_block, nbc, interpret)
    return y, (tcols, blocks, Xp)


def _spmm_tiled_dense_ad_bwd(n_block, nbc, interpret, res, g):
    tcols, blocks, Xp = res
    nbr, Rt = tcols.shape
    N = g.shape[1]
    g3 = g.reshape(nbr, TILE, N).astype(jnp.float32)
    valid = tcols < nbc                                     # (nbr, Rt)
    tcc = jnp.minimum(tcols, nbc - 1)
    Xt = jnp.take(Xp.reshape(nbc, TILE, N), tcc.reshape(-1), axis=0)
    Xt = Xt.reshape(nbr, Rt, TILE, N).astype(jnp.float32)   # tile gathers
    prec = jax.lax.Precision.HIGHEST
    d_blocks = jnp.einsum("bin,btjn->btij", g3, Xt, precision=prec)
    d_blocks = jnp.where(valid[:, :, None, None], d_blocks, 0.0)
    bl = jnp.where(valid[:, :, None, None],
                   blocks.astype(jnp.float32), 0.0)
    d_Xt = jnp.einsum("btij,bin->btjn", bl, g3, precision=prec)
    seg = jnp.where(valid, tcols, nbc).reshape(-1)
    d_Xp = jax.ops.segment_sum(d_Xt.reshape(nbr * Rt, TILE, N), seg,
                               num_segments=nbc + 1)[:nbc]
    f0 = np.zeros(tcols.shape, jax.dtypes.float0)
    return (f0, d_blocks.astype(blocks.dtype),
            d_Xp.reshape(nbc * TILE, N).astype(Xp.dtype))


_spmm_tiled_dense_ad.defvjp(_spmm_tiled_dense_ad_fwd,
                            _spmm_tiled_dense_ad_bwd)


def spmm_tiled_dense_pallas(prep: PreparedTiledDense | SparseTiledCOO,
                            X: Array, *, interpret: bool = False) -> Array:
    """``Y = A @ X`` via the Pallas dense-block tiled kernel.
    Differentiable w.r.t. ``prep.blocks`` and ``X`` (custom VJP built from
    batched tile matmuls — the TPU-efficient gradient path)."""
    if isinstance(prep, SparseTiledCOO):
        prep = prepare_tiled_dense(prep)
    # The per-block-row block stream is double-buffered in VMEM
    # (2 * Rt * 64KB); guard against layouts whose widest block row
    # cannot fit (very wide rows belong on the one-hot kernel, whose
    # VMEM footprint is per-tile).
    if prep.tiles_per_row * TILE * TILE * 4 * 2 > 32 * 1024 * 1024:
        raise ValueError(
            f"tiles_per_row={prep.tiles_per_row} needs "
            f"{prep.tiles_per_row * 128 * 1024 // (1 << 20)} MiB of VMEM "
            "block double-buffer; use spmm_tiled_pallas (one-hot) for "
            "such wide rows")
    X = jnp.asarray(X)
    K, N = X.shape
    nbc = prep.nbc
    # Lane-dim (RHS) DMA alignment: pad N to a multiple of 128 (see
    # spmm_tiled_pallas).
    Np = -(-N // TILE) * TILE
    Xp = jnp.pad(X.astype(prep.blocks.dtype),
                 ((0, nbc * TILE - K), (0, Np - N)))
    y = _spmm_tiled_dense_ad(prep.tcols, prep.blocks, Xp, Np, nbc,
                             interpret)
    return y[: prep.shape[0], :N]
