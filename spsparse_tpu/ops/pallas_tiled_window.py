"""Dense-block tiled SpMM with super-row X windows.

The round-2 dense-block kernel (:mod:`.pallas_tiled`) fetches one 128-row
X tile per STORED tile (manual 32 KB DMAs) — on the config-3 matrix that
is ~32 MB of X traffic for a matrix whose occupied column blocks only
span ~21 MB once per super-row. For matrices whose row-blocks touch a
compact, monotonically advancing column window (regridding /
conservative-interpolation operators — the config-3 family), this
variant:

* groups ``G`` consecutive row-blocks into a *super-row* sharing one
  column window ``[wstart, wstart + Ws)`` (in 128-column blocks);
* DMAs each window ONCE per super-row (a single ~1-4 MB contiguous
  transfer, double-buffered across super-row boundaries — large
  sequential transfers also stream better than 32 KB tile fetches);
* per row-block, runs the same per-tile dense matmuls, slicing the
  VMEM-resident window at the tile's (scalar-prefetched) column offset.

HBM traffic: A blocks (dense bf16/f32 tiles, as before) + each window
once + Y once — the X term drops from ``n_tiles * 32 KB`` to
``n_super * Ws * 32 KB``. Routing: :func:`prepare_tiled_window` rejects
matrices whose window would not fit the VMEM budget; callers fall back
to the per-tile kernel.
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

__all__ = ["PreparedTiledWindow", "prepare_tiled_window",
           "spmm_tiled_window_pallas", "to_tiled_dense"]

# double-buffered window budget (bytes of VMEM for X windows)
_WINDOW_VMEM_BUDGET = 8 << 20


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PreparedTiledWindow:
    """Row-grouped dense blocks + per-super-row window table.

    ``offs (nbr*Rt,)`` int32: tile's column-block offset within its
    super-row window (sentinel -1 = padding slot); ``wstart (nsuper,)``
    int32 window starts in column blocks; ``blocks (nbr, Rt, T, T)``."""

    wstart: Array = dataclasses.field(metadata=dict(static=False))
    offs: Array = dataclasses.field(metadata=dict(static=False))
    blocks: Array = dataclasses.field(metadata=dict(static=False))
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    group: int = dataclasses.field(metadata=dict(static=True))
    ws: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nbr(self) -> int:
        return self.blocks.shape[0]

    @property
    def tiles_per_row(self) -> int:
        return self.blocks.shape[1]

    @property
    def nbc(self) -> int:
        return -(-self.shape[1] // TILE)


def prepare_tiled_window(tl: SparseTiledCOO, *, group: int = 16,
                         dtype=jnp.bfloat16, n_cols_rhs: int = TILE,
                         host_limit_bytes: int = 8 << 30
                         ) -> PreparedTiledWindow:
    """Host-side layout build. Raises :class:`SpSparseError` when any
    super-row's column span exceeds the VMEM window budget — the caller
    should fall back to :func:`..pallas_tiled.spmm_tiled_dense_pallas`.

    ``n_cols_rhs`` is the expected RHS width for the budget check: the
    kernel scratch is ``(2, ws*TILE, Np)`` where ``Np`` is the padded RHS
    width, so a wide X multiplies the window footprint (ADVICE r4). The
    check here uses the stated width; :func:`spmm_tiled_window_pallas`
    re-checks with the *actual* width at call time and falls back to the
    per-tile dense kernel instead of failing Mosaic compilation."""
    from .pallas_tiled import prepare_tiled_dense

    base = prepare_tiled_dense(tl, dtype=dtype,
                               host_limit_bytes=host_limit_bytes)
    nbr, Rt = base.tcols.shape
    nbc = base.nbc
    tcols = np.asarray(base.tcols)                    # (nbr, Rt), pad nbc
    nsuper = -(-nbr // group)
    pad_rows = nsuper * group - nbr
    if pad_rows:
        tcols = np.concatenate(
            [tcols, np.full((pad_rows, Rt), nbc, np.int32)])
    g = tcols.reshape(nsuper, group * Rt)
    live = g < nbc
    any_live = live.any(axis=1)
    lo = np.where(any_live, np.where(live, g, nbc).min(axis=1), 0)
    hi = np.where(any_live, np.where(live, g, -1).max(axis=1), 0)
    ws = int(np.max(np.where(any_live, hi - lo + 1, 1), initial=1))
    esize = np.dtype(dtype).itemsize
    np_rhs = -(-int(n_cols_rhs) // TILE) * TILE
    if 2 * ws * TILE * np_rhs * esize > _WINDOW_VMEM_BUDGET:
        raise SpSparseError(
            f"prepare_tiled_window: window span {ws} column blocks "
            f"x RHS width {np_rhs} exceeds the VMEM budget; use the "
            "per-tile dense kernel")
    offs = np.where(tcols[:nbr] < nbc,
                    tcols[:nbr] - lo[np.arange(nbr) // group][:, None],
                    -1).astype(np.int32)
    # clamp window starts so the full Ws window stays in-bounds of the
    # (padded) X; offsets stay valid because lo >= wstart is preserved
    wstart = np.minimum(lo, max(nbc - ws, 0)).astype(np.int32)
    offs = np.where(offs >= 0,
                    offs + (lo - wstart)[np.arange(nbr) // group][:, None],
                    -1).astype(np.int32)
    # pad rows to a whole number of super-rows: the fat-step kernel
    # (one grid step per super-row — a per-block-row grid paid ~0.6 us
    # of step overhead each and capped large-m throughput at ~40% of
    # model; measured on the 262K-row ladder, round 5) fetches
    # (group, Rt) block rows per step.
    if pad_rows:
        offs = np.concatenate(
            [offs, np.full((pad_rows, Rt), -1, np.int32)])
    blocks = base.blocks
    if pad_rows:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((pad_rows,) + blocks.shape[1:],
                               blocks.dtype)])
    return PreparedTiledWindow(
        wstart=jnp.asarray(wstart), offs=jnp.asarray(offs.reshape(-1)),
        blocks=blocks, shape=tl.shape, group=group, ws=ws)


def _window_kernel(wstart_ref, offs_ref, blocks_ref, x_hbm, y_ref,
                   xwin, sem, *, Rt: int, group: int, ws: int,
                   nsuper: int):
    # ONE grid step per SUPER-ROW: all G block rows' dots run
    # back-to-back (a per-block-row grid paid ~0.6 us/step of overhead,
    # capping large-m throughput at ~40% of model — round-5 ladder).
    g = pl.program_id(0)

    def dma(s):
        srj = jnp.minimum(s, nsuper - 1)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(wstart_ref[srj] * TILE, ws * TILE)],
            xwin.at[s % 2], sem.at[s % 2])

    @pl.when(g == 0)
    def _():
        dma(0).start()

    @pl.when(g + 1 < nsuper)
    def _():
        dma(g + 1).start()

    dma(g).wait()

    prec = (jax.lax.Precision.DEFAULT
            if blocks_ref.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    for r in range(group):
        b = g * group + r
        acc = jnp.zeros((TILE, y_ref.shape[1]), jnp.float32)
        for t in range(Rt):                   # static unroll, Rt small
            off = offs_ref[b * Rt + t]
            sl = xwin[g % 2, pl.ds(jnp.maximum(off, 0) * TILE, TILE), :]
            prod = jax.lax.dot_general(
                blocks_ref[0, r, t], sl,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            acc = acc + jnp.where(off >= 0, prod, 0.0)
        y_ref[pl.ds(r * TILE, TILE), :] = acc


@functools.partial(jax.jit, static_argnames=("n_block", "group", "ws",
                                             "interpret"))
def _spmm_tiled_window(wstart, offs, blocks, Xp, *, n_block: int,
                       group: int, ws: int, interpret: bool) -> Array:
    nbr_pad, Rt = blocks.shape[0], blocks.shape[1]
    nsuper = wstart.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsuper,),
        in_specs=[
            pl.BlockSpec((1, group, Rt, TILE, TILE),
                         lambda g, w, o: (g, 0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),          # X in HBM
        ],
        out_specs=pl.BlockSpec((group * TILE, n_block),
                               lambda g, w, o: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ws * TILE, n_block), blocks.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # fat steps double-buffer (group, Rt) operand blocks + a
    # (group*TILE, Np) out block on top of the X window — past the
    # default 16 MB scoped-VMEM limit at group=32/Rt=4 (measured 16.12M
    # reject at 1M rows); request the raised per-kernel limit like the
    # CG megakernel does (v5e physical VMEM is far larger).
    return pl.pallas_call(
        functools.partial(_window_kernel, Rt=Rt, group=group, ws=ws,
                          nsuper=nsuper),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr_pad * TILE, n_block),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=60 << 20),
    )(wstart, offs,
      blocks.reshape(nsuper, group, Rt, TILE, TILE), Xp)


# --- autodiff: forward = window kernel; backward delegates to the
# dense-block kernel's batched-matmul VJP math by reconstructing the
# global tile column ids from (offs, wstart) — identical kernel math
# (y3[b] += blocks[b,t] @ Xtile(tc[b,t])), so the cotangents coincide.


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _window_ad(wstart, offs, blocks, Xp, n_block: int, group: int,
               ws: int, nbc: int, interpret: bool):
    return _spmm_tiled_window(wstart, offs, blocks, Xp, n_block=n_block,
                              group=group, ws=ws, interpret=interpret)


def _window_tcols(wstart, offs, nbr, Rt, group, nbc):
    o2 = offs.reshape(nbr, Rt)
    base = wstart[(jnp.arange(nbr) // group)][:, None]
    return jnp.where(o2 >= 0, o2 + base, nbc).astype(jnp.int32)


def _window_ad_fwd(wstart, offs, blocks, Xp, n_block, group, ws, nbc,
                   interpret):
    y = _window_ad(wstart, offs, blocks, Xp, n_block, group, ws, nbc,
                   interpret)
    return y, (wstart, offs, blocks, Xp)


def _window_ad_bwd(n_block, group, ws, nbc, interpret, res, g):
    from .pallas_tiled import _spmm_tiled_dense_ad_bwd

    wstart, offs, blocks, Xp = res
    nbr, Rt = blocks.shape[0], blocks.shape[1]
    tcols = _window_tcols(wstart, offs, nbr, Rt, group, nbc)
    _, d_blocks, d_Xp = _spmm_tiled_dense_ad_bwd(
        n_block, nbc, interpret, (tcols, blocks, Xp), g)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return (f0(wstart), f0(offs), d_blocks, d_Xp)


_window_ad.defvjp(_window_ad_fwd, _window_ad_bwd)


def to_tiled_dense(prep: PreparedTiledWindow):
    """Reconstruct the per-tile dense layout from a window layout (the
    window layout is the dense layout plus a window table): global tile
    column ids from (offs, wstart). Used by the call-time VMEM fallback
    and usable by callers that want both layouts from one prepare."""
    from .pallas_tiled import PreparedTiledDense

    nbr, Rt = prep.blocks.shape[0], prep.blocks.shape[1]
    tcols = _window_tcols(prep.wstart, prep.offs, nbr, Rt, prep.group,
                          prep.nbc)
    return PreparedTiledDense(tcols=tcols, blocks=prep.blocks,
                              shape=prep.shape)


def spmm_tiled_window_pallas(prep: PreparedTiledWindow, X: Array, *,
                             interpret: bool = False) -> Array:
    """``Y = A @ X`` via the super-row window kernel (f32 output).
    Differentiable w.r.t. ``prep.blocks`` and ``X`` (custom VJP shared
    with the dense-block kernel's batched-matmul backward).

    When the double-buffered window scratch ``(2, ws*TILE, Np)`` would
    exceed the VMEM budget for this call's *actual* padded RHS width
    (prepare-time checks can only assume a width — ADVICE r4), delegates
    to the per-tile dense kernel instead of failing Mosaic compilation."""
    X = jnp.asarray(X)
    K, N = X.shape
    nbc = prep.nbc
    Np = -(-N // TILE) * TILE
    esize = np.dtype(prep.blocks.dtype).itemsize
    if 2 * prep.ws * TILE * Np * esize > _WINDOW_VMEM_BUDGET:
        from .pallas_tiled import spmm_tiled_dense_pallas

        return spmm_tiled_dense_pallas(to_tiled_dense(prep), X,
                                       interpret=interpret)
    Xp = jnp.pad(X.astype(prep.blocks.dtype),
                 ((0, nbc * TILE - K), (0, Np - N)))
    y = _window_ad(prep.wstart, prep.offs, prep.blocks, Xp, Np,
                   prep.group, prep.ws, nbc, interpret)
    return y[: prep.shape[0], :N]
