"""Rolling-window tiled SpGEMM for block-banded products (``A @ B^T``).

The round-2 pair-stream kernel (:mod:`.spgemm_tiled`) fetches TWO operand
tiles per pair as scattered 32 KB DMAs; on the config-4 regridding matrix
those fetches stream at ~45% efficiency (74 MB read in ~202 us vs a ~90 us
read-stream speed of light — docs/PERFORMANCE.md round-4 notes), pinning
the kernel to the 70%-of-roofline line. The fixed-chunk pair-slab fix
measured 24.7% (probes/probe_cfg4_slab.py — the round-4 negative result).

This kernel exploits what the pair plan for regridding-style operators
actually looks like: the occupied OUTPUT tiles form a block BAND
(``|i - j| <= W`` for small W — conservative-interpolation rows only
overlap near-diagonal neighbours), so a rolling VMEM window of operand
block rows serves every pair:

* operands use the row-grouped dense layout (``tcols (nbr, Rt)`` +
  ``blocks (nbr, Rt, T, T)`` — :class:`..pallas_tiled.PreparedTiledDense`);
* a super-group of ``G`` output block rows shares one window of
  ``G + 2W`` operand block rows, DMA'd ONCE as a single contiguous
  multi-MB transfer (double-buffered across group boundaries — the same
  structure as the config-3 X-window SpMM kernel);
* each output band tile ``(i, i+b-W)`` accumulates its (host-planned,
  scalar-prefetched) slot pairs as 128x128 MXU products read from the
  VMEM-resident window;
* output is written ONCE per band slot in band layout
  ``(nbr, 2W+1, T, T)``.

HBM traffic: operand rows ~once (``nsuper * (G+2W)`` rows fetched =
``~(1 + 2W/G)`` x the A stream) + the output band written once — vs the
pair kernel's ``2 * P`` scattered tile fetches. On config 4 that is
22 MB + 48 MB vs 74 MB + 43 MB, with every transfer sequential.

Scope: ``A @ B^T`` (the config-4 ``A A^T`` case and any banded-pair
product). ``A @ B`` callers transpose B host-side first. Matrices whose
pair structure is NOT banded (W exceeding the window budget) raise
:class:`SpSparseError` at plan time — callers fall back to the pair
kernel. Semantics identical to :func:`..spgemm_tiled.spgemm_tiled_pallas`
(f32 accumulation; bf16 operands use DEFAULT precision, f32 HIGHEST —
same ``_pair_dot`` rules; consolidate(ADD) block semantics, reference
contract ``multiply_sparse.hpp:238-243`` via downstream zero-dropping).
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
from ..core.tiled import TILE
from .spgemm_tiled import TiledBlocks

Array = Any

__all__ = ["WindowGemmPlan", "plan_window_spgemm", "spgemm_window_pallas",
           "band_to_tiled_blocks"]

# double-buffered operand-window VMEM budget (bytes)
_GEMM_WINDOW_BUDGET = 24 << 20


@dataclasses.dataclass(frozen=True)
class WindowGemmPlan:
    """Host-side static plan: band geometry + per-band-slot pair tables.

    ``cnt (nbr_pad*NB,)`` pairs per band slot; ``pt/pu (nbr_pad*S,)``
    slot indices into the A/B rows' ``Rt`` layout (0-padded), laid out
    per row with per-band-slot strides ``pmax_band`` (diagonal slots
    carry more pairs than off-diagonal ones — a single global Pmax
    unroll issued 2x the live dot count on config 4, and the kernel is
    MXU-bound at this scale, so the padding was pure cost);
    ``row_lo (nsuper,)`` first operand row of each super-group's
    window."""

    cnt: np.ndarray
    pt: np.ndarray
    pu: np.ndarray
    row_lo: np.ndarray
    W: int
    G: int
    wrows: int
    nbr: int
    nbr_pad: int
    rt_a: int
    rt_b: int
    out_shape: tuple
    shared: bool           # B is A (one window serves both operands)
    pmax_band: tuple       # per band slot unroll caps, len 2W+1

    @property
    def nband(self) -> int:
        return 2 * self.W + 1

    @property
    def nsuper(self) -> int:
        return self.nbr_pad // self.G

    @property
    def n_dots(self) -> int:
        """Dots issued per full product (live + padding)."""
        return self.nbr_pad * sum(self.pmax_band)


def plan_window_spgemm(tcols_a, tcols_b, *, nbc: int, out_shape: tuple,
                       group: int = 16, shared: bool | None = None,
                       dtype=jnp.bfloat16,
                       pmax_cap: int = 16) -> WindowGemmPlan:
    """Plan ``C = A @ B^T`` over the band. Host-side, pattern-only (one
    plan serves any number of value updates).

    Raises :class:`SpSparseError` when the pair band is too wide for the
    VMEM window budget or the per-tile pair count exceeds ``pmax_cap``
    (unrolled in the kernel) — callers fall back to the pair kernel."""
    tca = np.asarray(tcols_a)
    tcb = np.asarray(tcols_b)
    if shared is None:
        shared = tca is tcb or (tca.shape == tcb.shape
                                and np.array_equal(tca, tcb))
    nbr_a, rt_a = tca.shape
    nbr_b, rt_b = tcb.shape
    nbr = max(nbr_a, nbr_b)

    # Tile-level column join (vectorized — the first cut swept a per-row
    # candidate PREFIX, O(nbr^2) even for banded operators): flatten both
    # tcols layouts to (row, slot, col) lists, sort B tiles by column,
    # and match every A tile to its equal-column B tiles via
    # searchsorted — O(P) like plan_tiled_spgemm.
    ia = np.repeat(np.arange(nbr_a), rt_a)
    ta_slot = np.tile(np.arange(rt_a), nbr_a)
    ca = tca.reshape(-1)
    live_a = ca < nbc
    ia, ta_slot, ca = ia[live_a], ta_slot[live_a], ca[live_a]
    jb = np.repeat(np.arange(nbr_b), rt_b)
    ub_slot = np.tile(np.arange(rt_b), nbr_b)
    cb = tcb.reshape(-1)
    live_b = cb < nbc
    jb, ub_slot, cb = jb[live_b], ub_slot[live_b], cb[live_b]

    order_b = np.argsort(cb, kind="stable")
    cb_s = cb[order_b]
    lo = np.searchsorted(cb_s, ca, side="left")
    hi = np.searchsorted(cb_s, ca, side="right")
    cnt_m = hi - lo
    src_a = np.repeat(np.arange(ia.shape[0]), cnt_m)
    if src_a.size:
        within = np.arange(src_a.size) - np.repeat(
            np.cumsum(cnt_m) - cnt_m, cnt_m)
        src_b = order_b[np.repeat(lo, cnt_m) + within]
    else:
        src_b = np.zeros(0, np.int64)
    p_i = ia[src_a]
    p_j = jb[src_b]
    p_t = ta_slot[src_a]
    p_u = ub_slot[src_b]
    p_c = ca[src_a]
    W = int(np.abs(p_i - p_j).max()) if p_i.size else 0

    # group pairs by (i, j), ascending column within a group
    pair_lists: dict[tuple[int, int], tuple[list, list]] = {}
    if p_i.size:
        g_order = np.lexsort((p_c, p_j, p_i))
        p_i, p_j = p_i[g_order], p_j[g_order]
        p_t, p_u = p_t[g_order], p_u[g_order]
        key = p_i * (nbr_b + 1) + p_j
        first = np.concatenate([[True], key[1:] != key[:-1]])
        starts = np.nonzero(first)[0]
        ends = np.append(starts[1:], key.shape[0])
        for s, e in zip(starts, ends):
            pair_lists[(int(p_i[s]), int(p_j[s]))] = (
                p_t[s:e].tolist(), p_u[s:e].tolist())

    NB = 2 * W + 1
    # per-band-slot unroll caps (diag slots carry more pairs)
    pmax_band = [1] * NB
    for (i, j), (ts, _) in pair_lists.items():
        b = j - i + W
        pmax_band[b] = max(pmax_band[b], len(ts))
    if max(pmax_band) > pmax_cap:
        raise SpSparseError(
            f"plan_window_spgemm: {max(pmax_band)} pairs per output tile "
            f"exceeds the unroll cap {pmax_cap}; use the pair kernel")
    S = sum(pmax_band)
    prefix = np.concatenate([[0], np.cumsum(pmax_band)])[:-1]
    G = max(int(group), 1)
    wrows = min(G + 2 * W, nbr)
    if wrows < G + 2 * W:
        G = max(wrows - 2 * W, 1)
        wrows = min(G + 2 * W, nbr)
    esize = np.dtype(dtype).itemsize
    n_win = 1 if shared else 2
    vmem_need = (2 * n_win * wrows * max(rt_a, rt_b) * TILE * TILE * esize
                 + 2 * G * NB * TILE * TILE * 4)   # dbl-buffered out block
    if vmem_need > _GEMM_WINDOW_BUDGET:
        raise SpSparseError(
            f"plan_window_spgemm: window of {wrows} block rows x "
            f"Rt={max(rt_a, rt_b)} (+{G}x{NB} out block) exceeds the VMEM "
            f"budget (band W={W}); shrink group or use the pair kernel")

    nsuper = -(-nbr // G)
    nbr_pad = nsuper * G
    cnt = np.zeros((nbr_pad, NB), np.int32)
    pt = np.zeros((nbr_pad, S), np.int32)
    pu = np.zeros((nbr_pad, S), np.int32)
    for (i, j), (ts, us) in pair_lists.items():
        b = j - i + W
        if not (0 <= b < NB):  # pragma: no cover - W derived from pairs
            continue
        cnt[i, b] = len(ts)
        o = prefix[b]
        pt[i, o: o + len(ts)] = ts
        pu[i, o: o + len(us)] = us
    row_lo = np.clip(np.arange(nsuper) * G - W, 0,
                     max(nbr - wrows, 0)).astype(np.int32)
    return WindowGemmPlan(
        cnt=cnt.reshape(-1), pt=pt.reshape(-1), pu=pu.reshape(-1),
        row_lo=row_lo, W=W, G=G, wrows=wrows, nbr=nbr, nbr_pad=nbr_pad,
        rt_a=rt_a, rt_b=rt_b, out_shape=tuple(out_shape), shared=shared,
        pmax_band=tuple(int(p) for p in pmax_band))


def _window_gemm_kernel(row_lo_ref, cnt_ref, pt_ref, pu_ref, a_hbm, b_hbm,
                        out_ref, awin, bwin, sem_a, sem_b, *,
                        G: int, W: int, NB: int, wrows: int, nbr: int,
                        pmax_band: tuple, shared: bool, f32_hi: bool):
    # ONE grid step per super-group: all G*NB*pmax dots unrolled
    # back-to-back (the first cut ran one grid step per band slot — 768
    # steps on config 4 — and per-step overhead held it to ~53% of the
    # combined roofline; see probes/probe_cfg4_window_r5.py).
    g = pl.program_id(0)
    nsuper = pl.num_programs(0)

    def dma_a(s):
        sj = jnp.minimum(s, nsuper - 1)
        return pltpu.make_async_copy(
            a_hbm.at[pl.ds(row_lo_ref[sj], wrows)], awin.at[s % 2],
            sem_a.at[s % 2])

    def dma_b(s):
        sj = jnp.minimum(s, nsuper - 1)
        return pltpu.make_async_copy(
            b_hbm.at[pl.ds(row_lo_ref[sj], wrows)], bwin.at[s % 2],
            sem_b.at[s % 2])

    @pl.when(g == 0)
    def _():
        dma_a(0).start()
        if not shared:
            dma_b(0).start()

    @pl.when(g + 1 < nsuper)
    def _():
        dma_a(g + 1).start()
        if not shared:
            dma_b(g + 1).start()

    dma_a(g).wait()
    if not shared:
        dma_b(g).wait()

    sl = g % 2
    prec = (jax.lax.Precision.HIGHEST if f32_hi
            else jax.lax.Precision.DEFAULT)
    S = sum(pmax_band)
    prefix = [0]
    for pm in pmax_band:
        prefix.append(prefix[-1] + pm)
    for r in range(G):
        i = g * G + r
        li = jnp.clip(i - row_lo_ref[g], 0, wrows - 1)
        for b in range(NB):
            lj = jnp.clip(i + (b - W) - row_lo_ref[g], 0, wrows - 1)
            base = i * S + prefix[b]
            n_p = jnp.where(i < nbr, cnt_ref[i * NB + b], 0)
            acc = jnp.zeros((TILE, TILE), jnp.float32)
            for p in range(pmax_band[b]):
                t = pt_ref[base + p]
                u = pu_ref[base + p]
                at = awin[sl, li, t]
                bu = (awin if shared else bwin)[sl, lj, u]
                prod = jax.lax.dot_general(
                    at, bu, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                acc = acc + jnp.where(p < n_p, prod, 0.0)
            out_ref[0, r, b] = acc


@functools.partial(jax.jit, static_argnames=(
    "G", "W", "wrows", "nbr", "nbr_pad", "pmax_band", "shared",
    "interpret"))
def _spgemm_window(row_lo, cnt, pt, pu, a_blocks, b_blocks, *, G: int,
                   W: int, wrows: int, nbr: int, nbr_pad: int,
                   pmax_band: tuple, shared: bool,
                   interpret: bool) -> Array:
    NB = 2 * W + 1
    nsuper = nbr_pad // G
    rt_a = a_blocks.shape[1]
    rt_b = b_blocks.shape[1]
    dt = a_blocks.dtype
    f32_hi = dt != jnp.bfloat16
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsuper,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, G, NB, TILE, TILE), lambda g, *_: (g, 0, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, wrows, rt_a, TILE, TILE), dt),
            pltpu.VMEM((2, wrows, rt_b, TILE, TILE) if not shared
                       else (1, 1, 1, 1), dt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_window_gemm_kernel, G=G, W=W, NB=NB,
                          wrows=wrows, nbr=nbr, pmax_band=pmax_band,
                          shared=shared, f32_hi=f32_hi),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsuper, G, NB, TILE, TILE),
                                       jnp.float32),
        interpret=interpret,
    )(row_lo, cnt, pt, pu, a_blocks, b_blocks)
    return out.reshape(nbr_pad, NB, TILE, TILE)


def spgemm_window_pallas(plan: WindowGemmPlan, a_blocks: Array,
                         b_blocks: Array | None = None, *,
                         interpret: bool = False) -> Array:
    """Run the planned band product. ``a_blocks/b_blocks`` are the
    row-grouped dense layouts (``(nbr, Rt, T, T)``); pass ``b_blocks=None``
    for the shared ``A A^T`` case. Returns the output BAND
    ``(nbr_pad, 2W+1, T, T)`` f32 — band slot ``(i, b)`` is output tile
    ``(i, i+b-W)`` (out-of-range/empty slots are zero)."""
    if b_blocks is None:
        if not plan.shared:
            raise SpSparseError("plan is two-operand; pass b_blocks")
        b_blocks = a_blocks[:1, :1] * 0  # placeholder, never read
    return _spgemm_window(
        jnp.asarray(plan.row_lo), jnp.asarray(plan.cnt),
        jnp.asarray(plan.pt), jnp.asarray(plan.pu), a_blocks, b_blocks,
        G=plan.G, W=plan.W, wrows=plan.wrows, nbr=plan.nbr,
        nbr_pad=plan.nbr_pad, pmax_band=plan.pmax_band,
        shared=plan.shared, interpret=interpret)


def band_to_tiled_blocks(band: Array, plan: WindowGemmPlan) -> TiledBlocks:
    """Band layout -> :class:`TiledBlocks` (static pattern; empty/invalid
    band slots get sentinel coordinates so downstream consumers drop
    them — same convention as ``densify_tiled``'s empty filler)."""
    nbr_pad, NB = band.shape[0], band.shape[1]
    i = np.repeat(np.arange(nbr_pad), NB)
    j = i + np.tile(np.arange(NB), nbr_pad) - plan.W
    nbc_out = -(-plan.out_shape[1] // TILE)
    nbr_out = -(-plan.out_shape[0] // TILE)
    live = ((i < plan.nbr) & (j >= 0) & (j < nbc_out)
            & (plan.cnt.reshape(-1) > 0))
    tr = np.where(live, i, nbr_out).astype(np.int32)
    tc = np.where(live, j, nbc_out).astype(np.int32)
    return TiledBlocks(tile_row=jnp.asarray(tr), tile_col=jnp.asarray(tc),
                       blocks=band.reshape(-1, TILE, TILE),
                       shape=plan.out_shape)
