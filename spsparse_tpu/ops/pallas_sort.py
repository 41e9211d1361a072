"""Pallas TPU kernel: in-VMEM bitonic block sort.

``lax.sort`` on TPU executes its O(log^2 n) compare-exchange network as
full HBM passes (measured v5e: 0.28-0.59 Gelem/s at 8M for key+payload
sorts, scaling with operand count); this kernel runs the whole network on
VMEM-resident blocks instead, reading and writing HBM once per block.
It is the building block for block-local sorts (SpGEMM row segments,
bucketed sample sort) and for consolidate on matrices that fit a block.

Design notes (probed on v5e, ``probes/probe_sort_r2*.py``):

* A fully unrolled network (55-136 stages of rolls/selects) crashes or
  stalls the Mosaic compiler. The kernel instead runs a ``fori_loop``
  over stages with a ``lax.switch`` over ~7+log2(R) tiny branches — one
  per compare-exchange *distance* (roll shifts must be static) — with the
  per-stage direction mask derived from an SMEM span table. Compile time
  stays flat in block size; stage count only changes the loop trip.
* Lane-distance partners (d < 128) use ``pltpu.roll`` pairs (measured
  ~1 elementwise-op cost each); row-distance partners are a
  reshape + concat half-swap (``lax.rev`` does not lower; sublane rolls
  at large R crash Mosaic).
* Elements are ordered row-major within an ``(R, 128)`` block; the block
  is the sort domain. Multiple blocks sort independently via the grid.

Stability: a bitonic network is not stable. Callers needing stability
(consolidate's LEAVE_ALONE/REPLACE contract) must pack the insertion
position into the low bits of the key (making keys unique), which this
module's :func:`sort_blocks_stable` does for them.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = Any

__all__ = ["sort_blocks", "sort_blocks_stable", "plan_stages"]

L = 128


def plan_stages(n: int):
    """The bitonic network for n=R*128 elements: per stage (distance d,
    span) with d the partner distance and span the direction period.
    Returns (branch_ids, span_masks, n_stages)."""
    stages = []
    span = 2
    while span <= n:
        d = span // 2
        while d >= 1:
            stages.append((d, span if span < n else 2 * n))
            d //= 2
        span *= 2
    branch = []
    span_masks = []
    for d, sm in stages:
        if d < L:
            branch.append(int(np.log2(d)))
        else:
            branch.append(7 + int(np.log2(d // L)))
        span_masks.append(sm)
    return (np.asarray(branch, np.int32), np.asarray(span_masks, np.int32),
            len(stages))


def _lex_le(a: Sequence, b: Sequence, num_keys: int):
    """Lexicographic a <= b over the first num_keys arrays."""
    out = None
    for i in reversed(range(num_keys)):
        lt = a[i] < b[i]
        if out is None:
            out = a[i] <= b[i]
        else:
            out = lt | ((a[i] == b[i]) & out)
    return out


def _sort_kernel(branch_ref, span_ref, e_ref, *refs, R: int, n_arrays: int,
                 num_keys: int, n_stages: int, interpret: bool):
    in_refs = refs[:n_arrays]
    out_refs = refs[n_arrays:]
    e = e_ref[0]
    lane = e % jnp.int32(L)
    row = e // jnp.int32(L)
    roll = jnp.roll if interpret else pltpu.roll

    def lane_branch(d):
        def f(op):
            arrs, up = op
            mask_lo = (lane & d) == 0
            partners = tuple(
                jnp.where(mask_lo, roll(a, L - d, 1), roll(a, d, 1))
                for a in arrs)
            return _ce(arrs, partners, mask_lo, up)
        return f

    def row_branch(rd):
        def f(op):
            arrs, up = op
            mask_lo = (row & rd) == 0

            def rswap(x):
                g = x.reshape(R // (2 * rd), 2, rd, L)
                sw = jnp.concatenate([g[:, 1:2], g[:, 0:1]], axis=1)
                return sw.reshape(R, L)
            partners = tuple(rswap(a) for a in arrs)
            return _ce(arrs, partners, mask_lo, up)
        return f

    def _ce(arrs, partners, mask_lo, up):
        le = _lex_le(arrs, partners, num_keys)
        ge = _lex_le(partners, arrs, num_keys)
        # NB: jnp.where on *boolean* operands crashes the Mosaic compiler
        # (probed, v5e 2026-08); select booleans with logical ops instead.
        keep = (mask_lo & (le == up)) | (~mask_lo & (ge == up))
        return tuple(jnp.where(keep, a, p) for a, p in zip(arrs, partners))

    branches = [lane_branch(1 << i) for i in range(7)]
    r = 1
    while r < R:
        branches.append(row_branch(r))
        r *= 2

    def body(s, arrs):
        up = (e & span_ref[s]) == 0
        return jax.lax.switch(branch_ref[s], branches, (arrs, up))

    arrs = tuple(ref[0] for ref in in_refs)
    arrs = jax.lax.fori_loop(0, n_stages, body, arrs)
    for ref, a in zip(out_refs, arrs):
        ref[0] = a


@functools.partial(jax.jit,
                   static_argnames=("num_keys", "interpret"))
def _sort_blocks(branch, span, eidx, arrays, *, num_keys: int,
                 interpret: bool):
    nblk, R, Lx = arrays[0].shape
    n_arrays = len(arrays)
    n_stages = branch.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((1, R, L), lambda b, *_: (0, 0, 0))]
        + [pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0))
           for _ in range(n_arrays)],
        out_specs=tuple(pl.BlockSpec((1, R, L), lambda b, *_: (b, 0, 0))
                        for _ in range(n_arrays)),
    )
    out = pl.pallas_call(
        functools.partial(_sort_kernel, R=R, n_arrays=n_arrays,
                          num_keys=num_keys, n_stages=n_stages,
                          interpret=interpret),
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct((nblk, R, L), a.dtype)
                        for a in arrays),
        interpret=interpret,
    )(branch, span, eidx, *arrays)
    return out


def sort_blocks(arrays: Sequence[Array], *, num_keys: int = 1,
                interpret: bool = False) -> tuple:
    """Sort each ``(R, 128)`` block of ``(nblk, R, 128)`` arrays ascending
    by the first ``num_keys`` arrays (lexicographic), carrying the rest.

    All arrays must share the block shape; R must be a power of two.
    Elements are ordered row-major within a block. NOT stable — see
    :func:`sort_blocks_stable`.
    """
    arrays = tuple(jnp.asarray(a) for a in arrays)
    nblk, R, Lx = arrays[0].shape
    if Lx != L or R & (R - 1):
        raise ValueError(f"block must be (R=2^k, {L}); got ({R}, {Lx})")
    branch, span, _ = plan_stages(R * L)
    eidx = jnp.asarray(
        np.arange(R * L, dtype=np.int32).reshape(1, R, L))
    return _sort_blocks(jnp.asarray(branch), jnp.asarray(span), eidx,
                        arrays, num_keys=num_keys, interpret=interpret)


def sort_blocks_stable(key: Array, payloads: Sequence[Array] = (), *,
                       key_bound: int | None = None,
                       interpret: bool = False) -> tuple:
    """Stable ascending block sort of int32 ``key`` (+ payload arrays).

    Stability is bought by tie-breaking on the in-block element position:
    when ``key_bound * R * 128 <= 2^31`` the position packs into the key
    itself (single-key network, cheapest); otherwise the position rides as
    a second lex key. Returns ``(sorted_key, *sorted_payloads)``.
    """
    key = jnp.asarray(key)
    nblk, R, Lx = key.shape
    n = R * Lx
    pos = jnp.asarray(np.arange(n, dtype=np.int32).reshape(1, R, Lx))
    pos = jnp.broadcast_to(pos, (nblk, R, Lx))
    if key_bound is not None and key_bound * n <= 2 ** 31:
        packed = key * jnp.int32(n) + pos
        out = sort_blocks((packed,) + tuple(payloads), num_keys=1,
                          interpret=interpret)
        return (out[0] // jnp.int32(n),) + out[1:]
    out = sort_blocks((key, pos) + tuple(payloads), num_keys=2,
                      interpret=interpret)
    return (out[0],) + out[2:]
