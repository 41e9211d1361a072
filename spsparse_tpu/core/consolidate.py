"""Consolidation: stable lexicographic sort + duplicate merge + zero drop.

TPU-native re-design of the reference's sort/consolidate layer
(/root/reference/slib/spsparse/algorithm.hpp:237-427):

* ``sorted_permutation`` — stable lexsort permutation (reference
  ``algorithm.hpp:411-427``; stability is what makes the LEAVE_ALONE=first /
  REPLACE=last duplicate policies well-defined, ``algorithm.hpp:404-406``).
* ``consolidate`` — sort by ``sort_order``, drop structural zeros (always)
  and NaNs (iff ``zero_nan``), merge duplicate index tuples per
  ``DuplicatePolicy``, mark result sorted (reference ``algorithm.hpp:251-319``).

Where the reference runs ``std::stable_sort`` with a per-element comparator
and a sequential dedup scan, the TPU version is one multi-key
``jax.lax.sort`` (keys = index columns in ``sort_order``, stable, padding
pushed to the end via the out-of-range sentinel) followed by a vectorized
segmented merge (boundary mask → prefix-sum segment ids → segment reduce /
first / last gather). Everything is static-shape and jit-compatible; the
live-entry count travels as the ``nnz`` scalar.

Note on the reference's mid-loop ``zero_nan`` quirk (``algorithm.hpp:291``
drops only zeros mid-stream while ``:274`` also drops NaNs at the head):
this framework implements the *documented* semantics — NaNs are dropped
uniformly iff ``zero_nan`` — and the divergence is pinned in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from .coo import SparseCOO
from .errors import DuplicatePolicy, isnone
from ..utils.trace import traced

__all__ = [
    "consolidate",
    "sorted_permutation",
    "merge_sorted_entries",
    "filter_compact",
    "Consolidated",
]


def filter_compact(a: SparseCOO, keep, *, cap: int | None = None) -> SparseCOO:
    """Keep only entries where ``keep`` is true, compacting to the front.

    Order-preserving (so sortedness metadata survives); jit-compatible.
    ``keep`` is a ``(cap,)`` boolean mask; entries outside the live range are
    dropped regardless.
    """
    keep = jnp.asarray(keep) & a.valid_mask()
    cap_out = a.cap if cap is None else int(cap)
    new_pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    tgt = jnp.where(keep, new_pos, jnp.asarray(cap_out, jnp.int32))
    n_out = jnp.sum(keep).astype(jnp.int32)

    sent = SparseCOO.sentinel_index(a.shape, a.index_dtype)
    out_idx = jnp.broadcast_to(jnp.asarray(sent), (cap_out, a.rank))
    out_idx = out_idx.at[tgt].set(a.indices, mode="drop")
    out_vals = jnp.zeros((cap_out,), a.vals.dtype).at[tgt].set(
        a.vals, mode="drop")
    return SparseCOO(indices=out_idx, vals=out_vals,
                     nnz=jnp.minimum(n_out, cap_out).astype(jnp.int32),
                     shape=a.shape, sort_order=a.sort_order).repad()


def _sort_operands(a: SparseCOO, sort_order: Sequence[int], extra=(),
                   live=None):
    """Stable-sort the entries of ``a`` by its index columns in ``sort_order``.

    Invalid (padding / structurally-zero) entries get sentinel keys so they
    sort to the end. ``live`` overrides the validity mask (defaults to
    ``a.valid_mask()``). Returns ``(sorted_index_cols_natural_order,
    sorted_vals, sorted_valid_mask, sorted_extras)``.
    """
    rank = a.rank
    sort_order = tuple(sort_order)
    if live is None:
        live = a.valid_mask()
    vals = jnp.where(live, a.vals, jnp.zeros((), a.vals.dtype))

    key_cols = []
    for d in sort_order:
        sent = jnp.asarray(a.shape[d], a.indices.dtype)
        key_cols.append(jnp.where(live, a.indices[:, d], sent))
    # Carry the remaining (non-key) index columns, validity, vals, extras.
    other_dims = [d for d in range(rank) if d not in sort_order]
    carried = (
        [a.indices[:, d] for d in other_dims]
        + [live.astype(jnp.int32), vals]
        + list(extra)
    )
    out = jax.lax.sort(
        tuple(key_cols) + tuple(carried),
        num_keys=len(sort_order),
        is_stable=True,
    )
    skeys = out[: len(sort_order)]
    scarried = out[len(sort_order):]
    sother = scarried[: len(other_dims)]
    slive = scarried[len(other_dims)] == 1
    svals = scarried[len(other_dims) + 1]
    sextra = scarried[len(other_dims) + 2:]

    # Reassemble index columns in natural dimension order.
    cols: list = [None] * rank
    for pos, d in enumerate(sort_order):
        cols[d] = skeys[pos]
    for pos, d in enumerate(other_dims):
        cols[d] = sother[pos]
    return cols, svals, slive, sextra


def sorted_permutation(a: SparseCOO, sort_order: Sequence[int]) -> jnp.ndarray:
    """Stable lexsort permutation over the *live* entries of ``a``.

    Mirrors reference ``sorted_permutation`` (``algorithm.hpp:411-427``):
    returns positions such that iterating ``a`` entries at those positions
    visits them in ``sort_order``-lexicographic order, ties in insertion
    order. Shape ``(cap,)``; entries past ``nnz`` are the padding positions.
    """
    pos = jnp.arange(a.cap, dtype=jnp.int32)
    _, _, _, (sperm,) = _sort_operands(a, sort_order, extra=(pos,))
    return sperm


def merge_sorted_entries(
    index_cols: Sequence[jnp.ndarray],
    vals: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    shape: Sequence[int],
    duplicate_policy: DuplicatePolicy = DuplicatePolicy.ADD,
    cap: int,
    sort_order: tuple | None = None,
    index_dtype=None,
) -> SparseCOO:
    """Merge runs of equal index tuples in already-sorted entry streams.

    The vectorized equivalent of the reference's sequential dedup scan
    (``algorithm.hpp:269-314``). Inputs are parallel arrays sorted so that
    equal index tuples are adjacent, valid entries precede invalid ones, and
    insertion order is preserved within runs (what a stable sort yields).

    * ``ADD``: segment sum.
    * ``LEAVE_ALONE``: first value of each run (``algorithm.hpp:307`` — no-op
      on later duplicates).
    * ``REPLACE``: last value of each run (``algorithm.hpp:309-310``).

    Returns a compact :class:`SparseCOO` of capacity ``cap``; runs beyond
    ``cap`` are dropped (callers choose ``cap`` >= worst case when exactness
    is required — consolidation's worst case is the input capacity).
    """
    n = vals.shape[0]
    index_dtype = index_dtype or index_cols[0].dtype
    vals = jnp.where(valid, vals, jnp.zeros((), vals.dtype))

    same_as_prev = jnp.ones((n,), bool)
    for col in index_cols:
        same_as_prev &= col == jnp.roll(col, 1)
    same_as_prev = same_as_prev.at[0].set(False)
    is_new = valid & ~same_as_prev
    seg_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # -1 before first run
    n_out = jnp.sum(is_new).astype(jnp.int32)

    # Scatter target: run id for run starts/ends, else out-of-range (dropped).
    drop = jnp.asarray(cap, jnp.int32)
    start_tgt = jnp.where(is_new, seg_id, drop)

    if duplicate_policy == DuplicatePolicy.ADD:
        seg_for_sum = jnp.where(valid & (seg_id >= 0), seg_id, drop)
        out_vals = jnp.zeros((cap,), vals.dtype).at[seg_for_sum].add(
            vals, mode="drop")
    elif duplicate_policy == DuplicatePolicy.LEAVE_ALONE:
        out_vals = jnp.zeros((cap,), vals.dtype).at[start_tgt].set(
            vals, mode="drop")
    elif duplicate_policy == DuplicatePolicy.REPLACE:
        # A valid entry ends its run if the next entry starts a new run or
        # there is no next valid entry (valid entries are contiguous at the
        # front, so the last valid entry always ends a run).
        nxt = jnp.arange(n, dtype=jnp.int32) + 1
        next_new = jnp.where(nxt < n, jnp.roll(is_new, -1), True)
        next_valid = jnp.where(nxt < n, jnp.roll(valid, -1), False)
        is_last = valid & (next_new | ~next_valid)
        end_tgt = jnp.where(is_last, seg_id, drop)
        out_vals = jnp.zeros((cap,), vals.dtype).at[end_tgt].set(
            vals, mode="drop")
    else:  # pragma: no cover
        raise ValueError(f"unknown duplicate policy {duplicate_policy}")

    shape = tuple(int(s) for s in shape)
    sent = SparseCOO.sentinel_index(shape, index_dtype)
    out_idx = jnp.broadcast_to(
        jnp.asarray(sent), (cap, len(shape))).astype(index_dtype)
    out_cols = []
    for k, col in enumerate(index_cols):
        out_col = jnp.full((cap,), sent[k], dtype=index_dtype).at[
            start_tgt].set(col.astype(index_dtype), mode="drop")
        out_cols.append(out_col)
    out_idx = jnp.stack(out_cols, axis=1)

    out = SparseCOO(indices=out_idx, vals=out_vals,
                    nnz=jnp.minimum(n_out, cap).astype(jnp.int32),
                    shape=shape, sort_order=sort_order)
    return out.repad()


@traced("spsparse.consolidate")
def consolidate(
    a: SparseCOO,
    sort_order: Sequence[int] | None = None,
    duplicate_policy: DuplicatePolicy = DuplicatePolicy.ADD,
    zero_nan: bool = False,
    *,
    cap: int | None = None,
) -> SparseCOO:
    """Sort ``a`` by ``sort_order``, drop zeros/NaNs, merge duplicates.

    Functional equivalent of reference ``consolidate``
    (``algorithm.hpp:251-319``). Structural zeros in the *input* are dropped
    before merging (so a zero never overwrites under REPLACE); merged sums
    that happen to equal zero are kept, exactly like the reference (the
    dedup scan emits the accumulator unconditionally, ``algorithm.hpp:287``).
    The result is marked sorted with ``sort_order``.
    """
    if sort_order is None:
        sort_order = tuple(range(a.rank))
    sort_order = tuple(int(d) for d in sort_order)
    cap_out = a.cap if cap is None else int(cap)

    # Structurally-zero entries (0, NaN iff zero_nan) are dropped up front —
    # they get sentinel keys and sort behind every real entry.
    live = a.valid_mask() & ~isnone(a.vals, zero_nan)
    cols, svals, slive, _ = _sort_operands(a, sort_order, live=live)

    return merge_sorted_entries(
        cols, svals, slive,
        shape=a.shape,
        duplicate_policy=duplicate_policy,
        cap=cap_out,
        sort_order=sort_order,
        index_dtype=a.index_dtype,
    )


class Consolidated:
    """Lazily consolidate only when needed (reference ``Consolidate`` RAII
    wrapper, ``algorithm.hpp:324-369``): if ``a.sort_order`` already matches,
    the original array is used as-is."""

    def __init__(self, a: SparseCOO, sort_order: Sequence[int],
                 duplicate_policy: DuplicatePolicy = DuplicatePolicy.ADD,
                 zero_nan: bool = False, cap: int | None = None):
        sort_order = tuple(int(d) for d in sort_order)
        if a.sort_order == sort_order:
            self._a = a if cap is None else a.with_capacity(cap)
        else:
            self._a = consolidate(a, sort_order, duplicate_policy, zero_nan,
                                  cap=cap)

    def __call__(self) -> SparseCOO:
        return self._a
