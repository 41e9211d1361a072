"""Elementwise sparse algebra: concatenation, linear combination, scaling.

The reference composes these from its accumulator protocol — streaming two
arrays into one output via ``copy()`` then consolidating merges them
(``algorithm.hpp:30-37`` + ``algorithm.hpp:251-319``). Here the same
composition is a first-class, jit-compatible op: concatenate the padded
buffers, compact live entries to the front with one stable single-key sort
(no scatters — see :func:`.consolidate.compact_select`), and consolidate
under the caller's duplicate policy. ``ADD`` yields sparse matrix addition
``alpha*A + beta*B``; ``LEAVE_ALONE``/``REPLACE`` give first/last-operand-
wins overlay semantics (insertion order = all of ``a``, then all of ``b``,
exactly like two successive reference ``copy()`` calls).

All capacities are static (derived from operand caps, not live counts), so
these work identically under ``jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from .consolidate import compact_select, consolidate
from .coo import SparseCOO, round_up_pow2
from .errors import DuplicatePolicy, SpSparseError

Array = Any

__all__ = ["coo_concat", "coo_add", "coo_scale",
           "coo_hstack", "coo_vstack", "coo_block_diag"]


def coo_concat(*arrays: SparseCOO, cap: int | None = None) -> SparseCOO:
    """Concatenate the live entries of sparse arrays of identical shape
    into one (unsorted) COO; duplicates are preserved, entry order is
    operand order (so a later consolidate's first/last policies see the
    reference's insertion-order semantics). ``cap`` defaults to the sum of
    operand caps rounded up to a power of two (static). An explicit
    ``cap`` smaller than the total live count raises when the counts are
    concrete; under ``jit`` (traced counts) it cannot be checked and
    would corrupt the output — pass the default there."""
    if not arrays:
        raise SpSparseError("coo_concat requires at least one operand")
    shape = arrays[0].shape
    for x in arrays[1:]:
        if x.shape != shape:
            raise SpSparseError(
                f"coo_concat shape mismatch: {x.shape} vs {shape}")
    if cap is None:
        cap = round_up_pow2(sum(x.cap for x in arrays))
    else:
        cap = int(cap)
        total = 0
        for x in arrays:
            try:
                total += int(x.nnz)
            except Exception:            # traced under jit: not checkable
                total = None
                break
        if total is not None and cap < total:
            raise SpSparseError(
                f"coo_concat cap={cap} < total live entries {total}")
    idt = arrays[0].index_dtype
    vdt = arrays[0].dtype
    for x in arrays[1:]:
        idt = jnp.promote_types(idt, x.index_dtype)
        vdt = jnp.promote_types(vdt, x.dtype)
    rank = arrays[0].rank  # ranks are equal: shape equality covers length
    cols = [jnp.concatenate([x.indices[:, d].astype(idt) for x in arrays])
            for d in range(rank)]
    vals = jnp.concatenate([x.vals.astype(vdt) for x in arrays], axis=0)
    valid = jnp.concatenate([x.valid_mask() for x in arrays], axis=0)
    carried, n = compact_select(valid, tuple(cols) + (vals,), cap_out=cap)
    # Under jit an undersized explicit cap is unverifiable; clamping keeps
    # the nnz <= cap container invariant (entries past cap are dropped in
    # operand order — documented above).
    n = jnp.minimum(n, jnp.asarray(cap, n.dtype))
    live = jnp.arange(cap, dtype=jnp.int32) < n
    idx_c = jnp.stack([jnp.where(live, c, jnp.asarray(s, idt))
                       for c, s in zip(carried[:rank], shape)], axis=1)
    vals_c = jnp.where(live, carried[rank], 0)
    return SparseCOO(indices=idx_c, vals=vals_c, nnz=n, shape=shape,
                     sort_order=None)


def coo_add(a: SparseCOO, b: SparseCOO, *, alpha=1.0, beta=1.0,
            duplicate_policy: DuplicatePolicy = DuplicatePolicy.ADD,
            zero_nan: bool = False, cap: int | None = None) -> SparseCOO:
    """``alpha*A + beta*B`` (under ``ADD``), sorted row-major.

    With ``LEAVE_ALONE`` the result is "B's entries only where A has
    none" (A wins); with ``REPLACE``, B overlays A. Consolidate semantics
    apply: structural zeros in the inputs are dropped up front, but merged
    sums that cancel to exactly zero are *kept* (reference
    ``algorithm.hpp:287`` — re-consolidate to drop them). ``cap`` bounds
    the output (default: ``a.cap + b.cap``, static)."""
    av = coo_scale(a, alpha)
    bv = coo_scale(b, beta)
    both = coo_concat(av, bv, cap=cap)
    return consolidate(both, None, duplicate_policy, zero_nan)


def coo_scale(a: SparseCOO, c) -> SparseCOO:
    """``c * A`` — elementwise value scaling; structure (and sortedness
    metadata) unchanged. Padding stays zero because padding values are
    zero by convention."""
    return dataclasses.replace(a, vals=a.vals * jnp.asarray(c, a.dtype))


def _coo_stack2d(arrays, row_offs, col_offs, out_shape,
                 cap: int | None) -> SparseCOO:
    """Shared core of hstack/vstack/block_diag: shift each operand's live
    indices by its (row, col) offset, concatenate, compact live entries to
    the front (one stable single-key sort; no scatters). Unsorted result,
    operand entry order preserved — exactly the insertion-order contract
    successive reference ``copy()`` calls into one accumulator would give
    (``algorithm.hpp:30-37``)."""
    from .coo import default_index_dtype

    if cap is None:
        cap = round_up_pow2(sum(x.cap for x in arrays))
    else:
        # Same eager guard as coo_concat: an undersized explicit cap with
        # concrete counts must raise, not silently drop trailing entries
        # (under jit, traced counts cannot be checked — pass the default).
        cap = int(cap)
        total = 0
        for x in arrays:
            try:
                total += int(x.nnz)
            except Exception:            # traced under jit: not checkable
                total = None
                break
        if total is not None and cap < total:
            raise SpSparseError(
                f"stacking cap={cap} < total live entries {total}")
    idt = default_index_dtype(out_shape)
    for x in arrays:
        idt = jnp.promote_types(idt, x.index_dtype)
    vdt = arrays[0].dtype
    for x in arrays[1:]:
        vdt = jnp.promote_types(vdt, x.dtype)
    sent = SparseCOO.sentinel_index(out_shape, idt)
    rows, cols, vals, valid = [], [], [], []
    for x, ro, co in zip(arrays, row_offs, col_offs):
        lv = x.valid_mask()
        rows.append(jnp.where(lv, x.indices[:, 0].astype(idt) + ro,
                              sent[0]))
        cols.append(jnp.where(lv, x.indices[:, 1].astype(idt) + co,
                              sent[1]))
        vals.append(x.vals.astype(vdt))
        valid.append(lv)
    carried, n = compact_select(
        jnp.concatenate(valid),
        (jnp.concatenate(rows), jnp.concatenate(cols),
         jnp.concatenate(vals)), cap_out=int(cap))
    out = SparseCOO(indices=jnp.stack(carried[:2], axis=1),
                    vals=carried[2],
                    nnz=jnp.minimum(n, cap).astype(jnp.int32),
                    shape=tuple(int(s) for s in out_shape),
                    sort_order=None)
    return out.repad()


def _check_rank2(arrays, name):
    if not arrays:
        raise SpSparseError(f"{name} requires at least one operand")
    for x in arrays:
        if x.rank != 2:
            raise SpSparseError(f"{name} requires rank-2 arrays, got "
                                f"shape {x.shape}")


def coo_hstack(*arrays: SparseCOO, cap: int | None = None) -> SparseCOO:
    """``[A B ...]`` — horizontal stacking of rank-2 arrays with equal row
    counts (scipy.sparse.hstack). jit-compatible (static shapes/caps)."""
    _check_rank2(arrays, "coo_hstack")
    nr = arrays[0].shape[0]
    for x in arrays[1:]:
        if x.shape[0] != nr:
            raise SpSparseError(
                f"coo_hstack row mismatch: {x.shape[0]} vs {nr}")
    offs = [0]
    for x in arrays:
        offs.append(offs[-1] + int(x.shape[1]))
    return _coo_stack2d(arrays, [0] * len(arrays), offs[:-1],
                        (nr, offs[-1]), cap)


def coo_vstack(*arrays: SparseCOO, cap: int | None = None) -> SparseCOO:
    """``[A; B; ...]`` — vertical stacking of rank-2 arrays with equal
    column counts (scipy.sparse.vstack). jit-compatible."""
    _check_rank2(arrays, "coo_vstack")
    nc = arrays[0].shape[1]
    for x in arrays[1:]:
        if x.shape[1] != nc:
            raise SpSparseError(
                f"coo_vstack column mismatch: {x.shape[1]} vs {nc}")
    offs = [0]
    for x in arrays:
        offs.append(offs[-1] + int(x.shape[0]))
    return _coo_stack2d(arrays, offs[:-1], [0] * len(arrays),
                        (offs[-1], nc), cap)


def coo_block_diag(*arrays: SparseCOO, cap: int | None = None) -> SparseCOO:
    """``diag(A, B, ...)`` — block-diagonal composition of rank-2 arrays
    (scipy.sparse.block_diag); the natural assembly for independent
    subdomain operators ahead of one batched solve. jit-compatible."""
    _check_rank2(arrays, "coo_block_diag")
    ro, co = [0], [0]
    for x in arrays:
        ro.append(ro[-1] + int(x.shape[0]))
        co.append(co[-1] + int(x.shape[1]))
    return _coo_stack2d(arrays, ro[:-1], co[:-1], (ro[-1], co[-1]), cap)
