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

__all__ = ["coo_concat", "coo_add", "coo_scale"]


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
