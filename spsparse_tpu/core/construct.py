"""Constructors and structural conveniences (eye/diags/random, slicing,
row/col reductions and scaling).

The reference builds everything through ``VectorCooArray::add`` loops;
these are the vectorized constructors and manipulations users of any
sparse library reach for (scipy.sparse naming where it fits). All
manipulation ops are jit-compatible; constructors are host-side eager
(they produce new static shapes by nature).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np

from .coo import CooBuilder, SparseCOO
from .errors import SpSparseError

Array = Any

__all__ = ["coo_eye", "coo_diags", "coo_random", "coo_slice", "coo_kron",
           "coo_filter", "coo_tril", "coo_triu",
           "row_sums", "col_sums", "scale_rows", "scale_cols", "coo_norm"]


def coo_eye(n: int, m: int | None = None, k: int = 0,
            dtype=jnp.float32) -> SparseCOO:
    """Identity / shifted-identity matrix (scipy.sparse.eye)."""
    m = n if m is None else m
    lo, hi = max(0, -k), min(n, m - k)
    b = CooBuilder((n, m), dtype=dtype)
    if hi > lo:
        r = np.arange(lo, hi)
        b.add_many(np.stack([r, r + k], 1), np.ones(hi - lo))
    return b.build()


def coo_diags(diagonals: Sequence, offsets: Sequence[int],
              shape: tuple[int, int], dtype=jnp.float32) -> SparseCOO:
    """Banded matrix from per-diagonal value arrays (scipy.sparse.diags).

    ``diagonals[d]`` holds the values of diagonal ``offsets[d]``, length
    equal to that diagonal's in-bounds extent (or a scalar to broadcast).
    """
    n, m = shape
    b = CooBuilder(shape, dtype=dtype)
    for vals, off in zip(diagonals, offsets):
        lo, hi = max(0, -off), min(n, m - off)
        if hi <= lo:
            continue
        r = np.arange(lo, hi)
        v = np.broadcast_to(np.asarray(vals, np.float64), (hi - lo,))
        b.add_many(np.stack([r, r + off], 1), v)
    return b.build()


def coo_random(shape: Sequence[int], density: float, *, seed: int = 0,
               dtype=jnp.float32) -> SparseCOO:
    """Uniform-random sparse array of approximate ``density``
    (scipy.sparse.random; duplicate draws merge, so realized density can
    be marginally lower)."""
    rng = np.random.default_rng(seed)
    total = int(np.prod(shape))
    nnz = int(round(density * total))
    b = CooBuilder(shape, dtype=dtype)
    if nnz:
        idx = np.stack([rng.integers(0, s, nnz) for s in shape], axis=1)
        b.add_many(idx, rng.uniform(-1, 1, nnz))
    return b.build().consolidate(tuple(range(len(shape))))


def coo_kron(a: SparseCOO, b: SparseCOO) -> SparseCOO:
    """Kronecker product ``A (x) B`` of rank-2 arrays (scipy.sparse.kron)
    — how 2-/3-D stencil and graph-Laplacian operators are assembled from
    1-D pieces. Host-side eager (output nnz = nnz_a * nnz_b sets a new
    static capacity by nature); the outer product of the entry lists is
    fully vectorized."""
    if a.rank != 2 or b.rank != 2:
        raise SpSparseError("coo_kron requires rank-2 operands")
    ia, va = a.to_lists()
    ib, vb = b.to_lists()
    ia = np.asarray(ia, np.int64).reshape(len(va), 2)
    ib = np.asarray(ib, np.int64).reshape(len(vb), 2)
    va, vb = np.asarray(va), np.asarray(vb)
    bn, bm = b.shape
    shape = (a.shape[0] * bn, a.shape[1] * bm)
    out = CooBuilder(shape, dtype=jnp.promote_types(a.dtype, b.dtype))
    if len(va) and len(vb):
        rows = (ia[:, 0][:, None] * bn + ib[:, 0][None, :]).ravel()
        cols = (ia[:, 1][:, None] * bm + ib[:, 1][None, :]).ravel()
        out.add_many(np.stack([rows, cols], 1),
                     (va[:, None] * vb[None, :]).ravel())
    return out.build()


def coo_kronsum(a: SparseCOO, b: SparseCOO) -> SparseCOO:
    """Kronecker sum ``kron(I_n, A) + kron(B, I_m)`` for square rank-2
    ``A (m, m)`` and ``B (n, n)`` — scipy.sparse.kronsum's convention
    exactly. The standard assembly of a 2-D operator from two 1-D ones
    (e.g. the 5-point Laplacian from two tridiagonal pieces). Host-side
    eager, like :func:`coo_kron`."""
    if a.rank != 2 or a.shape[0] != a.shape[1]:
        raise SpSparseError(f"coo_kronsum needs square A, got {a.shape}")
    if b.rank != 2 or b.shape[0] != b.shape[1]:
        raise SpSparseError(f"coo_kronsum needs square B, got {b.shape}")
    from .algebra import coo_add
    dt = jnp.promote_types(a.dtype, b.dtype)
    left = coo_kron(coo_eye(int(b.shape[0]), dtype=dt), a)
    right = coo_kron(b, coo_eye(int(a.shape[0]), dtype=dt))
    return coo_add(left, right)


def coo_slice(a: SparseCOO, starts: Sequence[int],
              stops: Sequence[int]) -> SparseCOO:
    """Rectangular submatrix ``a[starts[0]:stops[0], ...]`` (rank-N).

    Bounds are static (they set the output shape); entry selection and
    index shifting are vectorized and jit-compatible. Duplicates and
    sortedness metadata survive (a slice of a sorted array is sorted)."""
    if len(starts) != a.rank or len(stops) != a.rank:
        raise SpSparseError("coo_slice bounds must match rank")
    starts = tuple(int(s) for s in starts)
    stops = tuple(min(int(e), ext) for e, ext in zip(stops, a.shape))
    if any(s < 0 or s > e for s, e in zip(starts, stops)):
        raise SpSparseError(f"bad slice bounds {starts}..{stops}")
    new_shape = tuple(e - s for s, e in zip(starts, stops))
    lo = jnp.asarray(starts, a.index_dtype)
    hi = jnp.asarray(stops, a.index_dtype)
    inside = (a.valid_mask()
              & jnp.all((a.indices >= lo) & (a.indices < hi), axis=1))
    sent = jnp.asarray(new_shape, a.index_dtype)
    idx = jnp.where(inside[:, None], a.indices - lo, sent)
    vals = jnp.where(inside, a.vals, 0)
    # Compact live entries to the front (order-preserving single-key sort;
    # see consolidate.compact_select) so nnz/valid_mask stay canonical.
    from .consolidate import compact_select
    cols = tuple(idx[:, d] for d in range(a.rank)) + (vals,)
    carried, n = compact_select(inside, cols, cap_out=a.cap)
    live = jnp.arange(a.cap, dtype=jnp.int32) < n
    out_idx = jnp.stack([jnp.where(live, c, jnp.asarray(s, a.index_dtype))
                         for c, s in zip(carried[:-1], new_shape)], axis=1)
    out_vals = jnp.where(live, carried[-1], 0)
    return SparseCOO(indices=out_idx, vals=out_vals, nnz=n,
                     shape=new_shape, sort_order=a.sort_order)


def _axis_sums(a: SparseCOO, axis: int) -> Array:
    if a.rank != 2:
        raise SpSparseError("row/col sums require a rank-2 array")
    keep = 1 - axis
    n = a.shape[keep]
    ids = jnp.where(a.valid_mask(), a.indices[:, keep],
                    jnp.asarray(n, a.index_dtype))
    return jnp.zeros(n, a.dtype).at[ids].add(
        jnp.where(a.valid_mask(), a.vals, 0), mode="drop")


def row_sums(a: SparseCOO) -> Array:
    """Dense ``(nrows,)`` vector of row sums (= ``A @ ones``)."""
    return _axis_sums(a, axis=1)


def col_sums(a: SparseCOO) -> Array:
    """Dense ``(ncols,)`` vector of column sums (= ``ones @ A``)."""
    return _axis_sums(a, axis=0)


def scale_rows(a: SparseCOO, s: Array) -> SparseCOO:
    """``diag(s) @ A`` for a dense ``s (nrows,)`` — structure preserved,
    one gather + multiply on the values (the cheap special case of the
    multiply chain's ``scalei`` for fully-dense scales)."""
    if a.rank != 2:
        raise SpSparseError("scale_rows requires a rank-2 array")
    s = jnp.asarray(s)
    g = jnp.take(s, a.indices[:, 0], mode="fill", fill_value=0)
    return dataclasses.replace(a, vals=a.vals * g.astype(a.dtype))


def scale_cols(a: SparseCOO, s: Array) -> SparseCOO:
    """``A @ diag(s)`` for a dense ``s (ncols,)``."""
    if a.rank != 2:
        raise SpSparseError("scale_cols requires a rank-2 array")
    s = jnp.asarray(s)
    g = jnp.take(s, a.indices[:, 1], mode="fill", fill_value=0)
    return dataclasses.replace(a, vals=a.vals * g.astype(a.dtype))


def coo_norm(a: SparseCOO, ord="fro") -> Array:
    """Matrix/array norm over the live entries (scipy.sparse.linalg.norm
    naming). Computed on the RAW entry stream: with duplicate index
    tuples present, opposite-sign duplicates do not cancel — consolidate
    first for the merged-matrix norm (scipy arrays are born merged, so a
    consolidated operand matches scipy exactly).

    * ``"fro"`` (default): ``sqrt(sum v^2)`` — any rank.
    * ``1``: max column absolute sum (rank 2).
    * ``jnp.inf``: max row absolute sum (rank 2).
    * ``"max"``: largest absolute entry value (any rank).

    jit-compatible; returns a scalar array."""
    live = a.valid_mask()
    v = jnp.where(live, a.vals, 0)
    if ord == "fro":
        return jnp.sqrt(jnp.sum(v * v))
    if ord == "max":
        return jnp.max(jnp.abs(v))
    if ord in (1, jnp.inf, np.inf):
        if a.rank != 2:
            raise SpSparseError("1/inf norms require a rank-2 array")
        # 1-norm = max COLUMN abs sum (group by index dim 1); inf-norm =
        # max ROW abs sum (group by dim 0).
        axis = 1 if ord == 1 else 0
        n = int(a.shape[axis])
        ids = jnp.where(live, a.indices[:, axis], n)
        sums = jnp.zeros(n, a.dtype).at[ids].add(jnp.abs(v), mode="drop")
        return jnp.max(sums) if n else jnp.zeros((), a.dtype)
    raise SpSparseError(f"unsupported norm ord {ord!r}")


def coo_filter(a: SparseCOO, pred) -> SparseCOO:
    """Keep entries where ``pred(indices, vals) -> bool (cap,)`` is true.

    The structural filter primitive (tril/triu/band/threshold selections
    are one-liners on top). Vectorized + jit-compatible: selection is a
    mask, live entries compact to the front with an order-preserving
    single-key sort (consolidate.filter_compact, which also packs index
    columns into fewer sort-payload words), so entry order — and
    therefore sortedness metadata — survives. No reference counterpart
    (the reference filters by hand-written add() loops)."""
    from .consolidate import filter_compact
    return filter_compact(a, jnp.asarray(pred(a.indices, a.vals), bool))


def coo_tril(a: SparseCOO, k: int = 0) -> SparseCOO:
    """Lower triangle: entries with ``col - row <= k`` (scipy.sparse.tril
    convention)."""
    if a.rank != 2:
        raise SpSparseError("coo_tril requires a rank-2 array")
    kk = jnp.asarray(k, a.index_dtype)
    return coo_filter(a, lambda idx, _: idx[:, 1] - idx[:, 0] <= kk)


def coo_triu(a: SparseCOO, k: int = 0) -> SparseCOO:
    """Upper triangle: entries with ``col - row >= k`` (scipy.sparse.triu
    convention)."""
    if a.rank != 2:
        raise SpSparseError("coo_triu requires a rank-2 array")
    kk = jnp.asarray(k, a.index_dtype)
    return coo_filter(a, lambda idx, _: idx[:, 1] - idx[:, 0] >= kk)
