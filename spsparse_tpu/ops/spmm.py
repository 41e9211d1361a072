"""Sparse x dense products: SpMV (dense vector) and SpMM (dense block).

The reference sketched-but-disabled this entire capability
(/root/reference/slib/spsparse/multiply_dense.hpp:8-36 is ``#if 0``'d:
``y = M·x`` for a dense ``x`` with optional transpose and NaN/Inf
filtering). On TPU it is *the* first-class case — SURVEY §2 — because a
dense right-hand block feeds the MXU and a dense vector turns SpMV into a
gather + segmented reduction with no sorting at all.

XLA paths live here (segment scatter-add for CSR/COO, fully vectorized
gather+reduce for ELL); the Pallas kernels in
:mod:`spsparse_tpu.ops.pallas_spmv` override them on TPU for the hot
configurations.

Semantics of the ``filter_nan`` flag follow the reference sketch
(``multiply_dense.hpp:20-23``): non-finite entries of the dense operand are
treated as zero so they do not poison the whole output row.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..core.coo import SparseCOO
from ..core.errors import spsparse_error
from ..core.structure import SparseCSR, SparseELL, to_csr

__all__ = ["spmv", "spmm"]

Array = Any


def _clean(x, filter_nan: bool):
    if filter_nan:
        return jnp.where(jnp.isfinite(x), x, 0)
    return x


def _as_csr(A, transpose: bool) -> SparseCSR:
    if isinstance(A, SparseCSR):
        if not transpose:
            return A
        A = A.to_coo()
    if isinstance(A, SparseCOO):
        return to_csr(A, transpose=transpose)
    raise TypeError(f"unsupported sparse operand type {type(A)}")


def spmv(A, x, *, transpose: bool = False, filter_nan: bool = False) -> Array:
    """``y = A^(T?) @ x`` for dense ``x``; returns a dense vector.

    Accepts :class:`SparseCOO`, :class:`SparseCSR`, or :class:`SparseELL`
    (ELL ignores ``transpose``; convert first). The accumulation runs in the
    dtype promoted from ``A`` and ``x``.
    """
    x = jnp.asarray(x)
    if isinstance(A, SparseELL):
        if transpose:
            raise NotImplementedError("transpose SpMV on ELL: convert first")
        if x.shape[0] != A.ncols:
            spsparse_error(-1, "Inner dimensions for A (%d) and x (%d) must match!",
                           A.ncols, x.shape[0])
        xg = jnp.take(_clean(x, filter_nan), A.cols, mode="fill", fill_value=0)
        return jnp.sum(A.vals * xg, axis=1)

    csr = _as_csr(A, transpose)
    if x.shape[0] != csr.ncols:
        spsparse_error(-1, "Inner dimensions for A (%d) and x (%d) must match!",
                       csr.ncols, x.shape[0])
    xv = _clean(x, filter_nan)
    prod = csr.vals * jnp.take(xv, csr.cols, mode="fill", fill_value=0)
    rows = jnp.where(csr.valid_mask(), csr.row_ids(),
                     jnp.asarray(csr.nrows, jnp.int32))
    out_dtype = jnp.result_type(csr.vals, xv)
    return jnp.zeros((csr.nrows,), out_dtype).at[rows].add(prod, mode="drop")


def spmm(A, X, *, transpose: bool = False, filter_nan: bool = False,
         accum_dtype=None) -> Array:
    """``Y = A^(T?) @ X`` for a dense block ``X (K, N)``; returns ``(I, N)``.

    ``accum_dtype`` optionally forces the accumulation precision (e.g.
    ``jnp.float32`` for bf16 inputs — the mixed-precision MXU recipe).
    """
    X = jnp.asarray(X)
    if X.ndim == 1:
        return spmv(A, X, transpose=transpose, filter_nan=filter_nan)
    if isinstance(A, SparseELL):
        if transpose:
            raise NotImplementedError("transpose SpMM on ELL: convert first")
        if X.shape[0] != A.ncols:
            spsparse_error(-1, "Inner dimensions for A (%d) and X (%d) must match!",
                           A.ncols, X.shape[0])
        Xc = _clean(X, filter_nan)
        acc = accum_dtype or jnp.result_type(A.vals, Xc)
        # (nrows, K) gather of X rows -> (nrows, K, N), weighted row-sum.
        xg = jnp.take(Xc, A.cols.reshape(-1), axis=0, mode="fill",
                      fill_value=0).reshape(*A.cols.shape, X.shape[1])
        return jnp.sum(A.vals[..., None].astype(acc) * xg.astype(acc), axis=1)

    csr = _as_csr(A, transpose)
    if X.shape[0] != csr.ncols:
        spsparse_error(-1, "Inner dimensions for A (%d) and X (%d) must match!",
                       csr.ncols, X.shape[0])
    Xc = _clean(X, filter_nan)
    acc = accum_dtype or jnp.result_type(csr.vals, Xc)
    gathered = jnp.take(Xc, csr.cols, axis=0, mode="fill",
                        fill_value=0).astype(acc)
    prod = csr.vals[:, None].astype(acc) * gathered
    rows = jnp.where(csr.valid_mask(), csr.row_ids(),
                     jnp.asarray(csr.nrows, jnp.int32))
    out = jnp.zeros((csr.nrows, X.shape[1]), acc)
    return out.at[rows].add(prod, mode="drop")
