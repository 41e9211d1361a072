"""ctypes bindings for the native host runtime (csrc/spsparse_host.cpp).

The C++ library accelerates the *host-side* phases of the pipeline — bulk
COO ingest, consolidate (stable sort + duplicate merge), CSR/row-pointer
construction — which run before data ships to TPU HBM. It is built on
demand with ``make`` (g++); when the toolchain or binary is unavailable
every entry point falls back to the equivalent numpy implementation, so
the framework never hard-requires the native tier.

Semantics match :func:`spsparse_tpu.core.consolidate.consolidate` exactly
(same reference contract, algorithm.hpp:251-319) and are cross-checked in
``tests/test_native.py``.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from functools import lru_cache
from typing import Sequence

import numpy as np

from ..core.errors import DuplicatePolicy

logger = logging.getLogger("spsparse_tpu.native")

__all__ = ["available", "consolidate_host", "dim_beginnings_host",
           "csr_row_ptr_host", "check_bounds_host"]

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SO = os.path.join(_CSRC, "libspsparse_host.so")


def _find_so() -> str:
    """Installed-wheel extension first (built by setup.py as
    ``_spsparse_host*.so`` next to this file), then the csrc build."""
    import glob
    here = os.path.dirname(__file__)
    hits = sorted(glob.glob(os.path.join(here, "_spsparse_host*.so")))
    if hits:
        return hits[0]
    return _SO


@lru_cache(maxsize=1)
def _lib():
    """Load (building if needed) the native library; None if unavailable."""
    try:
        so = _find_so()
        if not os.path.exists(so):
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True)
            so = _SO
        lib = ctypes.CDLL(so)
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logger.info("native host library unavailable (%s); using numpy", e)
        return None
    lib.spsparse_consolidate_f64.restype = ctypes.c_int64
    lib.spsparse_consolidate_f64.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
    ]
    lib.spsparse_dim_beginnings_i64.restype = ctypes.c_int64
    lib.spsparse_dim_beginnings_i64.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.spsparse_csr_row_ptr.restype = None
    lib.spsparse_csr_row_ptr.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.spsparse_check_bounds.restype = ctypes.c_int64
    lib.spsparse_check_bounds.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


def available() -> bool:
    return _lib() is not None


def _p64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _pf64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _p32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _numpy_consolidate(indices, vals, shape, sort_order, policy, zero_nan):
    """Pure-numpy reference fallback (same contract)."""
    keep = vals != 0
    if zero_nan:
        keep &= ~np.isnan(vals)
    idx = indices[keep]
    v = vals[keep]
    if idx.shape[0] == 0:
        return idx.reshape(0, indices.shape[1]), v
    order = np.lexsort(tuple(idx[:, d] for d in reversed(sort_order)))
    idx, v = idx[order], v[order]
    same = np.all(idx[1:] == idx[:-1], axis=1)
    starts = np.concatenate([[True], ~same])
    seg = np.cumsum(starts) - 1
    out_idx = idx[starts]
    if policy == DuplicatePolicy.ADD:
        out_v = np.zeros(out_idx.shape[0], v.dtype)
        np.add.at(out_v, seg, v)
    elif policy == DuplicatePolicy.LEAVE_ALONE:
        out_v = v[starts]
    else:  # REPLACE: last of each run
        ends = np.concatenate([starts[1:], [True]])
        out_v = v[ends]
    return out_idx, out_v


def consolidate_host(
    indices, vals, shape: Sequence[int],
    sort_order: Sequence[int] | None = None,
    duplicate_policy: DuplicatePolicy = DuplicatePolicy.ADD,
    zero_nan: bool = False, n_threads: int | None = None,
):
    """Host consolidate: returns compact ``(indices (m, rank), vals (m,))``
    numpy arrays, sorted by ``sort_order`` with duplicates merged."""
    indices = np.ascontiguousarray(np.asarray(indices, np.int64))
    if indices.ndim == 1:
        indices = indices[:, None]
    vals = np.ascontiguousarray(np.asarray(vals, np.float64))
    n, rank = indices.shape
    sort_order = tuple(sort_order or range(rank))
    lib = _lib()
    if lib is not None and n:
        out_idx = np.empty_like(indices)
        out_vals = np.empty_like(vals)
        shape_a = np.asarray(shape, np.int64)
        so_a = np.asarray(sort_order, np.int32)
        nt = n_threads if n_threads is not None else (os.cpu_count() or 1)
        m = lib.spsparse_consolidate_f64(
            _p64(indices), _pf64(vals), n, rank, _p64(shape_a), _p32(so_a),
            int(duplicate_policy.value), int(bool(zero_nan)), int(nt),
            _p64(out_idx), _pf64(out_vals))
        if m >= 0:
            return out_idx[:m].copy(), out_vals[:m].copy()
        logger.info("native consolidate declined input; numpy fallback")
    return _numpy_consolidate(indices, vals, shape, sort_order,
                              duplicate_policy, zero_nan)


def dim_beginnings_host(lead):
    """Present-rows begins (+sentinel) and row ids from sorted lead column."""
    lead = np.ascontiguousarray(np.asarray(lead, np.int64))
    n = lead.shape[0]
    lib = _lib()
    if lib is not None:
        begins = np.empty(n + 1, np.int64)
        rows = np.empty(max(n, 1), np.int64)
        r = lib.spsparse_dim_beginnings_i64(_p64(lead), n, _p64(begins),
                                            _p64(rows))
        return begins[: r + 1].copy(), rows[:r].copy()
    if n == 0:
        return np.zeros(1, np.int64), np.zeros(0, np.int64)
    starts = np.concatenate([[True], lead[1:] != lead[:-1]])
    begins = np.concatenate([np.nonzero(starts)[0], [n]]).astype(np.int64)
    return begins, lead[starts]


def csr_row_ptr_host(rows, nrows: int):
    rows = np.ascontiguousarray(np.asarray(rows, np.int64))
    lib = _lib()
    if lib is not None:
        out = np.empty(nrows + 1, np.int64)
        lib.spsparse_csr_row_ptr(_p64(rows), rows.shape[0], nrows, _p64(out))
        return out
    return np.searchsorted(rows, np.arange(nrows + 1)).astype(np.int64)


def check_bounds_host(indices, shape) -> int:
    """Index of first out-of-bounds entry, or -1."""
    indices = np.ascontiguousarray(np.asarray(indices, np.int64))
    if indices.ndim == 1:
        indices = indices[:, None]
    lib = _lib()
    shape_a = np.asarray(shape, np.int64)
    if lib is not None:
        return int(lib.spsparse_check_bounds(
            _p64(indices), indices.shape[0], indices.shape[1], _p64(shape_a)))
    bad = (indices < 0) | (indices >= shape_a)
    rows = np.nonzero(bad.any(axis=1))[0]
    return int(rows[0]) if rows.size else -1
