"""Roofline accounting: bytes/FLOP models per op + speed-of-light targets.

BASELINE.md mandates every kernel be roofline-audited against speed-of-light
HBM bandwidth. This module centralizes the per-op traffic models and the
per-chip bandwidth table used by ``bench.py`` and the tests.

Model conventions (all sizes in bytes):

* SpMV-DIA: diagonal data streamed once; x read once per diagonal *window*
  but XLA keeps it VMEM-resident for moderate n → counted once; y written.
* SpMV-ELL: cols+vals streamed once; x counted once (VMEM-resident); y once.
* SpMV-CSR: cols+vals+rowptr streamed; x gathered (counted once per nnz in
  the pessimistic model — CSR gathers are irregular); y once.
* SpMM-ELL: cols+vals once; each nnz gathers one N-wide X row (the dominant
  term); Y written once.
* SpGEMM-ESC: expansion read+write (sort is multi-pass: ~log passes over
  the expansion buffer — we charge ``sort_passes`` passes).
"""

from __future__ import annotations

import dataclasses

import jax

__all__ = ["OpStats", "roofline", "device_hbm_bandwidth", "SOL_BW",
           "spmv_dia_stats", "spmv_ell_stats", "spmv_csr_stats",
           "spmm_ell_stats", "spgemm_esc_stats"]

# Speed-of-light HBM bandwidth per chip (bytes/s), public figures.
SOL_BW = {
    "TPU v4": 1.2e12,
    "TPU v5 lite": 8.19e11,
    "TPU v5e": 8.19e11,
    "TPU v5": 8.19e11,
    "TPU v5p": 2.77e12,
    "TPU v6 lite": 1.64e12,
    "TPU v6e": 1.64e12,
    "TPU v7": 7.4e12,
    "cpu": 5.0e10,
}


def device_hbm_bandwidth(device=None) -> tuple[str, float]:
    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu")
    for k in sorted(SOL_BW, key=len, reverse=True):
        if kind.startswith(k):
            return kind, SOL_BW[k]
    return kind, SOL_BW["cpu"]


@dataclasses.dataclass(frozen=True)
class OpStats:
    """Static traffic/FLOP model of one op invocation."""

    name: str
    nnz: int
    bytes_moved: int
    flops: int

    def sol_time(self, bw: float) -> float:
        return self.bytes_moved / bw

    def sol_nnz_per_s(self, bw: float) -> float:
        return self.nnz / self.sol_time(bw)


def roofline(stats: OpStats, time_s: float, device=None) -> dict:
    """Measured time → achieved vs speed-of-light summary dict."""
    kind, bw = device_hbm_bandwidth(device)
    achieved = stats.nnz / time_s
    sol = stats.sol_nnz_per_s(bw)
    return {
        "op": stats.name,
        "device": kind,
        "nnz": stats.nnz,
        "time_s": time_s,
        "nnz_per_s": achieved,
        "bytes_moved": stats.bytes_moved,
        "gbytes_per_s": stats.bytes_moved / time_s / 1e9,
        "sol_nnz_per_s": sol,
        "pct_of_roofline": 100.0 * achieved / sol,
    }


def _isize(dtype) -> int:
    import numpy as np
    return np.dtype(dtype).itemsize


def spmv_dia_stats(ndiag: int, nrows: int, dtype="float32") -> OpStats:
    s = _isize(dtype)
    nnz = ndiag * nrows
    return OpStats("spmv_dia", nnz,
                   nnz * s + nrows * 2 * s, 2 * nnz)


def spmv_ell_stats(nrows: int, k: int, dtype="float32",
                   index_size: int = 4) -> OpStats:
    nnz = nrows * k
    s = _isize(dtype)
    return OpStats("spmv_ell", nnz,
                   nnz * (index_size + s) + nrows * 2 * s, 2 * nnz)


def spmv_csr_stats(nnz: int, nrows: int, dtype="float32",
                   index_size: int = 4) -> OpStats:
    s = _isize(dtype)
    return OpStats("spmv_csr", nnz,
                   nnz * (index_size + 2 * s) + nrows * (4 + s), 2 * nnz)


def spmm_ell_stats(nrows: int, k: int, n_block: int, dtype="float32",
                   index_size: int = 4, x_dtype=None) -> OpStats:
    nnz = nrows * k
    s = _isize(dtype)
    xs = _isize(x_dtype or dtype)
    bytes_moved = (nnz * (index_size + s)        # cols + vals
                   + nnz * n_block * xs          # gathered X rows
                   + nrows * n_block * s)        # Y
    return OpStats("spmm_ell", nnz, bytes_moved, 2 * nnz * n_block)


def spgemm_esc_stats(nnz_a: int, nnz_b: int, expansion: int, nnz_out: int,
                     dtype="float32", index_size: int = 4,
                     sort_passes: int = 4) -> OpStats:
    s = _isize(dtype)
    entry = 2 * index_size + s
    bytes_moved = ((nnz_a + nnz_b) * (2 * index_size + s)  # operand reads
                   + expansion * entry * (1 + 2 * sort_passes)  # build+sort
                   + nnz_out * entry)                      # output
    return OpStats("spgemm_esc", expansion, bytes_moved, 2 * expansion)
