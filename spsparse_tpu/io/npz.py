"""scipy.sparse ``.npz`` interop — ``save_npz`` / ``load_npz``.

Writes and reads the exact container ``scipy.sparse.save_npz`` uses (a
numpy ``.npz`` zip with ``format``/``shape``/``data`` members plus
``row``+``col`` for COO or ``indices``+``indptr`` for CSR/CSC), so files
round-trip against scipy in both directions — the npz sibling of the
NetCDF reference-schema interop (:mod:`spsparse_tpu.io.netcdf`, which
remains the rank-N / reference-compatible format; npz is rank-2 only,
like scipy). No scipy import needed: the container is plain
``numpy.savez``.
"""

from __future__ import annotations

import numpy as np

from ..core.coo import SparseCOO
from ..core.errors import SpSparseError

__all__ = ["save_npz", "load_npz"]


def save_npz(path, a: SparseCOO, *, compressed: bool = True) -> None:
    """Write a rank-2 array in scipy's COO ``.npz`` layout
    (scipy.sparse.load_npz reads the result directly). Only live entries
    are written (padding never leaves the device container)."""
    if a.rank != 2:
        raise SpSparseError(
            f"save_npz is rank-2 only (scipy's restriction); got rank "
            f"{a.rank} — use io.netcdf for rank-N arrays")
    n = int(a.nnz)
    idx = np.asarray(a.indices)[:n]
    fields = dict(
        format=np.bytes_(b"coo"),
        shape=np.asarray(a.shape, np.int64),
        row=idx[:, 0],
        col=idx[:, 1],
        data=np.asarray(a.vals)[:n],
    )
    (np.savez_compressed if compressed else np.savez)(path, **fields)


def load_npz(path) -> SparseCOO:
    """Read a scipy ``.npz`` sparse file (coo, csr, or csc) into a
    :class:`SparseCOO`. CSR/CSC row/col pointers are expanded with
    ``np.repeat`` on the host (one-time ingest cost); entry order — and
    hence scipy's canonical sortedness — is preserved, but sort metadata
    is left unset (consolidate to claim it)."""
    with np.load(path) as z:
        try:
            # scipy accepts both bytes and str `format` members on load;
            # third-party writers may store either
            _f = np.asarray(z["format"]).item()
            fmt = _f.decode() if isinstance(_f, bytes) else str(_f)
            shape = tuple(int(s) for s in z["shape"])
            data = z["data"]
            if fmt == "coo":
                rows, cols = z["row"], z["col"]
            elif fmt in ("csr", "csc"):
                ptr, minor = z["indptr"], z["indices"]
                major = np.repeat(np.arange(len(ptr) - 1), np.diff(ptr))
                rows, cols = (major, minor) if fmt == "csr" \
                    else (minor, major)
            else:
                raise SpSparseError(
                    f"load_npz: unsupported sparse format {fmt!r} "
                    f"(coo/csr/csc)")
        except KeyError as e:
            raise SpSparseError(
                f"load_npz: {path} is not a scipy sparse .npz "
                f"(missing member {e})") from e
    return SparseCOO.from_arrays(
        np.stack([np.asarray(rows), np.asarray(cols)], axis=1),
        np.asarray(data), shape)
