"""NetCDF round-trip I/O for sparse arrays — reference-compatible schema.

Implements the exact on-file schema of the reference's NetCDF layer
(/root/reference/slib/spsparse/netcdf.hpp:86-138): per array ``vname``

* dims  ``vname.size`` (= nnz) and ``vname.rank``;
* var   ``vname.indices``: int64 ``[size, rank]``;
* var   ``vname.vals``:    double ``[size]``;
* var   ``vname.info``:    int64 scalar carrying a ``shape`` attribute of
  ``rank`` uint64 values (reference ``netcdf.hpp:100-106``).

Reads validate the stored rank against the requested one and raise through
the pluggable error handler, mirroring ``netcdf.hpp:116-121``; ``alloc``
semantics (shape taken from the file vs. a pre-shaped destination) follow
``netcdf.hpp:123-134``. Unlike the reference's one-element-per-call
putVar/getVar loops (``netcdf.hpp:34-42,65-75``), everything here is a bulk
vectorized transfer.

The container codec is :mod:`spsparse_tpu.io.cdf` (classic NetCDF CDF-1/2/5
implemented in-tree); CDF-5 is the default because the schema requires
int64/uint64 types. ``NcIO`` reproduces the reference's deferred-action
read/write session object (``ibmisc::NcIO`` + ``ncio +=`` queue,
``netcdf.hpp:107,136``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..core.coo import SparseCOO
from ..core.errors import spsparse_error
from .cdf import NcAttr, NcFile, read_cdf, write_cdf
from .nc4 import is_hdf5, read_nc4, write_nc4


def _read_any(path) -> NcFile:
    """Dispatch on container flavor: HDF5/NetCDF-4 vs classic CDF."""
    if is_hdf5(path):
        return read_nc4(path)
    return read_cdf(path)


def _write_any(path, nc: NcFile) -> None:
    if nc.version == 4:
        write_nc4(path, nc)
    else:
        write_cdf(path, nc)

__all__ = ["save_netcdf", "load_netcdf", "NcIO", "ncio_spsparse"]


def _write_array(nc: NcFile, A: SparseCOO, vname: str) -> None:
    idx, vals = A.to_lists()
    n = len(vals)
    rank = A.rank
    d_size = nc.add_dim(f"{vname}.size", n)
    d_rank = nc.add_dim(f"{vname}.rank", rank)
    info = nc.add_var(f"{vname}.info", [], np.zeros((), np.int64))
    info.attrs.append(
        NcAttr("shape", np.asarray(A.shape, np.uint64)))
    nc.add_var(f"{vname}.indices", [d_size, d_rank],
               np.asarray(idx, np.int64).reshape(n, rank))
    nc.add_var(f"{vname}.vals", [d_size], np.asarray(vals, np.float64))


def _read_array(nc: NcFile, vname: str, *, rank: int | None = None,
                shape: Sequence[int] | None = None,
                alloc: bool = True, dtype=np.float64,
                cap: int | None = None) -> SparseCOO:
    info = nc.var(f"{vname}.info")
    shape_attr = None
    for a in info.attrs:
        if a.name == "shape":
            shape_attr = np.asarray(a.values, np.int64)
    if shape_attr is None:
        spsparse_error(-1, "NetCDF sparse array %s has no shape attribute",
                       vname)
    file_rank = len(shape_attr)
    if rank is not None and file_rank != rank:
        spsparse_error(
            -1,
            "Trying to read NetCDF sparse array of rank %d into SpSparse "
            "array of rank %d", file_rank, rank)
    if alloc or shape is None:
        shape = tuple(int(s) for s in shape_attr)
    else:
        shape = tuple(int(s) for s in shape)
    idx = np.asarray(nc.var(f"{vname}.indices").data, np.int64)
    vals = np.asarray(nc.var(f"{vname}.vals").data, dtype)
    # Index dtype follows the extents: int64 stays int64 when any extent
    # needs it (reference stores int64 on disk, netcdf.hpp:102).
    from ..core.coo import default_index_dtype
    idx = idx.astype(np.dtype(default_index_dtype(shape)))
    return SparseCOO.from_arrays(idx, vals, shape, cap=cap)


def save_netcdf(path, arrays: dict[str, SparseCOO], *, version: int = 5) -> None:
    """Write named sparse arrays to ``path`` in the reference schema.

    ``version`` selects the container: 1/2/5 = classic CDF (in-tree codec);
    4 = NetCDF-4/HDF5 (via h5py) — the flavor netCDF-4-library hosts of the
    reference produce and consume."""
    nc = NcFile(version=version)
    for vname, A in arrays.items():
        _write_array(nc, A, vname)
    _write_any(path, nc)


def load_netcdf(path, vname: str, *, rank: int | None = None,
                shape: Sequence[int] | None = None, alloc: bool = True,
                dtype=np.float64, cap: int | None = None) -> SparseCOO:
    """Read one sparse array written by :func:`save_netcdf` (or by the
    reference library into a classic-format file)."""
    nc = _read_any(path)
    return _read_array(nc, vname, rank=rank, shape=shape, alloc=alloc,
                       dtype=dtype, cap=cap)


class NcIO:
    """Deferred-action NetCDF session mirroring the reference's ``NcIO``.

    Usage (write)::

        ncio = NcIO(path, 'w')
        ncio_spsparse(ncio, A, False, 'A')
        ncio.flush()    # or use as a context manager

    Usage (read)::

        ncio = NcIO(path, 'r')
        out = ncio_spsparse(ncio, None, True, 'A', rank=2)
        ncio.flush()
        A = out['A']
    """

    def __init__(self, path, rw: str):
        assert rw in ("r", "w")
        self.path = path
        self.rw = rw
        self.nc = _read_any(path) if rw == "r" else NcFile(version=5)
        self._actions: list = []
        self.results: dict[str, SparseCOO] = {}

    def __iadd__(self, action):
        self._actions.append(action)
        return self

    def flush(self):
        for act in self._actions:
            act()
        self._actions.clear()
        if self.rw == "w":
            _write_any(self.path, self.nc)
        return self.results

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            self.flush()
        return False


def ncio_spsparse(ncio: NcIO, A: SparseCOO | None, alloc: bool, vname: str,
                  *, rank: int | None = None, dtype=np.float64,
                  cap: int | None = None):
    """Reference-parity entry point (``netcdf.hpp:86-138``): queue a write of
    ``A``, or a read into ``ncio.results[vname]``."""
    if ncio.rw == "w":
        ncio += (lambda: _write_array(ncio.nc, A, vname))
        return None
    if rank is None and A is not None:
        rank = A.rank
    shape = A.shape if (A is not None and not alloc) else None

    def _do_read():
        ncio.results[vname] = _read_array(
            ncio.nc, vname, rank=rank, shape=shape, alloc=alloc,
            dtype=dtype, cap=cap)

    ncio += _do_read
    return ncio.results
