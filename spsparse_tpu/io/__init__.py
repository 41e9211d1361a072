"""I/O layer: NetCDF round-trip with the reference schema; scipy .npz
interop; sharded checkpoints."""

from .netcdf import save_netcdf, load_netcdf, NcIO, ncio_spsparse
from .cdf import NcFile, NcDim, NcAttr, NcVar, read_cdf, write_cdf
from .nc4 import read_nc4, write_nc4, is_hdf5
from .npz import save_npz, load_npz

__all__ = [
    "save_netcdf", "load_netcdf", "NcIO", "ncio_spsparse",
    "NcFile", "NcDim", "NcAttr", "NcVar", "read_cdf", "write_cdf",
    "read_nc4", "write_nc4", "is_hdf5",
    "save_npz", "load_npz",
]
