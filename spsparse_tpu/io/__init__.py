"""I/O layer: NetCDF round-trip with the reference schema."""

from .netcdf import save_netcdf, load_netcdf, NcIO, ncio_spsparse
from .cdf import NcFile, NcDim, NcAttr, NcVar, read_cdf, write_cdf

__all__ = [
    "save_netcdf", "load_netcdf", "NcIO", "ncio_spsparse",
    "NcFile", "NcDim", "NcAttr", "NcVar", "read_cdf", "write_cdf",
]
