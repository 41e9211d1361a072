"""spsparse-tpu command line: inspect and convert sparse-matrix files.

Commands::

    python -m spsparse_tpu.tools info FILE             # container + arrays
    python -m spsparse_tpu.tools convert SRC DST       # re-container
        [--version {1,2,4,5}]                          # target (default 5)
    python -m spsparse_tpu.tools stats FILE VNAME      # matrix statistics

Works on classic NetCDF (CDF-1/2/5, in-tree codec) and NetCDF-4/HDF5
(h5py) containers holding the reference spsparse schema.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

# File tools never need an accelerator; forcing the CPU backend avoids
# paying remote-TPU session establishment for a metadata query.
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover
    pass


def _nc(path):
    from ..io.netcdf import _read_any

    return _read_any(path)


def _schema_arrays(nc):
    """vnames following the spsparse schema (have .info/.indices/.vals)."""
    names = {v.name for v in nc.vars}
    out = []
    for n in names:
        if n.endswith(".info") and (n[:-5] + ".indices") in names:
            out.append(n[:-5])
    return sorted(out)


def cmd_info(args) -> int:
    nc = _nc(args.file)
    kind = "NetCDF-4/HDF5" if nc.version == 4 else f"classic CDF-{nc.version}"
    print(f"{args.file}: {kind}")
    print(f"  dimensions: " + ", ".join(
        f"{d.name}={d.size}" for d in nc.dims))
    for v in nc.vars:
        dims = "x".join(str(nc.dims[d].size) for d in v.dimids) or "scalar"
        print(f"  var {v.name}: type={v.nc_type} [{dims}]")
    arrays = _schema_arrays(nc)
    if arrays:
        print("  spsparse arrays: " + ", ".join(arrays))
    return 0


def cmd_convert(args) -> int:
    from ..io.netcdf import load_netcdf, save_netcdf

    nc = _nc(args.src)
    arrays = _schema_arrays(nc)
    if not arrays:
        print("no spsparse-schema arrays found", file=sys.stderr)
        return 1
    loaded = {v: load_netcdf(args.src, v) for v in arrays}
    save_netcdf(args.dst, loaded, version=args.version)
    print(f"wrote {args.dst} (version {args.version}) with "
          f"{len(loaded)} array(s): {', '.join(arrays)}")
    return 0


def cmd_stats(args) -> int:
    from ..io.netcdf import load_netcdf

    A = load_netcdf(args.file, args.vname)
    idx, vals = A.to_lists()
    vals = np.asarray(vals)
    nnz = len(vals)
    stats = {
        "vname": args.vname,
        "shape": list(A.shape),
        "nnz": nnz,
        "density": nnz / max(float(np.prod(A.shape)), 1.0),
        "val_min": float(vals.min()) if nnz else None,
        "val_max": float(vals.max()) if nnz else None,
        "val_sum": float(vals.sum()) if nnz else 0.0,
    }
    if A.rank == 2 and nnz:
        rows = np.asarray([i[0] for i in idx])
        offs = np.asarray([i[1] - i[0] for i in idx])
        counts = np.bincount(rows, minlength=A.shape[0])
        stats["rows_present"] = int((counts > 0).sum())
        stats["max_row_nnz"] = int(counts.max())
        stats["n_diagonals"] = int(np.unique(offs).size)
        stats["bandwidth"] = int(np.abs(offs).max())
    print(json.dumps(stats, indent=1))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m spsparse_tpu.tools")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("info", help="describe a NetCDF file")
    p.add_argument("file")
    p.set_defaults(fn=cmd_info)
    p = sub.add_parser("convert", help="convert between container flavors")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--version", type=int, default=5, choices=(1, 2, 4, 5))
    p.set_defaults(fn=cmd_convert)
    p = sub.add_parser("stats", help="sparse-matrix statistics")
    p.add_argument("file")
    p.add_argument("vname")
    p.set_defaults(fn=cmd_stats)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
