"""spsparse-tpu command line: inspect and convert sparse-matrix files.

Commands::

    python -m spsparse_tpu.tools info FILE             # container + arrays
    python -m spsparse_tpu.tools convert SRC DST       # re-container
        [--version {1,2,4,5}]                          # target (default 5)
    python -m spsparse_tpu.tools stats FILE VNAME      # matrix statistics
    python -m spsparse_tpu.tools solve FILE VNAME      # iterative solve
        [--rhs FILE:VNAME] [--method cg|bicgstab|gmres]
        [--precond none|jacobi|blockjacobi] [--iters N] [--out FILE]

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


def cmd_solve(args) -> int:
    import jax.numpy as jnp

    from ..core.structure import to_csr
    from ..io.netcdf import load_netcdf, save_netcdf
    from ..ops.spmm import spmv
    from ..solvers import (bicgstab_solve, block_jacobi_preconditioner,
                           extract_diagonal, gmres_solve,
                           jacobi_preconditioner, pcg_solve)
    from .. import CooBuilder

    A = load_netcdf(args.file, args.vname)
    if A.rank != 2 or A.shape[0] != A.shape[1]:
        print("solve requires a square rank-2 array", file=sys.stderr)
        return 1
    n = A.shape[0]
    if args.rhs:
        path, _, vname = args.rhs.partition(":")
        rhs = np.asarray(load_netcdf(path, vname or "b").to_dense())
    else:
        rhs = np.ones(n)
    csr = to_csr(A)
    mv = lambda v: spmv(csr, v)  # noqa: E731

    minv = None
    if args.precond == "jacobi":
        minv = jacobi_preconditioner(extract_diagonal(csr))
    elif args.precond == "blockjacobi":
        minv = block_jacobi_preconditioner(A, bs=min(128, n))
    b = jnp.asarray(rhs)
    if args.method == "cg":
        x, rs = pcg_solve(mv, b, iters=args.iters, minv=minv)
    elif args.method == "bicgstab":
        x, rs = bicgstab_solve(mv, b, iters=args.iters, minv=minv)
    else:
        x, rs = gmres_solve(mv, b, m=min(30, n),
                            restarts=max(1, args.iters // 30), minv=minv)
    x = np.asarray(x)
    print(json.dumps({"method": args.method, "precond": args.precond,
                      "n": n, "iters": args.iters,
                      "residual_norm": float(np.sqrt(float(rs))),
                      "x_min": float(x.min()), "x_max": float(x.max())},
                     indent=1))
    if args.out:
        bx = CooBuilder((n,), dtype=np.float64)
        bx.add_many(np.arange(n)[:, None], x.astype(np.float64))
        save_netcdf(args.out, {"x": bx.build()})
        print(f"wrote {args.out} (x as rank-1 spsparse array)")
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
    p = sub.add_parser("solve", help="iterative solve A x = b")
    p.add_argument("file")
    p.add_argument("vname")
    p.add_argument("--rhs", default=None,
                   help="FILE:VNAME rank-1 rhs (default: ones)")
    p.add_argument("--method", default="cg",
                   choices=("cg", "bicgstab", "gmres"))
    p.add_argument("--precond", default="jacobi",
                   choices=("none", "jacobi", "blockjacobi"))
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_solve)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
