"""Sharded NetCDF checkpoints for row-partitioned matrices.

The reference's only persistence is a single-file NetCDF write
(/root/reference/slib/spsparse/netcdf.hpp); for multi-host partitioned
matrices this module adds the sharded equivalent (SURVEY §5 checkpoint
item): each partition's local block is written as an independent
reference-schema NetCDF file (so any single shard is readable by the
plain loader — and by the reference library itself), plus a small JSON
manifest tying the shards together. Writes are per-partition and therefore
parallelizable across hosts, each host writing only its own rows.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..core.coo import SparseCOO, round_up_pow2
from ..core.errors import SpSparseError
from ..dist.partition import RowPartitionedCSR
from .netcdf import load_netcdf, save_netcdf

__all__ = ["save_netcdf_sharded", "load_netcdf_sharded"]

_MANIFEST_VERSION = 1


def _shard_path(prefix: str, p: int) -> str:
    return f"{prefix}.part{p:05d}.nc"


def save_netcdf_sharded(prefix: str, part: RowPartitionedCSR,
                        vname: str = "A", *, parts=None) -> None:
    """Write one reference-schema NetCDF file per partition plus a manifest.

    ``parts`` optionally restricts which partition indices this host writes
    (multi-host: each host passes its own partition ids; every host may
    write the manifest — contents are identical).
    """
    n_parts = part.n_parts
    parts = range(n_parts) if parts is None else parts
    manifest = {
        "version": _MANIFEST_VERSION,
        "vname": vname,
        "n_parts": n_parts,
        "shape": list(part.shape),
        "rows_local": part.rows_local,
        "shards": [os.path.basename(_shard_path(prefix, p))
                   for p in range(n_parts)],
    }
    with open(f"{prefix}.manifest.json", "w") as f:
        json.dump(manifest, f, indent=1)
    for p in parts:
        block = part.local_block(p)  # local rows, global cols
        save_netcdf(_shard_path(prefix, p), {vname: block.to_coo()})


def load_netcdf_sharded(prefix: str, *, parts=None,
                        cap_local: int | None = None) -> RowPartitionedCSR:
    """Load a sharded checkpoint back into a :class:`RowPartitionedCSR`.

    ``parts`` optionally loads a subset (other slots stay empty) for
    host-local restores.
    """
    with open(f"{prefix}.manifest.json") as f:
        manifest = json.load(f)
    if manifest.get("version") != _MANIFEST_VERSION:
        raise SpSparseError(
            f"unsupported sharded-checkpoint manifest version "
            f"{manifest.get('version')}")
    vname = manifest["vname"]
    n_parts = manifest["n_parts"]
    rows_local = manifest["rows_local"]
    shape = tuple(manifest["shape"])
    parts = range(n_parts) if parts is None else parts

    blocks: dict[int, SparseCOO] = {}
    max_nnz = 1
    for p in parts:
        coo = load_netcdf(_shard_path(prefix, p), vname, rank=2)
        blocks[p] = coo
        max_nnz = max(max_nnz, int(coo.nnz))
    if cap_local is None:
        cap_local = round_up_pow2(max(max_nnz, 1))

    ncols = shape[1]
    row_ptr = np.zeros((n_parts, rows_local + 1), np.int32)
    cols = np.full((n_parts, cap_local), ncols, np.int32)
    vals = np.zeros((n_parts, cap_local), np.float64)
    nnz = np.zeros((n_parts,), np.int32)
    for p, coo in blocks.items():
        idx, v = coo.to_lists()
        idx = np.asarray(idx, np.int64).reshape(len(v), 2)
        order = np.lexsort((idx[:, 1], idx[:, 0]))
        idx, v = idx[order], np.asarray(v)[order]
        n = idx.shape[0]
        if n > cap_local:
            raise SpSparseError(
                f"shard {p} nnz {n} exceeds cap_local {cap_local}")
        row_ptr[p] = np.searchsorted(idx[:, 0], np.arange(rows_local + 1))
        cols[p, :n] = idx[:, 1]
        vals[p, :n] = v
        nnz[p] = n
    return RowPartitionedCSR(
        row_ptr=jnp.asarray(row_ptr), cols=jnp.asarray(cols),
        vals=jnp.asarray(vals), nnz=jnp.asarray(nnz), shape=shape)
