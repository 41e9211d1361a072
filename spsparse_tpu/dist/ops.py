"""Distributed sparse ops over a device mesh: SpMV, SpMM, SpGEMM.

New capability relative to the reference (which is strictly single-process,
SURVEY §2): row-partitioned operands with JAX collectives over ICI.

* :func:`dist_spmv` — row-partitioned ``y = A @ x``. Two strategies:
  ``"all_gather"`` (gather the full x, one local SpMV) and ``"ring"``
  (P-step ``ppermute`` pipeline: at each step every device multiplies
  against the x-block it currently holds while the next block is in
  flight — communication overlapped with compute, and peak memory stays
  O(local) instead of O(global)).
* :func:`dist_spmm` — same row distribution for a dense block right operand.
* :func:`dist_spgemm` — row-partitioned ``C = A @ B`` with B's row blocks
  brought to each device (all_gather over the inner dimension; each device
  runs the local ESC expansion against the gathered block-padded B layout).

All entry points build the ``shard_map`` internally from a ``Mesh`` + axis
name and also work *inside* an enclosing ``shard_map`` via the ``local_*``
variants.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.coo import SparseCOO
from ..core.joinfill import row_ids_from_row_ptr
from ..ops.multiply import expand_products_raw, sort_and_merge_products
from .partition import RowPartitionedCSR, RowPartitionedBucketed

__all__ = ["dist_spmv", "dist_spmv_bucketed", "dist_spmv_halo", "dist_spmm",
           "dist_spmm_bucketed", "dist_spgemm", "RowPartitionedCOO"]

Array = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RowPartitionedCOO:
    """Stacked per-partition COO blocks (local row ids, global columns)."""

    indices: Array = dataclasses.field(metadata=dict(static=False))  # (P, cap, 2)
    vals: Array = dataclasses.field(metadata=dict(static=False))     # (P, cap)
    nnz: Array = dataclasses.field(metadata=dict(static=False))      # (P,)
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    rows_local: int = dataclasses.field(metadata=dict(static=True))

    def to_coo(self) -> SparseCOO:
        """Host-side: concatenate blocks into one global COO (eager)."""
        parts = []
        for p in range(self.indices.shape[0]):
            n = int(self.nnz[p])
            idx = np.asarray(self.indices[p][:n]).copy()
            idx[:, 0] += p * self.rows_local
            parts.append((idx, np.asarray(self.vals[p][:n])))
        if parts:
            idx = np.concatenate([i for i, _ in parts], axis=0)
            vals = np.concatenate([v for _, v in parts], axis=0)
        else:  # pragma: no cover
            idx = np.zeros((0, 2), np.int32)
            vals = np.zeros((0,))
        return SparseCOO.from_arrays(idx, vals, self.shape, check=False,
                                     sort_order=(0, 1))


# ----------------------------------------------------------------------
# Local (per-device) kernels used inside shard_map
# ----------------------------------------------------------------------
def _local_csr_spmv(row_ptr, cols, vals, nnz, x):
    """One device's SpMV: local CSR block (global col ids) times dense x."""
    cap = cols.shape[0]
    nrows = row_ptr.shape[0] - 1
    live = jnp.arange(cap, dtype=jnp.int32) < nnz
    prod = vals * jnp.take(x, cols, mode="fill", fill_value=0)
    prod = jnp.where(live, prod, 0)
    rows = row_ids_from_row_ptr(row_ptr, cap)
    rows = jnp.where(live, rows, nrows)
    return jnp.zeros((nrows,), prod.dtype).at[rows].add(prod, mode="drop")


def _local_block_contrib(cols, vals, rows, live, x_blk, blk_id, blk_len,
                         nrows):
    """Contribution of columns inside block ``blk_id`` given that block's
    x values (ring step kernel)."""
    rel = cols - blk_id * blk_len
    in_blk = live & (rel >= 0) & (rel < blk_len)
    xg = jnp.take(x_blk, jnp.clip(rel, 0, blk_len - 1))
    prod = jnp.where(in_blk, vals * xg, 0)
    tgt = jnp.where(in_blk, rows, nrows)
    return jnp.zeros((nrows,), prod.dtype).at[tgt].add(prod, mode="drop")


# ----------------------------------------------------------------------
# SpMV
# ----------------------------------------------------------------------
def dist_spmv(part: RowPartitionedCSR, x_parts, mesh: Mesh, axis: str = "x",
              method: str = "ring"):
    """Row-partitioned SpMV: ``y_parts = A @ x`` with ``x`` sharded by the
    same block-row distribution. Returns ``(P, rows_local)`` sharded output.

    ``method='ring'`` runs the P-step ppermute pipeline (overlapped
    comm/compute, O(local) memory); ``method='all_gather'`` gathers x first.
    """
    nparts = mesh.shape[axis]
    blk_len = x_parts.shape[1]

    def local_fn(rp, cols, vals, nnz, xl):
        rp, cols, vals, nnz, xl = rp[0], cols[0], vals[0], nnz[0], xl[0]
        nrows = rp.shape[0] - 1
        if method == "all_gather":
            xg = jax.lax.all_gather(xl, axis, tiled=True)
            y = _local_csr_spmv(rp, cols, vals, nnz, xg)
        elif method == "ring":
            me = jax.lax.axis_index(axis)
            cap = cols.shape[0]
            live = jnp.arange(cap, dtype=jnp.int32) < nnz
            rows = row_ids_from_row_ptr(rp, cap)
            rows = jnp.where(live, rows, nrows)
            perm = [(i, (i - 1) % nparts) for i in range(nparts)]
            y = jnp.zeros((nrows,), vals.dtype)
            x_cur = xl
            for s in range(nparts):
                blk = (me + s) % nparts
                y = y + _local_block_contrib(
                    cols, vals, rows, live, x_cur, blk, blk_len, nrows)
                if s + 1 < nparts:
                    x_cur = jax.lax.ppermute(x_cur, axis, perm)
        else:
            raise ValueError(f"unknown method {method!r}")
        return y[None]

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis))
    return fn(part.row_ptr, part.cols, part.vals, part.nnz, x_parts)


def dist_spmv_bucketed(part: RowPartitionedBucketed, x_parts, mesh: Mesh,
                       axis: str = "x"):
    """Ring SpMV over the column-bucketed layout: at step ``s`` each device
    multiplies only the bucket owned by the x-block it currently holds, so
    the whole ring does one pass over the local entries (the naive ring
    rescans everything every step). Communication pattern identical to
    ``dist_spmv(..., method='ring')``."""
    nparts = mesh.shape[axis]
    blk_len = x_parts.shape[1]
    if part.n_buckets != nparts or part.blk_len != blk_len:
        raise ValueError(
            "bucketed layout must match the mesh/x distribution: "
            f"n_buckets={part.n_buckets} vs P={nparts}, "
            f"blk_len={part.blk_len} vs {blk_len}")
    rows_local = part.rows_local

    def local_fn(rows, cols, vals, nnz, xl):
        rows, cols, vals, nnz, xl = (rows[0], cols[0], vals[0], nnz[0],
                                     xl[0])
        me = jax.lax.axis_index(axis)
        perm = [(i, (i - 1) % nparts) for i in range(nparts)]
        y = jnp.zeros((rows_local,), vals.dtype)
        x_cur = xl
        cap = rows.shape[1]
        slot = jnp.arange(cap, dtype=jnp.int32)
        for s in range(nparts):
            b = (me + s) % nparts
            r_b = jnp.take(rows, b, axis=0)
            c_b = jnp.take(cols, b, axis=0)
            v_b = jnp.take(vals, b, axis=0)
            live = slot < jnp.take(nnz, b)
            rel = jnp.clip(c_b - b * blk_len, 0, blk_len - 1)
            prod = jnp.where(live, v_b * jnp.take(x_cur, rel), 0)
            tgt = jnp.where(live, r_b, rows_local)
            y = y.at[tgt].add(prod, mode="drop")
            if s + 1 < nparts:
                x_cur = jax.lax.ppermute(x_cur, axis, perm)
        return y[None]

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis),) * 5,
        out_specs=P(axis))
    return fn(part.rows, part.cols, part.vals, part.nnz, x_parts)


def dist_spmm_bucketed(part: RowPartitionedBucketed, x_parts, mesh: Mesh,
                       axis: str = "x"):
    """Ring SpMM over the column-bucketed layout: the dense right block
    ``X (P, blk_len, N)`` rotates around the ring while each device
    multiplies only the bucket owned by the resident block — one pass over
    the local entries total, O(local X block) peak memory, comm overlapped
    with compute (the SpMM analogue of :func:`dist_spmv_bucketed`;
    round-1 ``dist_spmm`` all-gathers X, O(K x N) per device)."""
    nparts = mesh.shape[axis]
    blk_len = x_parts.shape[1]
    if part.n_buckets != nparts or part.blk_len != blk_len:
        raise ValueError(
            "bucketed layout must match the mesh/X distribution: "
            f"n_buckets={part.n_buckets} vs P={nparts}, "
            f"blk_len={part.blk_len} vs {blk_len}")
    rows_local = part.rows_local

    def local_fn(rows, cols, vals, nnz, xl):
        rows, cols, vals, nnz, xl = (rows[0], cols[0], vals[0], nnz[0],
                                     xl[0])
        me = jax.lax.axis_index(axis)
        perm = [(i, (i - 1) % nparts) for i in range(nparts)]
        N = xl.shape[1]
        y = jnp.zeros((rows_local, N), vals.dtype)
        x_cur = xl
        cap = rows.shape[1]
        slot = jnp.arange(cap, dtype=jnp.int32)
        for s in range(nparts):
            b = (me + s) % nparts
            r_b = jnp.take(rows, b, axis=0)
            c_b = jnp.take(cols, b, axis=0)
            v_b = jnp.take(vals, b, axis=0)
            live = slot < jnp.take(nnz, b)
            rel = jnp.clip(c_b - b * blk_len, 0, blk_len - 1)
            gathered = jnp.take(x_cur, rel, axis=0)       # (cap, N)
            prod = jnp.where(live[:, None], v_b[:, None] * gathered, 0)
            tgt = jnp.where(live, r_b, rows_local)
            y = y.at[tgt].add(prod, mode="drop")
            if s + 1 < nparts:
                x_cur = jax.lax.ppermute(x_cur, axis, perm)
        return y[None]

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis),) * 5,
        out_specs=P(axis))
    return fn(part.rows, part.cols, part.vals, part.nnz, x_parts)


def dist_spmv_halo(part: RowPartitionedCSR, x_parts, mesh: Mesh,
                   axis: str = "x", *, halo: int):
    """Banded-matrix SpMV with neighbor-only halo exchange.

    For matrices whose columns stay within ``halo`` of the local row range
    (bandwidth <= halo — the BASELINE config-2 family), each device needs
    only the tail of its left neighbour's x block and the head of its
    right neighbour's: two ``ppermute`` transfers of ``halo`` elements,
    independent of P. This is the weak-scaling-correct primitive — the
    ring rotates ALL of x past every device (O(P * blk) comm per device,
    which the analytical model shows cannot hit the 80% weak-scaling
    target for ~10 nnz/row matrices), while halo comm is O(halo).

    Entries whose columns fall outside the halo window contribute zero;
    callers must choose ``halo`` >= the true matrix bandwidth (checked
    eagerly when the operand is concrete).
    """
    nparts = mesh.shape[axis]
    blk_len = x_parts.shape[1]
    if halo > blk_len:
        raise ValueError(f"halo={halo} exceeds block length {blk_len}")
    rows_local = part.rows_local

    def local_fn(rp, cols, vals, nnz, xl):
        rp, cols, vals, nnz, xl = rp[0], cols[0], vals[0], nnz[0], xl[0]
        me = jax.lax.axis_index(axis)
        # Left halo: tail of the left neighbour's block (device p receives
        # from p-1); right halo: head of the right neighbour's block.
        from_left = jax.lax.ppermute(
            xl[blk_len - halo:], axis,
            [(i, (i + 1) % nparts) for i in range(nparts)])
        from_right = jax.lax.ppermute(
            xl[:halo], axis,
            [(i, (i - 1) % nparts) for i in range(nparts)])
        # Zero the wrapped halos at the chain ends (no periodic boundary).
        from_left = jnp.where(me > 0, from_left, 0)
        from_right = jnp.where(me < nparts - 1, from_right, 0)
        x_ext = jnp.concatenate([from_left, xl, from_right])

        nrows = rp.shape[0] - 1
        cap = cols.shape[0]
        live = jnp.arange(cap, dtype=jnp.int32) < nnz
        rel = cols - (me * blk_len - halo)
        in_win = live & (rel >= 0) & (rel < blk_len + 2 * halo)
        xg = jnp.take(x_ext, jnp.clip(rel, 0, blk_len + 2 * halo - 1))
        prod = jnp.where(in_win, vals * xg, 0)
        rows = row_ids_from_row_ptr(rp, cap)
        rows = jnp.where(in_win, rows, nrows)
        y = jnp.zeros((nrows,), prod.dtype).at[rows].add(prod, mode="drop")
        return y[None]

    # Eager bandwidth check when operands are concrete.
    if not isinstance(part.cols, jax.core.Tracer):
        cols_h = np.asarray(part.cols)
        nnz_h = np.asarray(part.nnz)
        for p in range(nparts):
            c = cols_h[p][: int(nnz_h[p])]
            if c.size:
                lo, hi = p * blk_len - halo, (p + 1) * blk_len + halo
                if (c < lo).any() or (c >= hi).any():
                    raise ValueError(
                        f"partition {p} has columns outside its halo-{halo} "
                        "window; increase halo or use dist_spmv")

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis),) * 5,
        out_specs=P(axis))
    return fn(part.row_ptr, part.cols, part.vals, part.nnz, x_parts)


def dist_spmm(part: RowPartitionedCSR, x_parts, mesh: Mesh, axis: str = "x"):
    """Row-partitioned SpMM: dense block ``X`` sharded by rows of the inner
    dimension; gathered per device, local gather+segment-sum SpMM."""
    def local_fn(rp, cols, vals, nnz, xl):
        rp, cols, vals, nnz = rp[0], cols[0], vals[0], nnz[0]
        xg = jax.lax.all_gather(xl[0], axis, tiled=True)   # (K_pad, N)
        cap = cols.shape[0]
        nrows = rp.shape[0] - 1
        live = jnp.arange(cap, dtype=jnp.int32) < nnz
        gathered = jnp.take(xg, cols, axis=0, mode="fill", fill_value=0)
        prod = jnp.where(live[:, None], vals[:, None] * gathered, 0)
        rows = row_ids_from_row_ptr(rp, cap)
        rows = jnp.where(live, rows, nrows)
        y = jnp.zeros((nrows, xg.shape[1]), prod.dtype).at[rows].add(
            prod, mode="drop")
        return y[None]

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis))
    return fn(part.row_ptr, part.cols, part.vals, part.nnz, x_parts)


# ----------------------------------------------------------------------
# SpGEMM
# ----------------------------------------------------------------------
def dist_spgemm(a_part: RowPartitionedCSR, b_part: RowPartitionedCSR,
                mesh: Mesh, axis: str = "x", *, expand_cap: int,
                out_cap: int, with_overflow: bool = False):
    """Row-partitioned SpGEMM ``C = A @ B``.

    ``A`` is partitioned by output rows; ``B`` by inner-dimension rows. Each
    device all-gathers B's (block-padded) buffers, addresses them through a
    gathered row map (global row k lives at ``blk * cap_local + local_ptr``),
    and runs the ESC expansion + merge locally. Static ``expand_cap`` /
    ``out_cap`` bound the per-device product count and output nnz.

    ``with_overflow=True`` returns ``(result, overflow)`` where
    ``overflow`` counts per partition the products truncated by
    ``expand_cap`` and the distinct output cells past ``out_cap`` — the
    same completeness contract as :func:`dist_spgemm_a2a` /
    :func:`dist_spgemm_ring`. Prefer it whenever the caps were not
    derived from an exact plan.
    """
    from ..core.errors import spsparse_error

    if a_part.shape[1] != b_part.shape[0]:
        # Reference contract (multiply_sparse.hpp:172-174).
        spsparse_error(-1,
                       "Inner dimensions for A (%d) and B (%d) must match!",
                       a_part.shape[1], b_part.shape[0])
    nparts = mesh.shape[axis]
    b_rows_local = b_part.rows_local
    b_cap_local = b_part.cap_local
    K, J = b_part.shape
    rows_local_a = a_part.rows_local

    def local_fn(arp, acols, avals, annz, brp, bcols, bvals, bnnz):
        arp, acols, avals, annz = arp[0], acols[0], avals[0], annz[0]
        # Gather all of B's blocks (padded layout preserved).
        brp_g = jax.lax.all_gather(brp[0], axis)     # (Pb, R+1)
        bcols_g = jax.lax.all_gather(bcols[0], axis)  # (Pb, capB)
        bvals_g = jax.lax.all_gather(bvals[0], axis)
        nblocks = brp_g.shape[0]

        # Global row map over padded buffers: start/len for rows 0..K_pad-1.
        starts = (brp_g[:, :-1]
                  + (jnp.arange(nblocks, dtype=jnp.int32)[:, None]
                     * b_cap_local)).reshape(-1)
        lens = (brp_g[:, 1:] - brp_g[:, :-1]).reshape(-1)
        flat_cols = bcols_g.reshape(-1)
        flat_vals = bvals_g.reshape(-1)
        k_rows = nblocks * b_rows_local

        # Local A entries: local row ids + global k columns.
        cap_a = acols.shape[0]
        live = jnp.arange(cap_a, dtype=jnp.int32) < annz
        a_rows = row_ids_from_row_ptr(arp, cap_a)
        a_rows = jnp.where(live, a_rows, rows_local_a)

        cnt = jnp.take(lens, jnp.where(live, acols, k_rows),
                       mode="fill", fill_value=0)
        ov_expand = jnp.maximum(
            jnp.sum(jnp.where(live, cnt, 0)) - expand_cap, 0)

        i_t, j_t, v_t, valid_t = expand_products_raw(
            a_rows, acols, avals, live,
            starts, lens, flat_cols, flat_vals, J, k_rows,
            None, None, expand_cap)
        merged, n_runs = sort_and_merge_products(
            i_t, j_t, v_t, valid_t, (rows_local_a, J), merge_cap=out_cap,
            with_run_count=True)
        overflow = (ov_expand
                    + jnp.maximum(n_runs - out_cap, 0)).astype(jnp.int32)
        keep = merged.valid_mask() & (merged.vals != 0)
        from ..core.consolidate import filter_compact
        out = filter_compact(merged, keep, cap=out_cap)
        return (out.indices[None], out.vals[None], out.nnz[None],
                overflow[None])

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis),) * 8,
        out_specs=(P(axis), P(axis), P(axis), P(axis)))
    idx, vals, nnz, overflow = fn(
        a_part.row_ptr, a_part.cols, a_part.vals, a_part.nnz,
        b_part.row_ptr, b_part.cols, b_part.vals, b_part.nnz)
    out = RowPartitionedCOO(indices=idx, vals=vals, nnz=nnz,
                            shape=(a_part.shape[0], J),
                            rows_local=rows_local_a)
    return (out, overflow) if with_overflow else out
