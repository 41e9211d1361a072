"""Ring-pipelined distributed SpGEMM.

``dist_spgemm`` all-gathers B up front (a bandwidth burst plus O(nnz_B)
memory per device); ``dist_spgemm_a2a`` exchanges exactly the needed rows
but needs two all_to_all phases. This variant streams B's row blocks
around the ring — at step ``s`` every device multiplies the A entries
whose inner index falls in the resident B block while ``ppermute`` moves
the next block — the SpGEMM analogue of the ring SpMV. Peak memory stays
O(local B block); communication totals one full rotation of B.

A's entries must be pre-bucketed by the owner of their inner index —
exactly the :class:`~spsparse_tpu.dist.partition.RowPartitionedBucketed`
layout (built with ``blk_len = B.rows_local``), so step ``s`` touches only
bucket ``(me+s) % P`` instead of rescanning all local entries.

Per-step products land in a ``(P * expand_cap_step,)`` buffer; one stable
sort + segmented merge at the end compresses them into the local output
rows. ``expand_cap_step`` bounds products per step per device (plan with
the same row-flop logic as :func:`spsparse_tpu.ops.spgemm.plan_spgemm_caps`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.consolidate import filter_compact
from ..ops.multiply import expand_products_raw, sort_and_merge_products
from .ops import RowPartitionedCOO
from .partition import RowPartitionedBucketed, RowPartitionedCSR

__all__ = ["dist_spgemm_ring"]

Array = Any


def dist_spgemm_ring(a_bkt: RowPartitionedBucketed,
                     b_part: RowPartitionedCSR, mesh: Mesh,
                     axis: str = "x", *, expand_cap_step: int,
                     out_cap: int):
    """Row-partitioned ``C = A @ B`` with B ring-rotated block by block.

    Returns ``(result, overflow)``: like :func:`dist_spgemm_a2a`,
    ``overflow`` counts per partition every product truncated by
    ``expand_cap_step`` and every distinct output cell past ``out_cap``.
    Callers MUST check ``overflow.sum() == 0`` before trusting the
    result."""
    from ..core.errors import spsparse_error

    nparts = mesh.shape[axis]
    if a_bkt.shape[1] != b_part.shape[0]:
        # Reference contract (multiply_sparse.hpp:172-174).
        spsparse_error(-1,
                       "Inner dimensions for A (%d) and B (%d) must match!",
                       a_bkt.shape[1], b_part.shape[0])
    if a_bkt.n_buckets != nparts or a_bkt.blk_len != b_part.rows_local:
        raise ValueError(
            "A must be bucketed by B's row blocks: "
            f"n_buckets={a_bkt.n_buckets} vs P={nparts}, "
            f"blk_len={a_bkt.blk_len} vs rows_local={b_part.rows_local}")
    rows_local_a = a_bkt.rows_local
    blk = b_part.rows_local
    K, J = b_part.shape
    E = expand_cap_step

    def local_fn(ar, ac, av, an, brp, bcols, bvals, bnnz):
        ar, ac, av, an = ar[0], ac[0], av[0], an[0]
        b_state = (brp[0], bcols[0], bvals[0])
        me = jax.lax.axis_index(axis)
        perm = [(i, (i - 1) % nparts) for i in range(nparts)]
        cap_bkt = ar.shape[1]
        slot = jnp.arange(cap_bkt, dtype=jnp.int32)

        i_all = jnp.zeros((nparts * E,), jnp.int32)
        j_all = jnp.zeros((nparts * E,), jnp.int32)
        v_all = jnp.zeros((nparts * E,), av.dtype)
        ok_all = jnp.zeros((nparts * E,), bool)
        ov_expand = jnp.zeros((), jnp.int32)

        for s in range(nparts):
            b = (me + s) % nparts
            rp_cur, cols_cur, vals_cur = b_state
            rows_b = jnp.take(ar, b, axis=0)
            cols_b = jnp.take(ac, b, axis=0)
            vals_b = jnp.take(av, b, axis=0)
            live = slot < jnp.take(an, b)
            k_local = jnp.clip(cols_b - b * blk, 0, blk - 1)
            # Step truncation: products this step = sum of the resident
            # block's row lengths over live bucket entries.
            row_len_cur = rp_cur[1:] - rp_cur[:-1]
            cnt = jnp.take(row_len_cur, jnp.where(live, k_local, blk),
                           mode="fill", fill_value=0)
            total_s = jnp.sum(jnp.where(live, cnt, 0)).astype(jnp.int32)
            ov_expand = ov_expand + jnp.maximum(total_s - E, 0)
            i_t, j_t, v_t, valid_t = expand_products_raw(
                rows_b, jnp.where(live, k_local, blk), vals_b, live,
                rp_cur[:-1], rp_cur[1:] - rp_cur[:-1],
                cols_cur, vals_cur, J, blk,
                None, None, E)
            i_all = jax.lax.dynamic_update_slice(i_all, i_t, (s * E,))
            j_all = jax.lax.dynamic_update_slice(j_all, j_t, (s * E,))
            v_all = jax.lax.dynamic_update_slice(v_all, v_t, (s * E,))
            ok_all = jax.lax.dynamic_update_slice(ok_all, valid_t, (s * E,))
            if s + 1 < nparts:
                b_state = tuple(
                    jax.lax.ppermute(t, axis, perm) for t in b_state)

        merged, n_runs = sort_and_merge_products(
            i_all, j_all, v_all, ok_all, (rows_local_a, J),
            merge_cap=out_cap, with_run_count=True)
        overflow = (ov_expand
                    + jnp.maximum(n_runs - out_cap, 0)).astype(jnp.int32)
        keep = merged.valid_mask() & (merged.vals != 0)
        out = filter_compact(merged, keep, cap=out_cap)
        return (out.indices[None], out.vals[None], out.nnz[None],
                overflow[None])

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis),) * 8,
        out_specs=(P(axis), P(axis), P(axis), P(axis)))
    idx, vals, nnz, overflow = fn(
        a_bkt.rows, a_bkt.cols, a_bkt.vals, a_bkt.nnz,
        b_part.row_ptr, b_part.cols, b_part.vals, b_part.nnz)
    out = RowPartitionedCOO(indices=idx, vals=vals, nnz=nnz,
                            shape=(a_bkt.shape[0], J),
                            rows_local=rows_local_a)
    return out, overflow
