"""Scalable distributed SpGEMM: all_to_all exchange of needed B rows.

``dist_spgemm`` (in :mod:`spsparse_tpu.dist.ops`) all-gathers B — O(nnz_B)
communication per device, fine for small inner matrices. This module
implements the north-star design (BASELINE.json): B's rows are exchanged
with ``jax.lax.all_to_all`` *keyed on column partitions*, so each device
receives only the B rows its local A columns actually reference —
communication proportional to the partition boundary, not to B.

Protocol (per device, inside ``shard_map``):

1. **Request build** — sort + dedup local A inner indices ``k``; bucket them
   by owner (``k // b_rows_local``) into a ``(P, R1)`` request table.
2. **Request exchange** — ``all_to_all``: owner ``o`` receives the row ids
   every peer wants from it.
3. **Reply build** — owner packs the cols/vals of each requested row into a
   ``(P, R2)`` reply buffer (expansion-style fill over the run-length
   cumsum), plus per-request row lengths.
4. **Reply exchange** — two more ``all_to_all``s return lengths and
   payloads.
5. **Mini-CSR assembly** — the requester scatters (start, len) per global
   ``k`` into lookup tables addressing its concatenated reply buffers, then
   runs the standard local ESC expansion + merge
   (:func:`spsparse_tpu.ops.multiply.expand_products_raw`).

Static capacities: ``req_cap`` (R1) bounds distinct ``k`` per (device,
owner) pair; ``reply_cap`` (R2) bounds entries replied per pair;
``expand_cap``/``out_cap`` bound the local product expansion and output.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.consolidate import filter_compact
from ..core.joinfill import row_ids_from_row_ptr
from ..ops.multiply import expand_products_raw, sort_and_merge_products
from .ops import RowPartitionedCOO
from .partition import RowPartitionedCSR

__all__ = ["dist_spgemm_a2a"]

Array = Any


def _build_requests(k_cols, live, n_parts, rows_local, req_cap, K):
    """Sorted-unique local k's bucketed by owner → (P, R1) request table
    (sentinel K for unused slots)."""
    cap = k_cols.shape[0]
    ks = jnp.where(live, k_cols, K).astype(jnp.int32)
    ks = jax.lax.sort(ks)
    uniq = (ks < K) & ((jnp.arange(cap) == 0) | (ks != jnp.roll(ks, 1)))
    owner = jnp.where(uniq, ks // rows_local, n_parts).astype(jnp.int32)
    # Rank of each unique k within its owner bucket: position among uniques
    # minus the number of uniques belonging to earlier owners.
    uidx = jnp.cumsum(uniq.astype(jnp.int32)) - 1
    owner_sorted = owner  # ks sorted => owners nondecreasing over uniques
    # first unique-index of each owner via searchsorted over owners of uniques
    # Build compacted owner list implicitly: count uniques with owner < o.
    uniq_owner = jnp.where(uniq, owner_sorted, n_parts)
    counts = jnp.zeros((n_parts + 1,), jnp.int32).at[uniq_owner].add(
        uniq.astype(jnp.int32), mode="drop")
    first_of_owner = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    slot = uidx - jnp.take(first_of_owner, jnp.minimum(owner, n_parts))
    ok = uniq & (slot < req_cap)
    tgt_o = jnp.where(ok, owner, n_parts)
    tgt_s = jnp.where(ok, slot, 0)
    req = jnp.full((n_parts, req_cap), K, jnp.int32).at[tgt_o, tgt_s].set(
        ks, mode="drop")
    overflow = jnp.sum((uniq & (slot >= req_cap)).astype(jnp.int32))
    return req, overflow


def _build_replies(req, row_ptr_local, cols_local, vals_local, base_row,
                   rows_local, ncols_b, reply_cap):
    """Pack requested rows' entries into per-requester reply buffers.

    ``req``: (P, R1) global row ids requested from *this* device. Returns
    ``(lens (P, R1), reply_cols (P, R2), reply_vals (P, R2), overflow)``.
    """
    n_parts, R1 = req.shape
    local_r = req - base_row
    in_range = (local_r >= 0) & (local_r < rows_local)
    lr = jnp.clip(local_r, 0, rows_local - 1)
    starts = jnp.take(row_ptr_local[:-1], lr)
    lens = jnp.where(in_range,
                     jnp.take(row_ptr_local[1:], lr) - starts, 0)

    def fill_one(starts_p, lens_p):
        cum = jnp.cumsum(lens_p)
        total = cum[-1]
        t = jnp.arange(reply_cap, dtype=jnp.int32)
        r = jnp.searchsorted(cum, t, side="right").astype(jnp.int32)
        r = jnp.minimum(r, R1 - 1)
        base = jnp.take(cum, r) - jnp.take(lens_p, r)
        src = jnp.take(starts_p, r) + (t - base)
        ok = t < jnp.minimum(total, reply_cap)
        c = jnp.where(ok, jnp.take(cols_local, src, mode="fill",
                                   fill_value=ncols_b), ncols_b)
        v = jnp.where(ok, jnp.take(vals_local, src, mode="fill",
                                   fill_value=0), 0)
        return c.astype(jnp.int32), v, jnp.maximum(total - reply_cap, 0)

    reply_cols, reply_vals, over = jax.vmap(fill_one)(starts, lens)
    return lens.astype(jnp.int32), reply_cols, reply_vals, jnp.sum(over)


def dist_spgemm_a2a(a_part: RowPartitionedCSR, b_part: RowPartitionedCSR,
                    mesh: Mesh, axis: str = "x", *, req_cap: int,
                    reply_cap: int, expand_cap: int, out_cap: int):
    """Row-partitioned ``C = A @ B`` with all_to_all B-row exchange.

    Returns ``(result, overflow)`` where ``overflow`` is a per-partition
    count covering EVERY static-capacity loss on that partition: request
    slots past ``req_cap``, reply entries past ``reply_cap`` (attributed
    to the *requesting* partition, whose output is the one missing them),
    elementary products past ``expand_cap``, and distinct output cells
    past ``out_cap``. Callers MUST check ``overflow.sum() == 0`` — a
    nonzero value means the capacities were too small for this operand
    pair and the result is incomplete (entries missing, never corrupted:
    reply reads are clamped to each owner's region)."""
    from ..core.errors import spsparse_error

    if a_part.shape[1] != b_part.shape[0]:
        # Reference contract: inner-dim mismatch raises through the error
        # handler (multiply_sparse.hpp:172-174), same as local multiply.
        spsparse_error(-1,
                       "Inner dimensions for A (%d) and B (%d) must match!",
                       a_part.shape[1], b_part.shape[0])
    n_parts = mesh.shape[axis]
    rows_local_a = a_part.rows_local
    b_rows_local = b_part.rows_local
    K, J = b_part.shape
    K_pad = n_parts * b_rows_local

    def local_fn(arp, acols, avals, annz, brp, bcols, bvals, bnnz):
        arp, acols, avals, annz = arp[0], acols[0], avals[0], annz[0]
        brp, bcols, bvals = brp[0], bcols[0], bvals[0]
        me = jax.lax.axis_index(axis)

        cap_a = acols.shape[0]
        live = jnp.arange(cap_a, dtype=jnp.int32) < annz

        # 1-2: requests out, requests in.
        req, _ov1 = _build_requests(acols, live, n_parts, b_rows_local,
                                    req_cap, K_pad)
        req_in = jax.lax.all_to_all(req, axis, split_axis=0, concat_axis=0,
                                    tiled=False)
        # all_to_all with tiled=False on (P, R1): device receives (P, R1)
        # where row p is what peer p requested from us.

        # 3-4: replies out, replies in.
        lens, rcols, rvals, _ov_owner = _build_replies(
            req_in, brp, bcols, bvals, me * b_rows_local, b_rows_local, J,
            reply_cap)
        del _ov_owner  # counted requester-side below (right attribution)
        lens_in = jax.lax.all_to_all(lens, axis, 0, 0)
        rcols_in = jax.lax.all_to_all(rcols, axis, 0, 0)
        rvals_in = jax.lax.all_to_all(rvals, axis, 0, 0)
        # Row p of *_in = owner p's reply to OUR request table req[p].

        # 5: mini-CSR over global k: start/len lookup tables. Owners
        # truncate their packed replies at reply_cap but report FULL row
        # lengths; clamp each row's effective length to what fits inside
        # its owner's region, so an overflowing reply yields missing (not
        # cross-owner-corrupted) entries — and count the loss HERE, on
        # the requester whose output is incomplete.
        starts_within = jnp.concatenate([
            jnp.zeros((n_parts, 1), jnp.int32),
            jnp.cumsum(lens_in, axis=1)[:, :-1]], axis=1)
        lens_eff = jnp.minimum(
            lens_in, jnp.maximum(reply_cap - starts_within, 0))
        _ov2 = jnp.sum(lens_in - lens_eff)
        owner_base = (jnp.arange(n_parts, dtype=jnp.int32) * reply_cap)[:, None]
        flat_start = (starts_within + owner_base).reshape(-1)
        flat_len = lens_eff.reshape(-1)
        flat_k = req[:, :].reshape(-1)  # the k each request slot asked for
        row_start = jnp.zeros((K_pad + 1,), jnp.int32).at[flat_k].set(
            flat_start, mode="drop")[:-1]
        row_len = jnp.zeros((K_pad + 1,), jnp.int32).at[flat_k].set(
            flat_len, mode="drop")[:-1]

        flat_cols = rcols_in.reshape(-1)
        flat_vals = rvals_in.reshape(-1)

        a_rows = row_ids_from_row_ptr(arp, cap_a)
        a_rows = jnp.where(live, a_rows, rows_local_a)

        # Expansion truncation: total products = sum of mini-CSR row
        # lengths over live A entries.
        cnt = jnp.take(row_len, jnp.where(live, acols, K_pad),
                       mode="fill", fill_value=0)
        total_products = jnp.sum(jnp.where(live, cnt, 0))
        _ov3 = jnp.maximum(total_products - expand_cap, 0)

        i_t, j_t, v_t, valid_t = expand_products_raw(
            a_rows, acols, avals, live,
            row_start, row_len, flat_cols, flat_vals, J, K_pad,
            None, None, expand_cap)
        merged, n_runs = sort_and_merge_products(
            i_t, j_t, v_t, valid_t, (rows_local_a, J), merge_cap=out_cap,
            with_run_count=True)
        _ov4 = jnp.maximum(n_runs - out_cap, 0)
        keep = merged.valid_mask() & (merged.vals != 0)
        out = filter_compact(merged, keep, cap=out_cap)
        overflow = (_ov1 + _ov2 + _ov3 + _ov4).astype(jnp.int32)
        return out.indices[None], out.vals[None], out.nnz[None], overflow[None]

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
    return out, overflow
