"""Distributed graph relaxations over the row-partitioned layout.

The single-chip graph tier (:mod:`spsparse_tpu.graph`) is iterated
semiring SpMV; this module runs the same relaxations over a
:class:`~spsparse_tpu.dist.partition.RowPartitionedCSR` on a device
mesh. No reference counterpart (the reference is single-process,
SURVEY §2) and no scipy counterpart at all — this is the north-star
"scale axis" (matrix partitioning) applied to the graph tier.

Communication shapes, chosen per quantity's access pattern:

* **Bellman-Ford / BFS** — distances are *sharded* like the rows. Each
  round every device relaxes its local edges (tails are local rows, so
  the distance gather is local), producing per-head candidate minima for
  the whole graph; the cross-device min-combine is a reduce-scatter-min
  built from one ``all_to_all`` + a local min (there is no min-scatter
  collective; ``all_to_all`` moves exactly ``n`` values per device per
  round, the same traffic as ``psum_scatter``).
* **Connected components** — labels are *replicated*: every edge reads
  labels at both endpoints every round, so replication turns two global
  gathers into local reads at the cost of one ``(n,)`` ``pmin`` per
  round (+ pointer jumping, which is purely local on replicated state).

Both run their fixpoint loops inside ``shard_map`` under
``lax.while_loop`` with a collectively-reduced convergence flag, so
every device exits on the same round (lockstep, no host round-trips).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..core.joinfill import row_ids_from_row_ptr
from .partition import RowPartitionedCSR

__all__ = ["dist_bellman_ford", "dist_bfs_levels",
           "dist_connected_components"]

Array = Any


def _local_edges(rp, cols, vals, nnz, nrows_local):
    """(local_row_ids, global_heads, weights, live) of one CSR block."""
    cap = cols.shape[0]
    live = jnp.arange(cap, dtype=jnp.int32) < nnz
    rows = row_ids_from_row_ptr(rp, cap)
    rows = jnp.where(live, rows, 0)
    heads = jnp.where(live, cols, 0)
    return rows.astype(jnp.int32), heads.astype(jnp.int32), vals, live


def dist_bellman_ford(part: RowPartitionedCSR, sources, mesh: Mesh,
                      axis: str = "x", *, unweighted: bool = False,
                      maxiter: int | None = None) -> Array:
    """Multi-source shortest paths on a row-partitioned graph.

    ``sources`` is a length-``k`` array of global node ids. Returns the
    sharded distance block ``(P, rows_local, k)`` (host view:
    ``out.reshape(-1, k)[:n]`` — rows beyond ``n`` are block padding).
    ``inf`` marks unreachable nodes. Negative weights are relaxed
    correctly up to ``maxiter`` rounds (default ``n``); negative-cycle
    detection is the caller's business in the fixed-iteration contract
    (run one extra round and compare, as :func:`spsparse_tpu.graph.
    bellman_ford` does eagerly).
    """
    nparts = mesh.shape[axis]
    L = part.rows_local
    n = int(part.shape[0])
    k = int(np.atleast_1d(np.asarray(sources)).shape[0])
    srcs = jnp.atleast_1d(jnp.asarray(sources)).astype(jnp.int32)
    rounds = n if maxiter is None else int(maxiter)
    dt = part.vals.dtype
    if not jnp.issubdtype(dt, jnp.floating):
        dt = jnp.float32

    def local_fn(rp, cols, vals, nnz):
        rp, cols, vals, nnz = rp[0], cols[0], vals[0], nnz[0]
        me = lax.axis_index(axis)
        rows, heads, w, live = _local_edges(rp, cols, vals, nnz, L)
        wl = jnp.where(live, jnp.ones_like(w) if unweighted else w,
                       jnp.inf).astype(dt)
        # local slice of the initial distances: 0 at owned sources
        gid = me * L + jnp.arange(L, dtype=jnp.int32)       # my global rows
        d0 = jnp.where(gid[:, None] == srcs[None, :], 0, jnp.inf).astype(dt)

        def relax(d):
            c = jnp.take(d, rows, axis=0) + wl[:, None]      # (cap, k)
            y = jax.ops.segment_min(c, heads,
                                    num_segments=nparts * L)  # (n_pad, k)
            # reduce-scatter-min: device p keeps block p of the global
            # min — all_to_all exchanges the blocks, the min is local.
            yb = y.reshape(nparts, L, k)
            mine = lax.all_to_all(yb, axis, split_axis=0, concat_axis=0)
            return jnp.minimum(d, jnp.min(mine, axis=0))

        def cond(s):
            it, _, changed = s
            return jnp.logical_and(it < rounds, changed)

        def body(s):
            it, d, _ = s
            nd = relax(d)
            ch = lax.pmax(jnp.any(nd < d).astype(jnp.int32), axis) > 0
            return it + 1, nd, ch

        _, d, _ = lax.while_loop(cond, body, (0, relax(d0),
                                              jnp.array(True)))
        return d[None]

    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(P(axis), P(axis), P(axis), P(axis)),
                       out_specs=P(axis))
    return fn(part.row_ptr, part.cols, part.vals, part.nnz)


def dist_bfs_levels(part: RowPartitionedCSR, sources, mesh: Mesh,
                    axis: str = "x") -> Array:
    """Hop counts from ``sources`` — distributed level-synchronous BFS
    (unweighted :func:`dist_bellman_ford`; rounds = eccentricity)."""
    return dist_bellman_ford(part, sources, mesh, axis, unweighted=True)


def dist_connected_components(part: RowPartitionedCSR, mesh: Mesh,
                              axis: str = "x") -> Array:
    """Weak connected-component labels of a row-partitioned graph.

    Returns the replicated ``(n_padded,)`` int32 label vector (labels
    numbered in order of first node occurrence, matching
    :func:`spsparse_tpu.graph.connected_components`; padded rows beyond
    ``n`` are isolated and occupy the trailing labels — slice ``[:n]``
    and ignore them). Min-label propagation with pointer jumping; each
    round relaxes local edges in BOTH orientations (row-partitioned
    storage only holds the tail-side, so the head->tail direction rides
    the same local edge list) and combines with one ``pmin``.
    """
    nparts = mesh.shape[axis]
    L = part.rows_local
    n_pad = nparts * L
    n = int(part.shape[0])

    def local_fn(rp, cols, vals, nnz):
        rp, cols, vals, nnz = rp[0], cols[0], vals[0], nnz[0]
        me = lax.axis_index(axis)
        rows, heads, _, live = _local_edges(rp, cols, vals, nnz, L)
        tails = me * L + rows                                # global ids
        lab0 = jnp.arange(n_pad, dtype=jnp.int32)

        def step(lab):
            # tail -> head and head -> tail in one segmented pass
            seg = jnp.concatenate([heads, tails])
            src = jnp.concatenate([tails, heads])
            data = jnp.where(jnp.concatenate([live, live]),
                             jnp.take(lab, src), n_pad).astype(jnp.int32)
            inc = jax.ops.segment_min(data, seg, num_segments=n_pad)
            inc = lax.pmin(inc, axis)
            lab = jnp.minimum(lab, inc)
            lab = jnp.minimum(lab, jnp.take(lab, lab))  # pointer jumping
            return jnp.minimum(lab, jnp.take(lab, lab))

        def cond(s):
            it, _, changed = s
            return jnp.logical_and(it < n_pad, changed)

        def body(s):
            it, lab, _ = s
            nl = step(lab)
            ch = lax.pmax(jnp.any(nl != lab).astype(jnp.int32), axis) > 0
            return it + 1, nl, ch

        _, lab, _ = lax.while_loop(cond, body,
                                   (0, step(lab0), jnp.array(True)))
        return lab

    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(P(axis), P(axis), P(axis), P(axis)),
                       out_specs=P())
    lab = fn(part.row_ptr, part.cols, part.vals, part.nnz)
    # first-occurrence renumbering (same convention as graph.csgraph)
    is_root = lab == jnp.arange(n_pad, dtype=jnp.int32)
    return (jnp.cumsum(is_root) - 1).astype(jnp.int32)[lab]
