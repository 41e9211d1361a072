"""Semiring SpMV — the vectorized primitive under every graph algorithm.

Classic graph algorithms (BFS, Bellman-Ford shortest paths, reachability,
label propagation / connected components, Boruvka MST rounds) are all
iterated sparse matrix-vector products over a *semiring* other than
(+, x): min-plus for shortest paths, or-and for reachability, min-min
for label propagation.  On TPU this is the idiomatic formulation — each
relaxation round is one gather + one segmented reduction over the edge
list, fully vectorized, jit/vmap/while_loop-compatible — instead of the
pointer-chasing worklist loops a CPU library would use.

No reference counterpart: citibeth/spsparse has no graph layer at all
(SURVEY.md §2); the scipy counterpart is ``scipy.sparse.csgraph``, whose
algorithms :mod:`spsparse_tpu.graph.csgraph` rebuilds on top of this
primitive.

Frontier shape convention: ``x`` is ``(n,)`` for a single source or
``(n, k)`` for ``k`` simultaneous sources/labels (the batched axis rides
the TPU lane dimension for free — multi-source shortest paths cost one
extra gather axis, not k passes).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..core.coo import SparseCOO
from ..core.errors import SpSparseError

__all__ = [
    "Semiring", "MIN_PLUS", "MAX_PLUS", "MIN_MIN", "MAX_MIN", "OR_AND",
    "PLUS_TIMES", "spmv_semiring", "edge_arrays",
]

Array = Any


@dataclasses.dataclass(frozen=True)
class Semiring:
    """A (combine, extend) pair with the combine identity.

    ``extend(w, x)`` maps an edge weight and the tail node's value to the
    edge's contribution; ``combine`` reduces contributions arriving at
    each head node (one of ``'min' | 'max' | 'sum'``, the three segmented
    reductions XLA lowers natively); ``identity`` is ``combine``'s
    identity, also used for padding and out-of-frontier nodes.
    """

    name: str
    combine: str                      # 'min' | 'max' | 'sum'
    extend: Callable[[Array, Array], Array]
    identity: float

    def segment(self, data: Array, segment_ids: Array, num: int) -> Array:
        if self.combine == "min":
            return jax.ops.segment_min(data, segment_ids, num_segments=num)
        if self.combine == "max":
            return jax.ops.segment_max(data, segment_ids, num_segments=num)
        if self.combine == "sum":
            return jax.ops.segment_sum(data, segment_ids, num_segments=num)
        raise SpSparseError(f"unknown combine {self.combine!r}")


MIN_PLUS = Semiring("min_plus", "min", lambda w, x: w + x, np.inf)
MAX_PLUS = Semiring("max_plus", "max", lambda w, x: w + x, -np.inf)
#: label propagation: carry the smaller of (incoming label, edge ignored)
MIN_MIN = Semiring("min_min", "min", lambda w, x: x, np.inf)
#: bottleneck / maximum-capacity paths
MAX_MIN = Semiring("max_min", "max", lambda w, x: jnp.minimum(w, x), -np.inf)
#: boolean reachability on 0/1 floats (max = or, * = and)
OR_AND = Semiring("or_and", "max", lambda w, x: x * (w != 0), 0.0)
PLUS_TIMES = Semiring("plus_times", "sum", lambda w, x: w * x, 0.0)


def edge_arrays(a: SparseCOO, *, directed: bool = True,
                unweighted: bool = False):
    """Edge list ``(tails, heads, weights, live)`` of a rank-2 graph.

    With ``directed=False`` every stored edge is emitted in both
    orientations (scipy.sparse.csgraph's undirected convention: the
    algorithm may travel ``csgraph[i, j]`` or ``csgraph[j, i]``), so the
    arrays have static length ``2*cap``. Padding slots come back with
    ``live=False`` and in-range node ids (0), so callers can mask
    contributions to the semiring identity without bounds issues.
    """
    if a.rank != 2 or a.shape[0] != a.shape[1]:
        raise SpSparseError(
            f"graph algorithms need a square rank-2 array, got {a.shape}")
    live = a.valid_mask()
    t = jnp.where(live, a.indices[:, 0], 0)
    h = jnp.where(live, a.indices[:, 1], 0)
    w = jnp.where(live, a.vals, 0)
    if unweighted:
        w = jnp.where(live, jnp.ones_like(a.vals), 0)
    if not directed:
        t, h = jnp.concatenate([t, h]), jnp.concatenate([h, t])
        w = jnp.concatenate([w, w])
        live = jnp.concatenate([live, live])
    return t, h, w, live


def spmv_semiring(a: SparseCOO, x: Array, semiring: Semiring, *,
                  transpose: bool = False, directed: bool = True,
                  unweighted: bool = False) -> Array:
    """One relaxation round: ``y[j] = combine over edges (i, j) of
    extend(w_ij, x[i])``.

    ``x`` may be ``(n,)`` or ``(n, k)``; the result matches. Nodes with
    no incoming edge get ``semiring.identity`` — NOT ``x``'s old value;
    compose with ``jnp.minimum(x, y)`` etc. for monotone fixpoints.
    jit-compatible; works on unsorted, duplicate-bearing COO directly
    (the segmented reduction absorbs duplicates the same way the
    semiring would).
    """
    t, h, w, live = edge_arrays(a, directed=directed, unweighted=unweighted)
    if transpose:
        t, h = h, t
    x = jnp.asarray(x)
    ident = jnp.asarray(semiring.identity, x.dtype)
    contrib = semiring.extend(w.astype(x.dtype)[(...,) + (None,) * (x.ndim - 1)],
                              jnp.take(x, t, axis=0))
    contrib = jnp.where(live[(...,) + (None,) * (x.ndim - 1)], contrib, ident)
    return semiring.segment(contrib, h, int(a.shape[0]))
