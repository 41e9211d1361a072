"""Smoothed-aggregation algebraic multigrid (AMG) — the scalable
preconditioner tier, assembled entirely from this framework's own ops.

Why it belongs here: Jacobi/block-Jacobi preconditioning leaves CG's
iteration count growing with the mesh size; AMG gives (near)
mesh-independent convergence for the elliptic/regridding operators this
library targets. And it is the framework's best self-test: the setup
phase IS the diag-scaled sparse multiply chain — the smoothed prolongator
is ``(I - w D^-1 A) @ P_t`` (one SpGEMM) and each Galerkin coarse
operator is ``P^T A P`` (two more), all through
:func:`spsparse_tpu.ops.multiply`.

Host/device split, matching the framework convention (reorder.py,
tiled planning): *setup* is eager — strength-of-connection filtering,
greedy aggregation (a sequential BFS-style pass, host numpy), the SpGEMM
chain products, and CSR view construction; the resulting level stack is
a pytree of static-shape arrays. *Application* (the V-cycle) is pure
jittable device code: Jacobi smoothing sweeps, residual restriction
``P^T r``, recursion to a dense coarsest solve — fixed structure, no
data-dependent control flow.

No reference counterpart (citibeth/spsparse has no solver layer);
algorithm follows the standard smoothed-aggregation construction
(Vanek/Mandel/Brezina) reformulated on this library's primitives.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from ..core.coo import CooBuilder, SparseCOO
from ..core.errors import SpSparseError
from ..core.structure import SparseCSR, to_csr
from ..ops.multiply import multiply
from ..ops.spmm import spmv

Array = Any

__all__ = ["amg_setup", "amg_vcycle", "AmgLevel", "AmgHierarchy"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AmgLevel:
    """One AMG level: the operator, its inverse diagonal (damped-Jacobi
    smoother), and the prolongator/restrictor pair down to this level's
    coarse space (absent on the coarsest level)."""
    a: SparseCSR                  # level operator (n, n)
    dinv: Array                   # (n,) damped-Jacobi inverse diagonal
    p: SparseCSR | None           # prolongator (n, n_coarse)
    pt: SparseCSR | None          # restrictor = P^T (n_coarse, n)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AmgHierarchy:
    levels: tuple                  # tuple[AmgLevel, ...], fine -> coarse
    coarse_dense: Array            # (nc, nc) dense coarsest operator
    omega: float = dataclasses.field(metadata=dict(static=True))
    pre_sweeps: int = dataclasses.field(metadata=dict(static=True))
    post_sweeps: int = dataclasses.field(metadata=dict(static=True))

    def __call__(self, r: Array) -> Array:
        """Apply one V-cycle as a preconditioner: ``z ~ A^{-1} r``
        (pass the hierarchy directly as ``minv`` to ``pcg_solve``)."""
        return amg_vcycle(self, r)


def _strength_graph(rows, cols, vals, diag, n, theta):
    """Symmetric strength of connection: keep off-diagonal (i, j) with
    ``|a_ij| >= theta * sqrt(|a_ii a_jj|)``."""
    dd = np.sqrt(np.abs(diag[rows] * diag[cols]))
    keep = (rows != cols) & (np.abs(vals) >= theta * np.maximum(dd, 1e-300))
    return rows[keep], cols[keep]


def _greedy_aggregate(n, s_rows, s_cols):
    """Standard greedy aggregation over the strength graph. Returns
    ``agg (n,) int64`` aggregate ids (every node assigned)."""
    order = np.argsort(s_rows, kind="stable")
    sr, sc = s_rows[order], s_cols[order]
    ptr = np.searchsorted(sr, np.arange(n + 1))
    agg = np.full(n, -1, dtype=np.int64)
    n_agg = 0
    # Pass 1: a node with no aggregated strong neighbour seeds a new
    # aggregate containing itself + all its strong neighbours.
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbr = sc[ptr[i]:ptr[i + 1]]
        if (agg[nbr] >= 0).any():
            continue
        agg[i] = n_agg
        agg[nbr] = n_agg
        n_agg += 1
    # Pass 2: unaggregated nodes join the aggregate of any strong
    # neighbour (first one wins — cheap and standard).
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbr = sc[ptr[i]:ptr[i + 1]]
        hit = nbr[agg[nbr] >= 0]
        if hit.size:
            agg[i] = agg[hit[0]]
    # Pass 3: isolated leftovers become singletons.
    for i in range(n):
        if agg[i] < 0:
            agg[i] = n_agg
            n_agg += 1
    return agg, n_agg


def _coo_from_arrays(rows, cols, vals, shape, dtype):
    b = CooBuilder(shape, dtype=dtype)
    b.add_many(np.stack([rows, cols], axis=1), vals)
    return b.build()


def amg_setup(a: SparseCOO, *, theta: float = 0.08, omega: float = 2 / 3,
              max_levels: int = 10, coarse_size: int = 64,
              pre_sweeps: int = 1, post_sweeps: int = 1) -> AmgHierarchy:
    """Build a smoothed-aggregation AMG hierarchy for a symmetric
    positive-definite ``a`` (eager setup; concrete operand required).

    Per level: strength filter (``theta``) -> greedy aggregation ->
    tentative piecewise-constant prolongator (columns normalized) ->
    Jacobi smoothing ``P = (I - omega D^-1 A) P_t`` via one framework
    SpGEMM -> Galerkin ``A_c = P^T A P`` via two more. Coarsening stops
    at ``coarse_size`` rows (dense-solved) or when aggregation stalls.

    The returned :class:`AmgHierarchy` is a pytree; call it (or pass it
    as ``minv``) to apply one V(pre,post)-cycle under ``jit``."""
    if a.rank != 2 or a.shape[0] != a.shape[1]:
        raise SpSparseError("amg_setup requires a square rank-2 operator")
    cur = a.consolidate((0, 1))
    dtype = np.dtype(np.asarray(cur.vals).dtype)
    levels = []
    for _ in range(max_levels):
        n = int(cur.shape[0])
        idx = np.asarray(cur.indices)
        live = np.asarray(cur.valid_mask())
        rows = idx[live, 0].astype(np.int64)
        cols = idx[live, 1].astype(np.int64)
        vals = np.asarray(cur.vals)[live].astype(dtype)
        diag = np.zeros(n, dtype)
        on_d = rows == cols
        np.add.at(diag, rows[on_d], vals[on_d])
        dinv = np.where(np.abs(diag) > 1e-300, 1.0 / diag, 1.0)

        if n <= coarse_size:
            break
        s_rows, s_cols = _strength_graph(rows, cols, vals, diag, n, theta)
        agg, n_agg = _greedy_aggregate(n, s_rows, s_cols)
        if n_agg >= n or n_agg == 0:
            break                       # aggregation stalled; stop here

        # Tentative prolongator: P_t[i, agg[i]] = 1/sqrt(|aggregate|).
        sizes = np.bincount(agg, minlength=n_agg).astype(dtype)
        pt_vals = 1.0 / np.sqrt(sizes[agg])
        p_t = _coo_from_arrays(np.arange(n), agg, pt_vals, (n, n_agg),
                               dtype)
        # Smoothed prolongator P = (I - omega D^-1 A) P_t — one SpGEMM
        # through the framework's own multiply chain (S = -omega*D^-1*A
        # overlaid with +1 on the diagonal).
        s_off = _coo_from_arrays(
            rows, cols, -omega * dinv[rows] * vals, (n, n), dtype)
        eye = _coo_from_arrays(np.arange(n), np.arange(n),
                               np.ones(n, dtype), (n, n), dtype)
        from ..core.algebra import coo_concat
        smoother = coo_concat(s_off, eye).consolidate((0, 1))
        p = multiply(1.0, smoother, p_t).consolidate((0, 1))
        # Galerkin coarse operator A_c = P^T A P (two SpGEMMs).
        ap = multiply(1.0, cur, p)
        a_c = multiply(1.0, p, ap, transpose_a=True).consolidate((0, 1))

        p_coo = p
        pt_coo = p.transposed((1, 0)).consolidate((0, 1))
        levels.append(AmgLevel(
            a=to_csr(cur), dinv=jnp.asarray(dinv),
            p=to_csr(p_coo), pt=to_csr(pt_coo)))
        cur = a_c

    # Coarsest level: keep the operator for smoothing symmetry bookkeeping
    # and densify for the direct solve.
    n = int(cur.shape[0])
    if n > max(int(coarse_size) * 8, 4096):
        # Aggregation stalled (e.g. no strong connections at theta, or
        # max_levels exhausted) far above the dense-solve scale; a clear
        # error beats an O(n^2) densification OOM.
        raise SpSparseError(
            f"AMG coarsening stalled at {n} rows (> dense-solve limit "
            f"{max(int(coarse_size) * 8, 4096)}); lower theta, raise "
            f"max_levels/coarse_size, or use a Jacobi/block-Jacobi "
            f"preconditioner for this operator")
    idxc = np.asarray(cur.indices)
    livec = np.asarray(cur.valid_mask())
    dense = np.zeros((n, n), dtype)
    np.add.at(dense, (idxc[livec, 0], idxc[livec, 1]),
              np.asarray(cur.vals)[livec])
    diag_c = np.diag(dense).copy()
    dinv_c = np.where(np.abs(diag_c) > 1e-300, 1.0 / diag_c, 1.0)
    levels.append(AmgLevel(a=to_csr(cur), dinv=jnp.asarray(dinv_c),
                           p=None, pt=None))
    return AmgHierarchy(levels=tuple(levels),
                        coarse_dense=jnp.asarray(dense),
                        omega=float(omega), pre_sweeps=int(pre_sweeps),
                        post_sweeps=int(post_sweeps))


def _smooth(level: AmgLevel, omega, x, b, sweeps: int):
    for _ in range(sweeps):
        x = x + omega * level.dinv * (b - spmv(level.a, x))
    return x


def amg_vcycle(h: AmgHierarchy, r: Array) -> Array:
    """One V(pre,post)-cycle of the hierarchy applied to ``r`` (i.e. an
    approximation of ``A^{-1} r``), fully jittable. With symmetric
    damped-Jacobi smoothing and equal pre/post sweeps the cycle is a
    symmetric positive operator — safe as a CG preconditioner."""
    def cycle(k: int, b: Array) -> Array:
        lvl: AmgLevel = h.levels[k]
        if lvl.p is None:                       # coarsest: direct solve
            return jnp.linalg.solve(
                h.coarse_dense, b.astype(h.coarse_dense.dtype)
            ).astype(b.dtype)
        x = _smooth(lvl, h.omega, jnp.zeros_like(b), b, h.pre_sweeps)
        resid = b - spmv(lvl.a, x)
        e_c = cycle(k + 1, spmv(lvl.pt, resid))
        x = x + spmv(lvl.p, e_c)
        return _smooth(lvl, h.omega, x, b, h.post_sweeps)

    return cycle(0, r)
