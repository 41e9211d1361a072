"""Smoothed-aggregation AMG: setup via the framework's own SpGEMM chain,
V-cycle correctness, and CG preconditioning quality on 2D Poisson.

No reference counterpart; oracles are dense numpy solves and the
textbook expectation that AMG-preconditioned CG converges in a few dozen
iterations where Jacobi-CG needs hundreds.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.solvers import pcg_solve
from spsparse_tpu.solvers.amg import amg_setup, amg_vcycle


@pytest.fixture
def rng():
    return np.random.default_rng(21)


def poisson2d(m):
    """5-point 2D Poisson on an m x m grid (SPD, n = m^2)."""
    n = m * m
    rows, cols, vals = [], [], []

    def add(i, j, v):
        rows.append(i)
        cols.append(j)
        vals.append(v)

    for y in range(m):
        for x in range(m):
            i = y * m + x
            add(i, i, 4.0)
            if x > 0:
                add(i, i - 1, -1.0)
            if x < m - 1:
                add(i, i + 1, -1.0)
            if y > 0:
                add(i, i - m, -1.0)
            if y < m - 1:
                add(i, i + m, -1.0)
    b = CooBuilder((n, n), dtype=np.float64)
    b.add_many(np.stack([np.asarray(rows), np.asarray(cols)], 1),
               np.asarray(vals))
    A = b.build()
    Ad = np.zeros((n, n))
    Ad[rows, cols] = vals
    return A, Ad


class TestAmg:
    def test_hierarchy_shape_and_galerkin(self):
        A, Ad = poisson2d(16)
        h = amg_setup(A, coarse_size=32)
        assert len(h.levels) >= 2
        # Coarsening actually coarsens.
        sizes = [lvl.a.shape[0] for lvl in h.levels]
        assert all(sizes[i] > sizes[i + 1] for i in range(len(sizes) - 1))
        assert h.coarse_dense.shape[0] == sizes[-1]
        # Galerkin product correctness on the first level: A1 = P^T A P.
        lvl = h.levels[0]
        P = np.zeros((lvl.p.shape[0], lvl.p.shape[1]))
        live = np.asarray(lvl.p.cols) >= 0
        # Reconstruct P densely from the CSR view via spmv on basis vecs.
        from spsparse_tpu.ops.spmm import spmv
        for j in range(lvl.p.shape[1]):
            e = np.zeros(lvl.p.shape[1])
            e[j] = 1.0
            P[:, j] = np.asarray(spmv(lvl.p, jnp.asarray(e)))
        A1 = np.zeros((sizes[1], sizes[1]))
        for j in range(sizes[1]):
            e = np.zeros(sizes[1])
            e[j] = 1.0
            A1[:, j] = np.asarray(spmv(h.levels[1].a, jnp.asarray(e)))
        np.testing.assert_allclose(A1, P.T @ Ad @ P, atol=1e-10)

    def test_vcycle_reduces_error(self, rng):
        A, Ad = poisson2d(24)
        h = amg_setup(A)
        x_true = rng.standard_normal(Ad.shape[0])
        b = Ad @ x_true
        z = amg_vcycle(h, jnp.asarray(b))
        # One V-cycle from zero must shrink the A-norm error well below
        # the starting error ||x_true||_A.
        e0 = x_true
        e1 = x_true - np.asarray(z)
        a0 = e0 @ (Ad @ e0)
        a1 = e1 @ (Ad @ e1)
        assert a1 < 0.25 * a0, (a1, a0)

    def test_cg_amg_beats_jacobi_and_converges(self, rng):
        from spsparse_tpu import to_csr
        from spsparse_tpu.ops.spmm import spmv
        from spsparse_tpu.solvers import (extract_diagonal,
                                          jacobi_preconditioner)
        A, Ad = poisson2d(24)
        n = Ad.shape[0]
        h = amg_setup(A)
        csr = to_csr(A.consolidate((0, 1)))
        mv = lambda v: spmv(csr, v)
        b = jnp.asarray(rng.standard_normal(n))
        x_amg, rs_amg = pcg_solve(mv, b, iters=25, minv=h)
        mj = jacobi_preconditioner(extract_diagonal(csr))
        _, rs_j = pcg_solve(mv, b, iters=25, minv=mj)
        assert float(rs_amg) < 1e-6 * float(rs_j), (rs_amg, rs_j)
        np.testing.assert_allclose(np.asarray(x_amg),
                                   np.linalg.solve(Ad, np.asarray(b)),
                                   rtol=1e-6, atol=1e-8)

    def test_vcycle_jits_and_is_symmetric(self, rng):
        A, Ad = poisson2d(12)
        h = amg_setup(A, coarse_size=16)
        f = jax.jit(lambda r: amg_vcycle(h, r))
        n = Ad.shape[0]
        u = rng.standard_normal(n)
        v = rng.standard_normal(n)
        # M^{-1} must be symmetric: <u, M^{-1} v> == <M^{-1} u, v>
        # (required for use inside CG).
        lhs = float(u @ np.asarray(f(jnp.asarray(v))))
        rhs = float(np.asarray(f(jnp.asarray(u))) @ v)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-10)

    def test_validation_and_small_matrix(self, rng):
        from spsparse_tpu import SpSparseError, coo_vector
        vb = coo_vector(4, dtype=np.float64)
        vb.add((0,), 1.0)
        with pytest.raises(SpSparseError):
            amg_setup(vb.build())
        # A tiny SPD matrix never coarsens: single dense level must solve.
        A, Ad = poisson2d(4)
        h = amg_setup(A, coarse_size=64)
        assert len(h.levels) == 1
        b = rng.standard_normal(16)
        z = np.asarray(amg_vcycle(h, jnp.asarray(b)))
        np.testing.assert_allclose(z, np.linalg.solve(Ad, b), rtol=1e-10)

    def test_stalled_coarsening_raises(self):
        # A diagonal operator has an empty strength graph: aggregation
        # stalls with n >> coarse_size, which must raise (not densify an
        # n x n matrix).
        from spsparse_tpu import SpSparseError, coo_eye
        A = coo_eye(10000, dtype=np.float64)
        with pytest.raises(SpSparseError, match="stalled"):
            amg_setup(A, coarse_size=64)
