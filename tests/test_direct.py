"""Direct solver tier (solvers.direct + native LU) vs numpy/scipy
oracles.

Contract source: scipy.sparse.linalg {splu, spsolve, factorized,
spsolve_triangular} (no reference counterpart — SURVEY.md §2,
citibeth/spsparse has no solver tier). The native factorization is
csrc/spsparse_lu.cpp (Gilbert-Peierls); the device solve path is the
level-sweep fixed point documented in solvers/direct.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import scipy.sparse as ssp
from scipy.sparse.linalg import spsolve_triangular as sp_tri

from spsparse_tpu import SparseCOO
from spsparse_tpu.core.errors import SpSparseError
from spsparse_tpu.solvers import (SparseLU, splu, spsolve, factorized,
                                  spsolve_triangular)


def random_system(seed, n=None, density=None):
    rng = np.random.default_rng(seed)
    n = n or int(rng.integers(5, 60))
    density = density or float(rng.uniform(0.05, 0.4))
    A = (rng.random((n, n)) < density) * rng.standard_normal((n, n))
    # dominant signed diagonal => nonsingular with near-certainty
    A += np.diag(rng.uniform(1, 3, n) * np.sign(rng.standard_normal(n)))
    return A, SparseCOO.from_dense(A), rng.standard_normal(n)


class TestSplu:
    @pytest.mark.parametrize("seed", [0, 7, 21, 33])
    @pytest.mark.parametrize("spec", ["NATURAL", "RCM"])
    def test_solve_vs_numpy(self, seed, spec):
        A, As, b = random_system(seed)
        lu = splu(As, permc_spec=spec)
        np.testing.assert_allclose(np.asarray(lu.solve(b)),
                                   np.linalg.solve(A, b), atol=1e-8)

    @pytest.mark.parametrize("spec", ["NATURAL", "RCM"])
    def test_scipy_permutation_identity(self, spec):
        """Pr @ A @ Pc == L @ U with scipy's documented Pr/Pc
        construction (scipy.sparse.linalg.SuperLU docs)."""
        A, As, _ = random_system(3)
        n = A.shape[0]
        lu = splu(As, permc_spec=spec)
        Pr = np.zeros((n, n)); Pr[lu.perm_r, np.arange(n)] = 1
        Pc = np.zeros((n, n)); Pc[np.arange(n), lu.perm_c] = 1
        LU = np.asarray(lu.L.to_dense()) @ np.asarray(lu.U.to_dense())
        np.testing.assert_allclose(Pr @ A @ Pc, LU, atol=1e-9)

    def test_factor_shapes(self):
        A, As, _ = random_system(5)
        lu = splu(As)
        L = np.asarray(lu.L.to_dense())
        U = np.asarray(lu.U.to_dense())
        assert np.allclose(L, np.tril(L))
        assert np.allclose(np.diag(L), 1.0)
        assert np.allclose(U, np.triu(U))
        assert lu.shape == A.shape
        assert lu.nnz > 0

    def test_transpose_solve(self):
        A, As, b = random_system(11)
        lu = splu(As)
        for trans in ("T", "H"):
            np.testing.assert_allclose(np.asarray(lu.solve(b, trans=trans)),
                                       np.linalg.solve(A.T, b), atol=1e-8)

    def test_multi_rhs(self):
        A, As, _ = random_system(13)
        B = np.random.default_rng(1).standard_normal((A.shape[0], 4))
        lu = splu(As)
        np.testing.assert_allclose(np.asarray(lu.solve(B)),
                                   np.linalg.solve(A, B), atol=1e-8)

    def test_solve_is_jittable(self):
        A, As, b = random_system(17)
        lu = splu(As)
        f = jax.jit(lu.solve)
        np.testing.assert_allclose(np.asarray(f(b)),
                                   np.linalg.solve(A, b), atol=1e-8)

    def test_singular_raises(self):
        S = SparseCOO.from_dense(np.array([[1.0, 2.0], [2.0, 4.0]]))
        with pytest.raises(SpSparseError, match="singular"):
            splu(S)

    def test_nonsquare_raises(self):
        S = SparseCOO.from_dense(np.ones((2, 3)))
        with pytest.raises(SpSparseError):
            splu(S)

    def test_bad_permc_spec(self):
        _, As, _ = random_system(2)
        with pytest.raises(SpSparseError, match="permc_spec"):
            splu(As, permc_spec="COLAMD")

    def test_rcm_reduces_band_fill(self):
        """A scrambled banded matrix refactors to (near-)banded under
        RCM, so the factor fill must not exceed NATURAL's."""
        rng = np.random.default_rng(4)
        n = 80
        band = np.diag(rng.uniform(2, 3, n))
        for k in (1, 2):
            band += np.diag(rng.standard_normal(n - k), k)
            band += np.diag(rng.standard_normal(n - k), -k)
        p = rng.permutation(n)
        A = band[p][:, p]
        As = SparseCOO.from_dense(A)
        nat = splu(As, permc_spec="NATURAL").nnz
        rcm = splu(As, permc_spec="RCM").nnz
        assert rcm <= nat


class TestSpsolve:
    def test_dense_rhs(self):
        A, As, b = random_system(19)
        np.testing.assert_allclose(np.asarray(spsolve(As, b)),
                                   np.linalg.solve(A, b), atol=1e-8)

    def test_sparse_rhs_returns_sparse(self):
        A, As, _ = random_system(23, n=15)
        Bd = (np.random.default_rng(2).random((15, 2)) < 0.3) * 1.0
        X = spsolve(As, SparseCOO.from_dense(Bd))
        assert isinstance(X, SparseCOO)
        np.testing.assert_allclose(np.asarray(X.to_dense()),
                                   np.linalg.solve(A, Bd), atol=1e-8)

    def test_factorized(self):
        A, As, b = random_system(29)
        solve = factorized(As)
        np.testing.assert_allclose(np.asarray(solve(b)),
                                   np.linalg.solve(A, b), atol=1e-8)


class TestSpsolveTriangular:
    @pytest.mark.parametrize("seed", [1, 9])
    @pytest.mark.parametrize("lower", [True, False])
    @pytest.mark.parametrize("method", ["device", "host"])
    def test_vs_scipy(self, seed, lower, method):
        A, _, b = random_system(seed)
        T = np.tril(A) if lower else np.triu(A)
        Ts = SparseCOO.from_dense(T)
        ref = sp_tri(ssp.csr_matrix(T), b, lower=lower)
        got = spsolve_triangular(Ts, b, lower=lower, method=method)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-8)

    def test_unit_diagonal(self):
        A, _, b = random_system(31)
        T = np.tril(A)
        ref = sp_tri(ssp.csr_matrix(T), b, lower=True, unit_diagonal=True)
        got = spsolve_triangular(SparseCOO.from_dense(T), b,
                                 lower=True, unit_diagonal=True)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-8)

    def test_multi_rhs_device(self):
        A, _, _ = random_system(37, n=30)
        T = np.tril(A)
        B = np.random.default_rng(3).standard_normal((30, 5))
        got = spsolve_triangular(SparseCOO.from_dense(T), B,
                                 method="device")
        np.testing.assert_allclose(np.asarray(got),
                                   np.linalg.solve(T, B), atol=1e-8)

    def test_deep_levels_route_to_host(self):
        """A bidiagonal chain has n levels — 'auto' must route to the
        host substitution and stay exact."""
        n = 600
        rng = np.random.default_rng(5)
        T = np.diag(rng.uniform(1, 2, n)) + np.diag(
            rng.standard_normal(n - 1), -1)
        b = rng.standard_normal(n)
        got = spsolve_triangular(SparseCOO.from_dense(T), b)
        np.testing.assert_allclose(np.asarray(got),
                                   np.linalg.solve(T, b), atol=1e-7)

    def test_zero_diag_raises(self):
        T = SparseCOO.from_dense(np.array([[0.0, 0.0], [1.0, 3.0]]))
        with pytest.raises(SpSparseError):
            spsolve_triangular(T, np.ones(2))

    def test_missing_diag_raises(self):
        T = SparseCOO.from_dense(np.array([[2.0, 0.0], [1.0, 0.0]]))
        with pytest.raises(SpSparseError, match="diagonal"):
            spsolve_triangular(T, np.ones(2))

    def test_wrong_triangle_ignored(self):
        """Documented divergence: only the stated triangle is read
        (scipy reads everything and returns garbage)."""
        M = np.array([[2.0, 9.0], [1.0, 3.0]])
        got = spsolve_triangular(SparseCOO.from_dense(M), np.array([2.0, 5.0]),
                                 lower=True)
        np.testing.assert_allclose(np.asarray(got),
                                   np.linalg.solve(np.tril(M),
                                                   [2.0, 5.0]))


class TestNativeLuDirect:
    """The native layer in isolation (ctypes boundary)."""

    def test_lu_factor_host_roundtrip(self):
        from spsparse_tpu import native
        rng = np.random.default_rng(0)
        n = 25
        A = (rng.random((n, n)) < 0.3) * rng.standard_normal((n, n))
        A += np.diag(rng.uniform(1, 2, n))
        S = ssp.csc_matrix(A)
        (lcp, lri, lv), (ucp, uri, uv), pr = native.lu_factor_host(
            n, S.indptr, S.indices, S.data)
        L = ssp.csc_matrix((lv, lri, lcp), shape=(n, n)).toarray() + np.eye(n)
        U = ssp.csc_matrix((uv, uri, ucp), shape=(n, n)).toarray()
        np.testing.assert_allclose(L @ U, A[pr, :], atol=1e-10)

    def test_trisolve_host(self):
        from spsparse_tpu import native
        rng = np.random.default_rng(1)
        n = 30
        T = np.tril((rng.random((n, n)) < 0.4) * rng.standard_normal((n, n)))
        np.fill_diagonal(T, rng.uniform(1, 2, n))
        S = ssp.csc_matrix(T)
        b = rng.standard_normal(n)
        got = native.trisolve_host(n, S.indptr, S.indices, S.data, b,
                                   lower=True)
        np.testing.assert_allclose(got, np.linalg.solve(T, b), atol=1e-10)

    def test_singular_info_column(self):
        from spsparse_tpu import native
        A = np.array([[1.0, 2.0], [0.0, 0.0]])   # col 1 unreachable pivot
        S = ssp.csc_matrix(A)
        with pytest.raises(ValueError, match="column 1"):
            native.lu_factor_host(2, S.indptr, S.indices, S.data)


def _poisson2d(m):
    n = m * m
    A = np.zeros((n, n))
    for i in range(m):
        for j in range(m):
            k = i * m + j
            A[k, k] = 4.0
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < m and 0 <= jj < m:
                    A[k, ii * m + jj] = -1.0
    return A


class TestSpilu:
    """spilu (SuperLU-ILUTP contract; csrc dual-threshold ILUT)."""

    def test_no_drops_is_exact(self):
        from spsparse_tpu.solvers import spilu
        A, As, b = random_system(41)
        ilu = spilu(As, drop_tol=0.0, fill_factor=1e9)
        np.testing.assert_allclose(np.asarray(ilu.solve(b)),
                                   np.linalg.solve(A, b), atol=1e-8)

    def test_drops_reduce_fill(self):
        from spsparse_tpu.solvers import spilu, splu
        A = _poisson2d(12)
        As = SparseCOO.from_dense(A)
        assert spilu(As, drop_tol=1e-2,
                     fill_factor=4).nnz < splu(As).nnz

    def test_preconditions_cg(self):
        """The whole point: ILU-PCG beats plain CG by orders of
        magnitude on a Poisson system at equal iteration count."""
        from spsparse_tpu.solvers import spilu, pcg_solve, cg_solve
        from spsparse_tpu.ops.spmm import spmv
        from spsparse_tpu.core.structure import to_csr
        A = _poisson2d(14)
        As = SparseCOO.from_dense(A)
        csr = to_csr(As)
        mv = lambda x: spmv(csr, x)
        b = np.random.default_rng(0).standard_normal(A.shape[0])
        ilu = spilu(As, drop_tol=1e-2, fill_factor=4)
        xp, _ = pcg_solve(mv, jnp.asarray(b), iters=20, minv=ilu.solve)
        xu, _ = cg_solve(mv, jnp.asarray(b), iters=20)
        rp = np.linalg.norm(A @ np.asarray(xp) - b)
        ru = np.linalg.norm(A @ np.asarray(xu) - b)
        assert rp < 0.2 * ru

    def test_ilu_levels_shallower_than_exact(self):
        """Dropping shortens dependency chains — the property that
        keeps the device sweep path cheap for preconditioning."""
        from spsparse_tpu.solvers import spilu, splu
        A = _poisson2d(12)
        As = SparseCOO.from_dense(A)
        assert (spilu(As, drop_tol=1e-2, fill_factor=4)._lplan.nlev
                < splu(As)._lplan.nlev)


class TestMatfuncs:
    """inv / full expm (solvers.matfuncs; scipy.sparse.linalg parity)."""

    def test_inv(self):
        from spsparse_tpu.solvers import inv
        A, As, _ = random_system(43, n=25)
        np.testing.assert_allclose(np.asarray(inv(As).to_dense()),
                                   np.linalg.inv(A), atol=1e-8)

    @pytest.mark.parametrize("scale", [0.01, 0.2, 0.8, 1.8, 4.5, 12.0])
    def test_expm_all_pade_degrees(self, scale):
        """Each scale lands in a different Higham theta band (degrees
        3/5/7/9/13 + squaring)."""
        from scipy.linalg import expm as dense_expm
        from spsparse_tpu.solvers import expm
        rng = np.random.default_rng(11)
        n = 20
        A = ((rng.random((n, n)) < 0.3)
             * rng.standard_normal((n, n))) * scale / np.sqrt(n)
        E = np.asarray(expm(SparseCOO.from_dense(A)).to_dense())
        ref = dense_expm(A)
        assert (np.abs(E - ref).max() / max(1.0, np.abs(ref).max())
                < 1e-9)

    def test_expm_diagonal_exact(self):
        from spsparse_tpu.solvers import expm
        d = np.array([0.5, -1.0, 2.0])
        E = np.asarray(expm(SparseCOO.from_dense(np.diag(d))).to_dense())
        np.testing.assert_allclose(E, np.diag(np.exp(d)), rtol=1e-12)

    def test_nonsquare_raises(self):
        from spsparse_tpu.solvers import expm, inv
        R = SparseCOO.from_dense(np.ones((2, 3)))
        for f in (expm, inv):
            with pytest.raises(SpSparseError):
                f(R)


class TestSweepRepresentations:
    """The device sweep picks its layout by factor structure
    (solvers.direct._strict_parts): DIA for banded, ELL for bounded
    scattered rows, COO scatter for skew. Each must solve exactly."""

    @staticmethod
    def _plan(T):
        from spsparse_tpu.solvers.direct import _TriPlan
        S = ssp.csc_matrix(T)
        return _TriPlan(T.shape[0], S.indptr.astype(np.int64),
                        S.indices.astype(np.int64),
                        S.data.astype(np.float64), lower=True)

    def test_banded_routes_to_dia(self):
        rng = np.random.default_rng(0)
        n = 300
        T = np.diag(rng.uniform(1, 2, n))
        for k in (1, 3):
            T += np.diag(rng.standard_normal(n - k) * 0.2, -k)
        p = self._plan(T)
        assert p.kind == "dia"
        b = rng.standard_normal(n)
        np.testing.assert_allclose(np.asarray(p.solve(b, "device")),
                                   np.linalg.solve(T, b), atol=1e-9)

    def test_scattered_routes_to_ell(self):
        rng = np.random.default_rng(1)
        n = 3000
        T = np.diag(rng.uniform(1, 2, n))
        # ~5 scattered strict-lower entries per row -> ~6000 offsets
        for _ in range(5 * n):
            i = rng.integers(1, n)
            j = rng.integers(0, i)
            T[i, j] = rng.standard_normal() * 0.1
        p = self._plan(T)
        assert p.kind == "ell"
        b = rng.standard_normal(n)
        np.testing.assert_allclose(np.asarray(p.solve(b, "device")),
                                   np.linalg.solve(T, b), atol=1e-8)

    def test_skewed_routes_to_coo(self):
        rng = np.random.default_rng(2)
        n = 400
        T = np.diag(rng.uniform(1, 2, n))
        T[-1, :-1] = rng.standard_normal(n - 1) * 0.05   # one dense row
        # spread offsets so DIA declines: scattered strict entries
        for _ in range(3 * n):
            i = rng.integers(1, n)
            T[i, rng.integers(0, i)] = rng.standard_normal() * 0.05
        p = self._plan(T)
        assert p.kind == "coo"
        b = rng.standard_normal(n)
        np.testing.assert_allclose(np.asarray(p.solve(b, "device")),
                                   np.linalg.solve(T, b), atol=1e-8)
