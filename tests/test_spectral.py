"""Spectral (eigsh/LOBPCG/svds) + least-squares (CGLS/LSQR) + MINRES
solver coverage.

No reference counterpart (the reference stops at the multiply chain); the
oracles are dense numpy eigendecompositions/SVDs/lstsq solves, with the
sparse path exercised through CSR spmv closures.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder, SparseCOO, to_csr
from spsparse_tpu.ops.spmm import spmv
from spsparse_tpu.solvers import (cgls_solve, expm_multiply, funm_multiply,
                                  lanczos_eigsh, lobpcg_solve,
                                  lsqr_solve, minres_solve, svds_lanczos,
                                  jacobi_preconditioner)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def spd_dense(rng, n, spread=10.0):
    """SPD with well-separated extreme eigenvalues (so the Lanczos/LOBPCG
    extreme pairs converge in few iterations)."""
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.linspace(1.0, spread, n)
    return (Q * lam) @ Q.T, lam, Q


def to_coo(A, dtype=np.float64):
    ii, jj = np.nonzero(A)
    b = CooBuilder(A.shape, dtype=dtype)
    b.add_many(np.stack([ii, jj], 1), A[ii, jj])
    return b.build()


class TestLanczosEigsh:
    def test_extreme_pairs_match_dense(self, rng):
        n, k = 60, 3
        A, lam, Q = spd_dense(rng, n)
        mv = lambda v: jnp.asarray(A) @ v
        v0 = jnp.asarray(rng.standard_normal(n))

        vals, vecs = lanczos_eigsh(mv, v0, k=k, iters=n, which="LA")
        np.testing.assert_allclose(np.asarray(vals), lam[-k:], rtol=1e-9)
        # Eigenvector check: A v = lambda v (sign-free).
        for i in range(k):
            v = np.asarray(vecs[:, i])
            np.testing.assert_allclose(A @ v, float(vals[i]) * v,
                                       atol=1e-7)

        vals_s, vecs_s = lanczos_eigsh(mv, v0, k=k, iters=n, which="SA")
        np.testing.assert_allclose(np.asarray(vals_s), lam[:k], rtol=1e-9)
        for i in range(k):
            v = np.asarray(vecs_s[:, i])
            np.testing.assert_allclose(A @ v, float(vals_s[i]) * v,
                                       atol=1e-7)

    def test_indefinite_symmetric(self, rng):
        # Works on symmetric indefinite operators (only symmetry needed).
        n = 40
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        lam = np.linspace(-5.0, 7.0, n)
        A = (Q * lam) @ Q.T
        vals, _ = lanczos_eigsh(lambda v: jnp.asarray(A) @ v,
                                jnp.asarray(rng.standard_normal(n)),
                                k=2, iters=n, which="SA")
        np.testing.assert_allclose(np.asarray(vals), lam[:2], rtol=1e-8)

    def test_sparse_matvec_and_jit(self, rng):
        n, k = 48, 2
        A, lam, _ = spd_dense(rng, n)
        csr = to_csr(to_coo(A))
        mv = lambda v: spmv(csr, v)
        v0 = jnp.asarray(rng.standard_normal(n))
        f = jax.jit(lambda v: lanczos_eigsh(mv, v, k=k, iters=n,
                                            which="LA"))
        vals, _ = f(v0)
        np.testing.assert_allclose(np.asarray(vals), lam[-k:], rtol=1e-8)

    def test_breakdown_low_rank(self, rng):
        # Rank-2 PSD operator: Krylov space exhausts after ~2 steps; the
        # spurious post-breakdown Ritz pairs must not pollute the top-k.
        n = 30
        u = rng.standard_normal(n)
        w = rng.standard_normal(n)
        A = 3.0 * np.outer(u, u) / (u @ u) + 1.5 * np.outer(w, w) / (w @ w)
        lam_true = np.sort(np.linalg.eigvalsh(A))
        vals, _ = lanczos_eigsh(lambda v: jnp.asarray(A) @ v,
                                jnp.asarray(rng.standard_normal(n)),
                                k=2, iters=12, which="LA")
        np.testing.assert_allclose(np.asarray(vals), lam_true[-2:],
                                   rtol=1e-7, atol=1e-9)

    def test_validation(self, rng):
        mv = lambda v: v
        v0 = jnp.ones(8)
        with pytest.raises(ValueError):
            lanczos_eigsh(mv, v0, k=0, which="LA")
        with pytest.raises(ValueError):
            lanczos_eigsh(mv, v0, k=3, iters=2)
        with pytest.raises(ValueError):
            lanczos_eigsh(mv, v0, k=1, which="LM")


class TestLobpcg:
    def test_smallest_with_preconditioner(self, rng):
        n, k = 64, 3
        A, lam, _ = spd_dense(rng, n, spread=100.0)
        Acoo = to_coo(A)
        mm = lambda X: jnp.asarray(A) @ X
        X0 = jnp.asarray(rng.standard_normal((n, k)))
        minv = jacobi_preconditioner(jnp.asarray(np.diag(A)))
        vals, X = lobpcg_solve(mm, X0, iters=60, minv=minv)
        np.testing.assert_allclose(np.asarray(vals), lam[:k], rtol=1e-6)
        for i in range(k):
            v = np.asarray(X[:, i])
            np.testing.assert_allclose(A @ v, float(vals[i]) * v,
                                       atol=1e-4)
        del Acoo

    def test_largest(self, rng):
        n, k = 50, 2
        A, lam, _ = spd_dense(rng, n)
        X0 = jnp.asarray(rng.standard_normal((n, k)))
        vals, _ = lobpcg_solve(lambda X: jnp.asarray(A) @ X, X0,
                               iters=50, largest=True)
        np.testing.assert_allclose(np.asarray(vals), lam[::-1][:k],
                                   rtol=1e-7)

    def test_jit_and_sparse_operator(self, rng):
        n, k = 40, 2
        A, lam, _ = spd_dense(rng, n)
        csr = to_csr(to_coo(A))
        mm = lambda X: jax.vmap(lambda c: spmv(csr, c),
                                in_axes=1, out_axes=1)(X)
        X0 = jnp.asarray(rng.standard_normal((n, k)))
        vals, _ = jax.jit(lambda X: lobpcg_solve(mm, X, iters=50))(X0)
        np.testing.assert_allclose(np.asarray(vals), lam[:k], rtol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError):
            lobpcg_solve(lambda X: X, jnp.ones(8), iters=3)


class TestSvds:
    def test_rectangular_top_k(self, rng):
        m, n, k = 50, 30, 3
        A = rng.standard_normal((m, n))
        # Spread the spectrum so the top-k separate cleanly.
        U, s, Vt = np.linalg.svd(A, full_matrices=False)
        s = np.linspace(10.0, 1.0, s.size)
        A = (U * s) @ Vt
        Aj = jnp.asarray(A)
        Uk, sk, Vtk = svds_lanczos(lambda v: Aj @ v, lambda u: Aj.T @ u,
                                   jnp.asarray(rng.standard_normal(n)),
                                   k=k, iters=n)
        np.testing.assert_allclose(np.asarray(sk), s[:k], rtol=1e-9)
        # Triplet consistency: A @ v_i = s_i u_i.
        for i in range(k):
            np.testing.assert_allclose(A @ np.asarray(Vtk[i]),
                                       float(sk[i]) * np.asarray(Uk[:, i]),
                                       atol=1e-7)

    def test_sparse_operator_jit(self, rng):
        m, n, k = 40, 24, 2
        d = np.zeros((m, n))
        # Regridding-style banded rectangular operator.
        for i in range(m):
            j = int(i * n / m)
            d[i, j] = 1.0 + 0.1 * i
            if j + 1 < n:
                d[i, j + 1] = 0.5
        csr = to_csr(to_coo(d))
        csrT = to_csr(to_coo(d.T))
        f = jax.jit(lambda v0: svds_lanczos(
            lambda v: spmv(csr, v), lambda u: spmv(csrT, u), v0,
            k=k, iters=n))
        Uk, sk, Vtk = f(jnp.asarray(rng.standard_normal(n)))
        s_true = np.linalg.svd(d, compute_uv=False)
        np.testing.assert_allclose(np.asarray(sk), s_true[:k], rtol=1e-8)

    def test_low_rank_breakdown(self, rng):
        m, n = 25, 18
        A = np.outer(rng.standard_normal(m), rng.standard_normal(n))
        Aj = jnp.asarray(A)
        _, sk, _ = svds_lanczos(lambda v: Aj @ v, lambda u: Aj.T @ u,
                                jnp.asarray(rng.standard_normal(n)),
                                k=2, iters=10)
        s_true = np.linalg.svd(A, compute_uv=False)
        np.testing.assert_allclose(float(sk[0]), s_true[0], rtol=1e-9)
        assert float(sk[1]) < 1e-8 * s_true[0]  # rank-1: second sv ~ 0


class TestFunm:
    def test_expm_multiply_matches_dense(self, rng):
        n = 36
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        lam = np.linspace(-2.0, 1.5, n)       # indefinite is fine for exp
        A = (Q * lam) @ Q.T
        v = rng.standard_normal(n)
        for t in (1.0, -0.5):
            got = expm_multiply(lambda u: jnp.asarray(A) @ u,
                                jnp.asarray(v), t=t, iters=n)
            expect = (Q * np.exp(t * lam)) @ (Q.T @ v)
            np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-9,
                                       atol=1e-11)

    def test_sqrt_and_inverse_via_funm(self, rng):
        n = 30
        A, lam, Q = spd_dense(rng, n)
        v = rng.standard_normal(n)
        mv = lambda u: jnp.asarray(A) @ u
        got = funm_multiply(mv, jnp.asarray(v), f=jnp.sqrt, iters=n)
        expect = (Q * np.sqrt(lam)) @ (Q.T @ v)
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-9,
                                   atol=1e-11)
        # f = 1/x reproduces the solver result.
        got_inv = funm_multiply(mv, jnp.asarray(v), f=lambda w: 1 / w,
                                iters=n)
        np.testing.assert_allclose(np.asarray(got_inv),
                                   np.linalg.solve(A, v), rtol=1e-9,
                                   atol=1e-11)

    def test_truncated_krylov_converges(self, rng):
        # Lanczos f(A)v converges fast in iters (well-conditioned case):
        # a 24-dim Krylov space on n=200 must already be accurate.
        n = 200
        A, lam, Q = spd_dense(rng, n, spread=4.0)
        v = rng.standard_normal(n)
        got = expm_multiply(lambda u: jnp.asarray(A) @ u, jnp.asarray(v),
                            t=-1.0, iters=24)
        expect = (Q * np.exp(-lam)) @ (Q.T @ v)
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-8,
                                   atol=1e-10)

    def test_jit_sparse_and_breakdown(self, rng):
        # Low-rank operator: breakdown padding must not corrupt f(A)v.
        n = 24
        u = rng.standard_normal(n)
        A = 2.0 * np.outer(u, u) / (u @ u)
        v = rng.standard_normal(n)
        csr = to_csr(to_coo(A))
        got = jax.jit(lambda vv: expm_multiply(
            lambda w: spmv(csr, w), vv, t=1.0, iters=12))(jnp.asarray(v))
        lam_d, Q_d = np.linalg.eigh(A)
        expect = (Q_d * np.exp(lam_d)) @ (Q_d.T @ v)
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-9,
                                   atol=1e-9)


class TestLstsq:
    def test_cgls_overdetermined(self, rng):
        m, n = 60, 25
        A = rng.standard_normal((m, n))
        b = rng.standard_normal(m)
        Aj = jnp.asarray(A)
        x, g2 = cgls_solve(lambda v: Aj @ v, lambda u: Aj.T @ u,
                           jnp.asarray(b), iters=n + 10)
        expect, *_ = np.linalg.lstsq(A, b, rcond=None)
        np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-8,
                                   atol=1e-10)
        assert float(g2) < 1e-16

    def test_lsqr_matches_cgls_and_oracle(self, rng):
        m, n = 50, 20
        A = rng.standard_normal((m, n))
        b = rng.standard_normal(m)
        Aj = jnp.asarray(A)
        x, r2 = lsqr_solve(lambda v: Aj @ v, lambda u: Aj.T @ u,
                           jnp.asarray(b), iters=n + 10)
        expect, res, *_ = np.linalg.lstsq(A, b, rcond=None)
        np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-8,
                                   atol=1e-10)
        # rnorm estimate matches the true residual.
        np.testing.assert_allclose(float(r2),
                                   float(np.sum((A @ expect - b) ** 2)),
                                   rtol=1e-6)

    @pytest.mark.parametrize("solver", [cgls_solve, lsqr_solve])
    def test_damped(self, rng, solver):
        m, n, damp = 40, 15, 0.7
        A = rng.standard_normal((m, n))
        b = rng.standard_normal(m)
        Aj = jnp.asarray(A)
        x, _ = solver(lambda v: Aj @ v, lambda u: Aj.T @ u,
                      jnp.asarray(b), iters=n + 15, damp=damp)
        expect = np.linalg.solve(A.T @ A + damp**2 * np.eye(n), A.T @ b)
        np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-8,
                                   atol=1e-10)

    def test_sparse_operator_jit(self, rng):
        m, n = 48, 20
        d = np.zeros((m, n))
        for i in range(m):
            d[i, int(i * n / m)] = 1.0 + 0.05 * i
            d[i, rng.integers(n)] += 0.3
        csr, csrT = to_csr(to_coo(d)), to_csr(to_coo(d.T))
        b = jnp.asarray(rng.standard_normal(m))
        f = jax.jit(lambda bb: lsqr_solve(lambda v: spmv(csr, v),
                                          lambda u: spmv(csrT, u), bb,
                                          iters=n + 10))
        x, _ = f(b)
        expect, *_ = np.linalg.lstsq(d, np.asarray(b), rcond=None)
        np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-7,
                                   atol=1e-9)

    def test_underdetermined_cgls(self, rng):
        # m < n: CGLS from x0=0 converges to the minimum-norm solution.
        m, n = 15, 30
        A = rng.standard_normal((m, n))
        b = rng.standard_normal(m)
        Aj = jnp.asarray(A)
        x, _ = cgls_solve(lambda v: Aj @ v, lambda u: Aj.T @ u,
                          jnp.asarray(b), iters=m + 10)
        expect = np.linalg.pinv(A) @ b
        np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-8,
                                   atol=1e-10)


class TestMinres:
    def test_symmetric_indefinite(self, rng):
        n = 40
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        lam = np.concatenate([np.linspace(-8, -1, n // 2),
                              np.linspace(1, 8, n - n // 2)])
        A = (Q * lam) @ Q.T
        b = rng.standard_normal(n)
        x, r2 = minres_solve(lambda v: jnp.asarray(A) @ v,
                             jnp.asarray(b), iters=n + 10)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                                   rtol=1e-7, atol=1e-9)
        true_r2 = float(np.sum((b - A @ np.asarray(x)) ** 2))
        assert abs(float(r2) - true_r2) < 1e-10

    def test_spd_agrees_with_cg_and_x0(self, rng):
        from spsparse_tpu.solvers import cg_solve
        n = 30
        A, _, _ = spd_dense(rng, n)
        b = jnp.asarray(rng.standard_normal(n))
        x0 = jnp.asarray(rng.standard_normal(n))
        mv = lambda v: jnp.asarray(A) @ v
        xm, _ = minres_solve(mv, b, iters=n + 10, x0=x0)
        xc, _ = cg_solve(mv, b, iters=n + 10)
        np.testing.assert_allclose(np.asarray(xm), np.asarray(xc),
                                   rtol=1e-8, atol=1e-10)

    def test_sparse_jit_exact_b_in_range(self, rng):
        n = 32
        # Singular PSD (rank-deficient) with b in the range: MINRES finds
        # a solution; breakdown masking must freeze, not NaN.
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        lam = np.concatenate([np.zeros(4), np.linspace(1, 5, n - 4)])
        A = (Q * lam) @ Q.T
        xs = Q[:, 4:] @ rng.standard_normal(n - 4)
        b = A @ xs
        csr = to_csr(to_coo(A))
        x, r2 = jax.jit(lambda bb: minres_solve(
            lambda v: spmv(csr, v), bb, iters=n + 20))(jnp.asarray(b))
        assert np.all(np.isfinite(np.asarray(x)))
        np.testing.assert_allclose(A @ np.asarray(x), b, atol=1e-8)


class TestLsmr:
    def test_matches_lstsq_and_damped(self, rng):
        from spsparse_tpu.solvers import lsmr_solve
        m, n = 50, 20
        A = rng.standard_normal((m, n))
        b = rng.standard_normal(m)
        Aj = jnp.asarray(A)
        x, g2 = lsmr_solve(lambda v: Aj @ v, lambda u: Aj.T @ u,
                           jnp.asarray(b), iters=n + 15)
        expect, *_ = np.linalg.lstsq(A, b, rcond=None)
        np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-8,
                                   atol=1e-10)
        damp = 0.8
        xd, _ = lsmr_solve(lambda v: Aj @ v, lambda u: Aj.T @ u,
                           jnp.asarray(b), iters=n + 15, damp=damp)
        ed = np.linalg.solve(A.T @ A + damp**2 * np.eye(n), A.T @ b)
        np.testing.assert_allclose(np.asarray(xd), ed, rtol=1e-8,
                                   atol=1e-10)

    def test_truncated_beats_lsqr_on_normal_residual(self, rng):
        # LSMR's defining property: at equal (truncated) iteration count
        # its normal-equation residual ||A^T r|| is no worse than LSQR's.
        from spsparse_tpu.solvers import lsmr_solve, lsqr_solve
        m, n, iters = 80, 40, 12
        A = rng.standard_normal((m, n)) @ np.diag(
            np.logspace(0, -3, n))                # ill-conditioned
        b = rng.standard_normal(m)
        Aj = jnp.asarray(A)
        xm, _ = lsmr_solve(lambda v: Aj @ v, lambda u: Aj.T @ u,
                           jnp.asarray(b), iters=iters)
        xq, _ = lsqr_solve(lambda v: Aj @ v, lambda u: Aj.T @ u,
                           jnp.asarray(b), iters=iters)
        gm = np.linalg.norm(A.T @ (b - A @ np.asarray(xm)))
        gq = np.linalg.norm(A.T @ (b - A @ np.asarray(xq)))
        assert gm <= gq * 1.01, (gm, gq)

    def test_sparse_jit(self, rng):
        from spsparse_tpu.solvers import lsmr_solve
        m, n = 36, 18
        d = np.zeros((m, n))
        for i in range(m):
            d[i, int(i * n / m)] = 1.0 + 0.1 * i
        csr, csrT = to_csr(to_coo(d)), to_csr(to_coo(d.T))
        b = jnp.asarray(rng.standard_normal(m))
        x, _ = jax.jit(lambda bb: lsmr_solve(
            lambda v: spmv(csr, v), lambda u: spmv(csrT, u), bb,
            iters=n + 10))(b)
        expect, *_ = np.linalg.lstsq(d, np.asarray(b), rcond=None)
        np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-8,
                                   atol=1e-9)


class TestArnoldiEigs:
    """arnoldi_eigs (scipy.sparse.linalg.eigs capability; explicit
    restarts — solvers/spectral.py docstring)."""

    @staticmethod
    def _conj_close(got, ref, atol):
        """Multiset match up to per-element conjugation (a real
        operator's complex pairs: k may split a conjugate pair and
        either member is a correct answer)."""
        ref = list(ref)
        for g in got:
            d = [min(abs(g - r), abs(np.conj(g) - r)) for r in ref]
            i = int(np.argmin(d))
            if d[i] > atol:
                return False
            ref.pop(i)
        return True

    @pytest.mark.parametrize("which", ["LM", "LR", "SR"])
    def test_vs_scipy(self, which):
        import scipy.sparse as ssp
        import scipy.sparse.linalg as sla
        from spsparse_tpu.core.structure import to_csr
        from spsparse_tpu.ops.spmm import spmv
        from spsparse_tpu.solvers import arnoldi_eigs
        rng = np.random.default_rng(3)
        n = 80
        A = (rng.random((n, n)) < 0.1) * rng.standard_normal((n, n))
        csr = to_csr(SparseCOO.from_dense(A))
        mv = lambda x: spmv(csr, x)
        vals, vecs = arnoldi_eigs(mv, jnp.asarray(rng.standard_normal(n)),
                                  k=4, which=which, iters=48, restarts=12,
                                  tol=1e-12)
        ref = sla.eigs(ssp.csr_matrix(A), k=4, which=which,
                       return_eigenvectors=False, maxiter=5000)
        assert self._conj_close(vals, ref, 1e-7)
        R = A @ vecs - vecs * vals[None, :]
        assert np.abs(R).max() < 1e-7

    def test_symmetric_agrees_with_eigsh(self):
        from spsparse_tpu.core.structure import to_csr
        from spsparse_tpu.ops.spmm import spmv
        from spsparse_tpu.solvers import arnoldi_eigs, lanczos_eigsh
        rng = np.random.default_rng(5)
        n = 60
        M = rng.standard_normal((n, n))
        A = (M + M.T) / 2
        csr = to_csr(SparseCOO.from_dense(A))
        mv = lambda x: spmv(csr, x)
        v0 = jnp.asarray(rng.standard_normal(n))
        vals, _ = arnoldi_eigs(mv, v0, k=3, which="LR", iters=48,
                               restarts=12, tol=1e-12)
        ref, _ = lanczos_eigsh(mv, v0, k=3, which="LA", iters=48)
        np.testing.assert_allclose(np.sort(vals.real), np.sort(ref),
                                   atol=1e-7)
        assert np.abs(vals.imag).max() < 1e-9

    def test_bad_which(self):
        from spsparse_tpu.solvers import arnoldi_eigs
        with pytest.raises(ValueError, match="which"):
            arnoldi_eigs(lambda x: x, jnp.ones(8), k=2, which="XX")

    @pytest.mark.parametrize("which,d", [
        ("LR", [-1.0, -2.0]),           # all live Ritz have negative real
        ("LI", [-1.0, -2.0]),           # ... and zero imaginary part
        ("LM", [-0.5, -0.25]),          # all live Ritz have |.| < 1
    ])
    def test_breakdown_dead_pairs_not_selected(self, which, d):
        # v0 spans a 2-dim invariant subspace -> Arnoldi breaks down and
        # the Hessenberg eigenproblem grows spurious zero ("dead") Ritz
        # pairs; the dead sentinel must rank them behind every genuine
        # eigenvalue for EVERY `which` key (a 0 sentinel outranks
        # negative-real/imag or sub-unit-|.| eigenvalues)
        from spsparse_tpu.solvers import arnoldi_eigs
        n = 16
        diag = np.zeros(n)
        diag[:2] = d
        mv = lambda x: jnp.asarray(diag) * x
        v0 = jnp.asarray(np.array([1.0, 0.7] + [0.0] * (n - 2)))
        vals, vecs = arnoldi_eigs(mv, v0, k=2, which=which, iters=8,
                                  restarts=1, tol=1e-10)
        np.testing.assert_allclose(np.sort(vals.real), np.sort(d),
                                   atol=1e-9)
        assert np.abs(vals.imag).max() < 1e-9


class TestEigsApi:
    """scipy-signature eigs/eigsh wrappers incl. shift-invert
    (solvers.eigs_api; inner solve = native LU)."""

    def _sym(self, n=100, seed=0):
        rng = np.random.default_rng(seed)
        M = rng.standard_normal((n, n))
        return (M + M.T) / 2

    def test_eigsh_shift_invert_vs_scipy(self):
        import scipy.sparse as ssp
        import scipy.sparse.linalg as sla
        from spsparse_tpu.solvers import eigsh
        A = self._sym()
        lam = np.linalg.eigvalsh(A)
        sigma = float(lam[50] + 0.01)
        As = SparseCOO.from_dense(A)
        vals, vecs = eigsh(As, k=4, sigma=sigma)
        ref = sla.eigsh(ssp.csc_matrix(A), k=4, sigma=sigma,
                        return_eigenvectors=False)
        np.testing.assert_allclose(np.sort(np.asarray(vals)),
                                   np.sort(ref), atol=1e-7)
        R = A @ np.asarray(vecs) - np.asarray(vecs) * np.asarray(vals)
        assert np.abs(R).max() < 1e-6

    def test_eigsh_lm_both_ends(self):
        import scipy.sparse as ssp
        import scipy.sparse.linalg as sla
        from spsparse_tpu.solvers import eigsh
        A = self._sym(seed=3)
        As = SparseCOO.from_dense(A)
        vals = np.asarray(eigsh(As, k=3, which="LM",
                                return_eigenvectors=False))
        ref = sla.eigsh(ssp.csc_matrix(A), k=3, which="LM",
                        return_eigenvectors=False)
        np.testing.assert_allclose(np.sort(vals), np.sort(ref),
                                   atol=1e-7)

    def test_eigsh_sm_refused_without_sigma(self):
        from spsparse_tpu.core.errors import SpSparseError
        from spsparse_tpu.solvers import eigsh
        with pytest.raises(SpSparseError, match="sigma"):
            eigsh(SparseCOO.from_dense(self._sym(n=10)), k=2, which="SM")

    def test_eigs_shift_invert_vs_scipy(self):
        import scipy.sparse as ssp
        import scipy.sparse.linalg as sla
        from spsparse_tpu.solvers import eigs
        rng = np.random.default_rng(0)
        n = 100
        B = (rng.random((n, n)) < 0.15) * rng.standard_normal((n, n))
        vals, vecs = eigs(SparseCOO.from_dense(B), k=4, sigma=0.3)
        ref = sla.eigs(ssp.csc_matrix(B), k=4, sigma=0.3,
                       return_eigenvectors=False)
        got = list(np.asarray(vals))
        refl = list(ref)
        for g in got:
            d = [min(abs(g - r), abs(np.conj(g) - r)) for r in refl]
            i = int(np.argmin(d))
            assert d[i] < 1e-6
            refl.pop(i)
        R = B @ np.asarray(vecs) - np.asarray(vecs) * np.asarray(vals)
        assert np.abs(R).max() < 1e-6

    def test_linear_operator_input(self):
        from spsparse_tpu.solvers import aslinearoperator, eigsh
        A = self._sym(n=60, seed=5)
        lam = np.linalg.eigvalsh(A)
        op = aslinearoperator(SparseCOO.from_dense(A))
        vals = np.asarray(eigsh(op, k=2, which="LA",
                                return_eigenvectors=False))
        np.testing.assert_allclose(np.sort(vals), lam[-2:], atol=1e-7)
