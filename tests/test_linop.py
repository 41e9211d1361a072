"""LinearOperator algebra over the format zoo, composed into solvers.

No reference counterpart; oracles are dense numpy products.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder, to_csr
from spsparse_tpu.core.bsr import to_bsr
from spsparse_tpu.core.dia import to_dia
from spsparse_tpu.solvers import (LinearOperator, aslinearoperator,
                                  cg_solve, identity_operator,
                                  lanczos_eigsh, lsqr_solve)


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def to_coo(A):
    ii, jj = np.nonzero(A)
    b = CooBuilder(A.shape, dtype=np.float64)
    b.add_many(np.stack([ii, jj], 1), A[ii, jj])
    return b.build()


class TestLinOp:
    def test_formats_match_dense(self, rng):
        A = rng.standard_normal((12, 8))
        A[np.abs(A) < 0.8] = 0
        coo = to_coo(A)
        x = rng.standard_normal(8)
        u = rng.standard_normal(12)
        X = rng.standard_normal((8, 3))
        for wrap in (coo, to_csr(coo), jnp.asarray(A)):
            op = aslinearoperator(wrap)
            np.testing.assert_allclose(np.asarray(op @ jnp.asarray(x)),
                                       A @ x, rtol=1e-12, atol=1e-12)
            np.testing.assert_allclose(np.asarray(op.matmat(
                jnp.asarray(X))), A @ X, rtol=1e-12, atol=1e-12)
        # rmatvec where supported (COO/dense).
        for wrap in (coo, jnp.asarray(A)):
            op = aslinearoperator(wrap)
            np.testing.assert_allclose(np.asarray(op.rmatvec(
                jnp.asarray(u))), A.T @ u, rtol=1e-12, atol=1e-12)

    def test_dia_and_bsr(self, rng):
        n = 32
        A = np.zeros((n, n))
        v = rng.uniform(0.5, 1.5, n - 1)
        A[np.arange(n - 1), np.arange(1, n)] = v
        A[np.arange(n), np.arange(n)] = 2.0
        coo = to_coo(A)
        x = rng.standard_normal(n)
        for wrap in (to_dia(coo), to_bsr(coo, (8, 8))):
            op = aslinearoperator(wrap)
            np.testing.assert_allclose(np.asarray(op @ jnp.asarray(x)),
                                       A @ x, rtol=1e-10, atol=1e-10)

    def test_algebra_composition(self, rng):
        A = rng.standard_normal((10, 7))
        B = rng.standard_normal((7, 5))
        oa, ob = aslinearoperator(jnp.asarray(A)), aslinearoperator(
            jnp.asarray(B))
        x = rng.standard_normal(5)
        comp = oa @ ob
        assert comp.shape == (10, 5)
        np.testing.assert_allclose(np.asarray(comp @ jnp.asarray(x)),
                                   A @ B @ x, rtol=1e-12)
        u = rng.standard_normal(10)
        np.testing.assert_allclose(np.asarray(comp.T @ jnp.asarray(u)),
                                   (A @ B).T @ u, rtol=1e-12)
        # Sum/scale/negate.
        C = rng.standard_normal((7, 5))
        oc = aslinearoperator(jnp.asarray(C))
        s = 2.0 * ob - oc
        np.testing.assert_allclose(np.asarray(s @ jnp.asarray(x)),
                                   (2 * B - C) @ x, rtol=1e-12)

    def test_normal_equations_solve(self, rng):
        # R.T @ R + damp^2 I as operator algebra -> cg_solve directly.
        m, n, damp = 30, 12, 0.5
        A = rng.standard_normal((m, n))
        coo = to_coo(np.where(np.abs(A) > 0.3, A, 0))
        Ad = np.asarray(coo.to_dense())
        R = aslinearoperator(coo)
        N = R.T @ R + (damp ** 2) * identity_operator(n)
        b = rng.standard_normal(n)
        x, _ = cg_solve(N, jnp.asarray(b), iters=n + 20)
        expect = np.linalg.solve(Ad.T @ Ad + damp**2 * np.eye(n), b)
        np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-8,
                                   atol=1e-10)
        # And the pair solvers take (matvec, rmatvec) from the operator.
        b2 = rng.standard_normal(m)
        xl, _ = lsqr_solve(R.matvec, R.rmatvec, jnp.asarray(b2),
                           iters=n + 20, damp=damp)
        np.testing.assert_allclose(
            np.asarray(xl),
            np.linalg.solve(Ad.T @ Ad + damp**2 * np.eye(n), Ad.T @ b2),
            rtol=1e-8, atol=1e-10)

    def test_eigsh_takes_operator_and_jit(self, rng):
        n = 24
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        lam = np.linspace(1, 9, n)
        A = (Q * lam) @ Q.T
        op = aslinearoperator(to_coo(A))
        vals, _ = lanczos_eigsh(op, jnp.asarray(rng.standard_normal(n)),
                                k=2, iters=n, which="LA")
        np.testing.assert_allclose(np.asarray(vals), lam[-2:], rtol=1e-9)
        # operators trace cleanly under jit
        f = jax.jit(lambda x: (op.T @ op) @ x)
        np.testing.assert_allclose(np.asarray(f(jnp.asarray(np.ones(n)))),
                                   A.T @ A @ np.ones(n), rtol=1e-9)

    def test_validation(self, rng):
        from spsparse_tpu import SpSparseError
        op = aslinearoperator(jnp.ones((3, 4)))
        csr_op = aslinearoperator(to_csr(to_coo(np.eye(3))))
        with pytest.raises(SpSparseError):
            csr_op.rmatvec(jnp.ones(3))
        with pytest.raises(SpSparseError):
            op @ aslinearoperator(jnp.ones((3, 4)))   # shape chain
        with pytest.raises(SpSparseError):
            op + aslinearoperator(jnp.ones((4, 3)))
        with pytest.raises(SpSparseError):
            aslinearoperator(jnp.ones(5))

    def test_ell_matmat_and_star_guard(self, rng):
        # Review regressions: ELL matmat must run (not return None), and
        # opA * opB must raise (typo for @), and .T must keep the block
        # kernel / round-trip.
        from spsparse_tpu import SpSparseError, to_ell
        A = rng.standard_normal((9, 6))
        A[np.abs(A) < 0.6] = 0
        coo = to_coo(A)
        X = rng.standard_normal((6, 4))
        op_ell = aslinearoperator(to_ell(to_csr(coo)))
        np.testing.assert_allclose(np.asarray(op_ell.matmat(
            jnp.asarray(X))), A @ X, rtol=1e-12, atol=1e-12)
        op = aslinearoperator(coo)
        with pytest.raises(SpSparseError):
            op * op
        # .T keeps a real matmat (rmatmat wired) and .T.T == original.
        U = rng.standard_normal((9, 3))
        np.testing.assert_allclose(np.asarray(op.T.matmat(
            jnp.asarray(U))), A.T @ U, rtol=1e-12, atol=1e-12)
        tt = op.T.T
        np.testing.assert_allclose(np.asarray(tt.matmat(
            jnp.asarray(X))), A @ X, rtol=1e-12, atol=1e-12)
        assert tt._mm is op._mm and tt._rmm is op._rmm
