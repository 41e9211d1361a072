"""Dense-operand SpMV/SpMM tests (capability the reference disabled in
/root/reference/slib/spsparse/multiply_dense.hpp — first-class here)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder, to_csr, to_ell
from spsparse_tpu.ops.spmm import spmv, spmm
from spsparse_tpu import SpSparseError


def random_coo(rng, shape, nnz):
    b = CooBuilder(shape, dtype=np.float64)
    idx = np.stack([rng.integers(0, s, size=nnz) for s in shape], axis=1)
    b.add_many(idx, rng.uniform(-1, 1, size=nnz))
    return b.build()


class TestSpmv:
    def test_coo_csr_ell_agree(self, rng):
        A = random_coo(rng, (7, 9), 20)
        x = rng.uniform(-1, 1, 9)
        expect = np.asarray(A.to_dense()) @ x
        np.testing.assert_allclose(np.asarray(spmv(A, x)), expect, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(spmv(to_csr(A), x)), expect,
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(spmv(to_ell(A), x)), expect,
                                   rtol=1e-12)

    def test_transpose(self, rng):
        A = random_coo(rng, (7, 9), 20)
        x = rng.uniform(-1, 1, 7)
        expect = np.asarray(A.to_dense()).T @ x
        np.testing.assert_allclose(np.asarray(spmv(A, x, transpose=True)),
                                   expect, rtol=1e-12)

    def test_filter_nan(self, rng):
        A = random_coo(rng, (4, 4), 8)
        x = np.array([1.0, np.nan, np.inf, 2.0])
        y = np.asarray(spmv(A, x, filter_nan=True))
        xc = np.array([1.0, 0.0, 0.0, 2.0])
        np.testing.assert_allclose(y, np.asarray(A.to_dense()) @ xc,
                                   rtol=1e-12)

    def test_dim_mismatch(self, rng):
        A = random_coo(rng, (4, 5), 6)
        with pytest.raises(SpSparseError):
            spmv(A, np.ones(4))

    def test_jit(self, rng):
        A = random_coo(rng, (7, 9), 20)
        x = rng.uniform(-1, 1, 9)
        y = jax.jit(lambda a, v: spmv(a, v))(to_csr(A), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(A.to_dense()) @ x, rtol=1e-12)


class TestSpmm:
    def test_csr_ell_agree(self, rng):
        A = random_coo(rng, (7, 9), 25)
        X = rng.uniform(-1, 1, (9, 5))
        expect = np.asarray(A.to_dense()) @ X
        np.testing.assert_allclose(np.asarray(spmm(A, X)), expect, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(spmm(to_ell(A), X)), expect,
                                   rtol=1e-12)

    def test_transpose(self, rng):
        A = random_coo(rng, (7, 9), 25)
        X = rng.uniform(-1, 1, (7, 3))
        expect = np.asarray(A.to_dense()).T @ X
        np.testing.assert_allclose(np.asarray(spmm(A, X, transpose=True)),
                                   expect, rtol=1e-12)

    def test_mixed_precision_accum(self, rng):
        A = random_coo(rng, (16, 16), 40)
        X = rng.uniform(-1, 1, (16, 8)).astype(np.float32)
        csr = to_csr(A)
        import dataclasses
        csr16 = dataclasses.replace(csr, vals=csr.vals.astype(jnp.bfloat16))
        y = spmm(csr16, jnp.asarray(X).astype(jnp.bfloat16),
                 accum_dtype=jnp.float32)
        assert y.dtype == jnp.float32
        expect = np.asarray(A.to_dense()) @ X.astype(np.float64)
        np.testing.assert_allclose(np.asarray(y), expect, rtol=3e-2, atol=3e-2)
