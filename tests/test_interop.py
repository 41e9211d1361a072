"""BCOO / scipy interop tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.interop import from_bcoo, from_scipy, to_bcoo, to_scipy


def random_coo(rng, shape, nnz):
    b = CooBuilder(shape, dtype=np.float64)
    idx = np.stack([rng.integers(0, s, size=nnz) for s in shape], axis=1)
    b.add_many(idx, rng.uniform(-1, 1, size=nnz))
    return b.build()


def test_bcoo_round_trip(rng):
    A = random_coo(rng, (9, 7), 20)
    m = to_bcoo(A)
    assert m.shape == (9, 7)
    np.testing.assert_allclose(np.asarray(m.todense()),
                               np.asarray(A.to_dense()), rtol=1e-12)
    back = from_bcoo(m)
    np.testing.assert_allclose(np.asarray(back.to_dense()),
                               np.asarray(A.to_dense()), rtol=1e-12)


def test_bcoo_matmul_agrees(rng):
    A = random_coo(rng, (6, 5), 14)
    x = jnp.asarray(rng.uniform(-1, 1, 5))
    y1 = to_bcoo(A) @ x
    np.testing.assert_allclose(np.asarray(y1),
                               np.asarray(A.to_dense()) @ np.asarray(x),
                               rtol=1e-10)


def test_from_bcoo_rejects_batched(rng):
    from jax.experimental import sparse as jsparse
    from spsparse_tpu import SpSparseError
    dense = jnp.asarray(rng.uniform(size=(2, 4, 4)))
    m = jsparse.BCOO.fromdense(dense, n_batch=1)
    with pytest.raises(SpSparseError):
        from_bcoo(m)


def test_scipy_round_trip(rng):
    import scipy.sparse as ss
    M = ss.random(12, 9, density=0.2, random_state=0, format="csr")
    A = from_scipy(M)
    np.testing.assert_allclose(np.asarray(A.to_dense()), M.toarray(),
                               rtol=1e-12)
    back = to_scipy(A)
    np.testing.assert_allclose(back.toarray(), M.toarray(), rtol=1e-12)
