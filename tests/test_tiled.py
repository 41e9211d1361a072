"""Tiled one-hot COO format tests (general-matrix MXU path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.tiled import to_tiled
from spsparse_tpu.ops.tiled_ops import spmv_tiled, spmm_tiled
from spsparse_tpu import SpSparseError


def random_coo(rng, shape, nnz):
    b = CooBuilder(shape, dtype=np.float32)
    idx = np.stack([rng.integers(0, s, size=nnz) for s in shape], axis=1)
    b.add_many(idx, rng.uniform(-1, 1, size=nnz).astype(np.float32))
    return b.build()


class TestTiledFormat:
    def test_round_trip(self, rng):
        A = random_coo(rng, (300, 450), 2000)
        tl = to_tiled(A)
        np.testing.assert_allclose(np.asarray(tl.to_dense()),
                                   np.asarray(A.to_dense()), rtol=1e-6)

    def test_duplicates_sum(self):
        b = CooBuilder((10, 10), dtype=np.float32)
        b.add((3, 4), 1.0)
        b.add((3, 4), 2.0)
        tl = to_tiled(b.build())
        assert np.asarray(tl.to_dense())[3, 4] == pytest.approx(3.0)

    def test_spmv_matches_dense(self, rng):
        A = random_coo(rng, (520, 260), 4000)
        tl = to_tiled(A)
        x = rng.uniform(-1, 1, 260).astype(np.float32)
        y = spmv_tiled(tl, x)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(A.to_dense()) @ x,
                                   rtol=2e-4, atol=2e-4)

    def test_spmm_matches_dense(self, rng):
        A = random_coo(rng, (260, 520), 4000)
        tl = to_tiled(A)
        X = rng.uniform(-1, 1, (520, 16)).astype(np.float32)
        Y = spmm_tiled(tl, X)
        np.testing.assert_allclose(np.asarray(Y),
                                   np.asarray(A.to_dense()) @ X,
                                   rtol=2e-4, atol=2e-4)

    def test_under_jit(self, rng):
        A = random_coo(rng, (200, 200), 1500)
        tl = to_tiled(A)
        x = jnp.asarray(rng.uniform(-1, 1, 200).astype(np.float32))
        y = jax.jit(spmv_tiled)(tl, x)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(A.to_dense()) @ np.asarray(x),
                                   rtol=2e-4, atol=2e-4)

    def test_dim_mismatch(self, rng):
        A = random_coo(rng, (100, 100), 50)
        tl = to_tiled(A)
        with pytest.raises(SpSparseError):
            spmv_tiled(tl, np.ones(99, np.float32))

    def test_cap_overflow_raises(self, rng):
        A = random_coo(rng, (100, 100), 500)
        with pytest.raises(SpSparseError):
            to_tiled(A, tile_cap=1)
