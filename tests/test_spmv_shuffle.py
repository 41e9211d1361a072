"""Unstructured shuffle SpMV (ops.spmv_shuffle) vs dense oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.ops.spmv_shuffle import (prepare_shuffle_spmv,
                                           spmv_shuffle)


def _random(rng, nrows, ncols, nnz_per_row):
    n = nrows * nnz_per_row
    idx = np.stack([rng.integers(0, nrows, n),
                    rng.integers(0, ncols, n)], 1)
    b = CooBuilder((nrows, ncols), dtype=np.float32)
    b.add_many(idx, rng.uniform(-1, 1, n).astype(np.float32))
    return b.build()


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("shape,k", [((300, 400), 6), ((700, 260), 3),
                                     ((64, 2000), 10)])
def test_matches_dense(seed, shape, k):
    rng = np.random.default_rng(seed)
    A = _random(rng, shape[0], shape[1], k)
    prep = prepare_shuffle_spmv(A)
    x = jnp.asarray(rng.uniform(-1, 1, shape[1]).astype(np.float32))
    y = spmv_shuffle(prep, x, interpret=True)
    want = np.asarray(A.to_dense()) @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-5, atol=2e-5)


def test_heavy_rows_split():
    # one row far above ell_k forces multiple virtual rows + the
    # scatter-add merge of their partial sums
    rng = np.random.default_rng(7)
    nrows, ncols = 50, 300
    b = CooBuilder((nrows, ncols), dtype=np.float32)
    cols = rng.permutation(ncols)[:90]
    b.add_many(np.stack([np.full(90, 7), cols], 1),
               rng.uniform(-1, 1, 90).astype(np.float32))
    b.add_many(np.stack([rng.integers(0, nrows, 100),
                         rng.integers(0, ncols, 100)], 1),
               rng.uniform(-1, 1, 100).astype(np.float32))
    A = b.build()
    prep = prepare_shuffle_spmv(A, ell_k=8)
    assert prep.extra_rows.shape[0] >= 90 // 8 - 1
    x = jnp.asarray(rng.uniform(-1, 1, ncols).astype(np.float32))
    y = spmv_shuffle(prep, x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(A.to_dense()) @ np.asarray(x),
        rtol=2e-5, atol=2e-5)


def test_duplicates_consolidated_and_empty_rows():
    rng = np.random.default_rng(1)
    b = CooBuilder((40, 130), dtype=np.float32)
    b.add((3, 7), 2.0)
    b.add((3, 7), 5.0)                       # duplicate -> summed
    b.add((39, 129), -1.0)
    A = b.build()
    prep = prepare_shuffle_spmv(A)
    x = jnp.asarray(rng.uniform(-1, 1, 130).astype(np.float32))
    y = spmv_shuffle(prep, x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(A.to_dense()) @ np.asarray(x),
        rtol=1e-5, atol=1e-6)


def test_jit_geometry_reuse():
    rng = np.random.default_rng(2)
    A = _random(rng, 200, 500, 5)
    prep = prepare_shuffle_spmv(A)
    f = jax.jit(lambda p, v: spmv_shuffle(p, v, interpret=True))
    for s in range(2):
        x = jnp.asarray(rng.uniform(-1, 1, 500).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(f(prep, x)),
            np.asarray(A.to_dense()) @ np.asarray(x),
            rtol=2e-5, atol=2e-5)
