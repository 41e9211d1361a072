"""Constructors and structural conveniences (core.construct) vs scipy /
dense oracles."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax
import jax.numpy as jnp

from spsparse_tpu import (CooBuilder, SpSparseError, coo_diags, coo_eye,
                          coo_random, coo_slice, col_sums, row_sums,
                          scale_cols, scale_rows)


def random_coo(rng, shape, nnz, dtype=np.float64):
    b = CooBuilder(shape, dtype=dtype)
    idx = np.stack([rng.integers(0, s, size=nnz) for s in shape], axis=1)
    b.add_many(idx, rng.uniform(-1, 1, size=nnz))
    return b.build()


class TestConstructors:
    @pytest.mark.parametrize("n,m,k", [(5, None, 0), (5, 8, 2), (6, 4, -3)])
    def test_eye_matches_scipy(self, n, m, k):
        got = np.asarray(coo_eye(n, m, k).to_dense())
        expect = sps.eye(n, m, k=k).toarray()
        np.testing.assert_array_equal(got, expect)

    def test_eye_fully_out_of_band_is_empty(self):
        # scipy raises here; an empty matrix is the graceful answer.
        A = coo_eye(3, 3, 5)
        assert int(A.nnz) == 0
        np.testing.assert_array_equal(np.asarray(A.to_dense()),
                                      np.zeros((3, 3)))

    def test_diags_matches_scipy(self, rng):
        shape = (7, 9)
        offs = [-2, 0, 3]
        diags = [rng.uniform(-1, 1, min(7, 9 - o) - max(0, -o))
                 for o in offs]
        got = np.asarray(coo_diags(diags, offs, shape,
                                   dtype=np.float64).to_dense())
        expect = np.zeros(shape)
        for v, o in zip(diags, offs):
            lo = max(0, -o)
            r = np.arange(lo, lo + len(v))
            expect[r, r + o] = v
        np.testing.assert_allclose(got, expect, rtol=1e-12)

    def test_diags_scalar_broadcast(self):
        got = np.asarray(coo_diags([2.0, -1.0], [0, 1], (4, 4),
                                   dtype=np.float64).to_dense())
        expect = 2 * np.eye(4) + np.diag([-1.0] * 3, 1)
        np.testing.assert_array_equal(got, expect)

    def test_random_density_and_consolidated(self):
        A = coo_random((50, 40), 0.05, seed=3)
        d = np.asarray(A.to_dense())
        realized = (d != 0).sum() / d.size
        assert 0.03 <= realized <= 0.05
        assert A.sort_order == (0, 1)


class TestSlice:
    def test_matches_dense_slice(self, rng):
        A = random_coo(rng, (12, 15), 60)
        S = coo_slice(A, (3, 5), (10, 14))
        assert S.shape == (7, 9)
        np.testing.assert_allclose(np.asarray(S.to_dense()),
                                   np.asarray(A.to_dense())[3:10, 5:14],
                                   rtol=1e-12)

    def test_rank3_and_jit(self, rng):
        A = random_coo(rng, (6, 7, 8), 80)
        S = jax.jit(lambda a: coo_slice(a, (1, 0, 2), (5, 7, 8)))(A)
        np.testing.assert_allclose(
            np.asarray(S.to_dense()),
            np.asarray(A.to_dense())[1:5, :, 2:], rtol=1e-12)

    def test_stops_clamped_and_bad_bounds(self, rng):
        A = random_coo(rng, (5, 5), 10)
        S = coo_slice(A, (0, 0), (99, 99))
        np.testing.assert_allclose(np.asarray(S.to_dense()),
                                   np.asarray(A.to_dense()), rtol=1e-12)
        with pytest.raises(SpSparseError):
            coo_slice(A, (3,), (4,))
        with pytest.raises(SpSparseError):
            coo_slice(A, (4, 0), (2, 5))


class TestReductionsAndScaling:
    def test_row_col_sums(self, rng):
        A = random_coo(rng, (9, 11), 50)
        d = np.asarray(A.to_dense())
        np.testing.assert_allclose(np.asarray(row_sums(A)), d.sum(1),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(col_sums(A)), d.sum(0),
                                   rtol=1e-12)

    def test_scale_rows_cols_match_dense(self, rng):
        A = random_coo(rng, (8, 10), 40)
        sr = rng.uniform(-2, 2, 8)
        sc = rng.uniform(-2, 2, 10)
        d = np.asarray(A.to_dense())
        np.testing.assert_allclose(
            np.asarray(scale_rows(A, jnp.asarray(sr)).to_dense()),
            np.diag(sr) @ d, rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(scale_cols(A, jnp.asarray(sc)).to_dense()),
            d @ np.diag(sc), rtol=1e-12)

    def test_scale_jittable_preserves_sort(self, rng):
        A = random_coo(rng, (6, 6), 20).consolidate((0, 1))
        S = jax.jit(scale_rows)(A, jnp.arange(6, dtype=A.dtype))
        assert S.sort_order == (0, 1)
        d = np.asarray(A.to_dense())
        np.testing.assert_allclose(np.asarray(S.to_dense()),
                                   np.diag(np.arange(6.0)) @ d, rtol=1e-12)


class TestKron:
    def test_matches_scipy(self, rng):
        from spsparse_tpu import coo_kron
        A = random_coo(rng, (4, 5), 8)
        B = random_coo(rng, (3, 2), 4)
        got = np.asarray(coo_kron(A, B).to_dense())
        expect = sps.kron(sps.coo_matrix(np.asarray(A.to_dense())),
                          sps.coo_matrix(np.asarray(B.to_dense()))).toarray()
        np.testing.assert_allclose(got, expect, rtol=1e-12)

    def test_laplacian_2d_assembly(self):
        # The canonical use: L2 = L1 (x) I + I (x) L1.
        from spsparse_tpu import coo_add, coo_eye, coo_kron
        n = 6
        L1 = coo_diags([-1.0, 2.0, -1.0], [-1, 0, 1], (n, n),
                       dtype=np.float64)
        I = coo_eye(n, dtype=np.float64)
        L2 = coo_add(coo_kron(L1, I), coo_kron(I, L1))
        d1 = np.asarray(L1.to_dense())
        expect = np.kron(d1, np.eye(n)) + np.kron(np.eye(n), d1)
        np.testing.assert_allclose(np.asarray(L2.to_dense()), expect,
                                   rtol=1e-12)

    def test_empty_operand(self, rng):
        from spsparse_tpu import coo_kron
        A = random_coo(rng, (3, 3), 5)
        E = CooBuilder((2, 2), dtype=np.float64).build()
        K = coo_kron(A, E)
        assert K.shape == (6, 6) and int(K.nnz) == 0


class TestFilterTrilTriu:
    def test_tril_triu_match_scipy(self, rng):
        import scipy.sparse as sps
        from spsparse_tpu import coo_tril, coo_triu
        A = random_coo(rng, (17, 23), 80)
        dense = np.asarray(A.to_dense())
        for k in (-3, -1, 0, 1, 4):
            lo = np.asarray(coo_tril(A, k).to_dense())
            hi = np.asarray(coo_triu(A, k).to_dense())
            np.testing.assert_allclose(lo, sps.tril(dense, k).toarray())
            np.testing.assert_allclose(hi, sps.triu(dense, k).toarray())
            # tril(k) + triu(k+1) partitions the matrix
            np.testing.assert_allclose(
                lo + np.asarray(coo_triu(A, k + 1).to_dense()), dense)

    def test_filter_predicate_and_metadata(self, rng):
        from spsparse_tpu import coo_filter, consolidate
        A = consolidate(random_coo(rng, (12, 12), 50))
        kept = coo_filter(A, lambda idx, vals: jnp.abs(vals) > 0.5)
        dense = np.asarray(A.to_dense())
        expect = np.where(np.abs(dense) > 0.5, dense, 0)
        np.testing.assert_allclose(np.asarray(kept.to_dense()), expect)
        # order-preserving compaction keeps sortedness metadata valid
        assert kept.sort_order == A.sort_order
        idx = np.asarray(kept.indices)[:int(kept.nnz)]
        assert (np.lexsort((idx[:, 1], idx[:, 0])) == np.arange(len(idx))).all()

    def test_jittable_and_rank_guard(self, rng):
        from spsparse_tpu import coo_tril, coo_filter
        from spsparse_tpu.core.errors import SpSparseError
        A = random_coo(rng, (9, 9), 30)
        out = jax.jit(lambda a: coo_tril(a, 0))(A)
        np.testing.assert_allclose(np.asarray(out.to_dense()),
                                   np.tril(np.asarray(A.to_dense())))
        v = random_coo(rng, (9,), 5)
        with pytest.raises(SpSparseError):
            coo_tril(v)
        # empty result keeps canonical padding
        none = coo_filter(A, lambda idx, vals: jnp.zeros(idx.shape[0], bool))
        assert int(none.nnz) == 0
        assert np.all(np.asarray(none.indices) ==
                      np.asarray(none.shape)[None, :])


class TestKronsum:
    def test_vs_scipy(self):
        from spsparse_tpu import SparseCOO
        from spsparse_tpu.core.construct import coo_kronsum
        rng = np.random.default_rng(0)
        A = np.where(rng.uniform(size=(4, 4)) < 0.5,
                     rng.uniform(-1, 1, (4, 4)), 0.0)
        B = np.where(rng.uniform(size=(3, 3)) < 0.5,
                     rng.uniform(-1, 1, (3, 3)), 0.0)
        sa = SparseCOO.from_arrays(
            np.stack(A.nonzero(), 1), A[A.nonzero()], (4, 4))
        sb = SparseCOO.from_arrays(
            np.stack(B.nonzero(), 1), B[B.nonzero()], (3, 3))
        K = coo_kronsum(sa, sb)
        ref = sps.kronsum(sps.csr_matrix(A), sps.csr_matrix(B)).toarray()
        np.testing.assert_allclose(np.asarray(K.to_dense()), ref,
                                   atol=1e-12)

    def test_laplacian_2d_assembly(self):
        # the classic use: 2-D 5-point Laplacian from 1-D tridiagonals
        from spsparse_tpu import coo_diags
        from spsparse_tpu.core.construct import coo_kronsum
        n = 5
        T = coo_diags([2.0, -1.0, -1.0], [0, 1, -1], (n, n),
                      dtype=np.float64)
        L2 = coo_kronsum(T, T)
        d = np.asarray(L2.to_dense())
        assert d.shape == (25, 25)
        np.testing.assert_allclose(np.diag(d), 4.0)
        np.testing.assert_allclose(d.sum(axis=1)[12], 0.0, atol=1e-12)

    def test_rejects_rectangular(self):
        from spsparse_tpu import SparseCOO
        from spsparse_tpu.core.construct import coo_kronsum
        A = SparseCOO.from_arrays(np.array([[0, 1]]), np.array([1.0]),
                                  (2, 3))
        with pytest.raises(SpSparseError):
            coo_kronsum(A, A)
