"""RCM reordering: bandwidth reduction + permutation correctness.

No reference counterpart (citibeth/spsparse has no reordering); oracles
are dense numpy permutations and, where available,
scipy.sparse.csgraph.reverse_cuthill_mckee for a quality cross-check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spsparse_tpu import (CooBuilder, bandwidth, coo_permute,
                          rcm_permutation, to_csr, to_dia)
from spsparse_tpu.ops.spmm import spmv


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def scrambled_band(rng, n, band=3):
    """A banded SPD-ish pattern relabeled by a random permutation — RCM's
    home turf. Returns (scrambled COO, scrambling perm, dense)."""
    A = np.zeros((n, n))
    for off in range(band + 1):
        v = rng.uniform(0.5, 1.5, n - off)
        A[np.arange(n - off), np.arange(off, n)] = v
        A[np.arange(off, n), np.arange(n - off)] = v
    p = rng.permutation(n)
    S = A[np.ix_(p, p)]
    ii, jj = np.nonzero(S)
    b = CooBuilder((n, n), dtype=np.float64)
    b.add_many(np.stack([ii, jj], 1), S[ii, jj])
    return b.build(), p, S


class TestRcm:
    def test_recovers_small_bandwidth(self, rng):
        n, band = 128, 3
        A, _, S = scrambled_band(rng, n, band)
        assert bandwidth(A) > 4 * band          # scrambled: wide
        perm = rcm_permutation(A)
        B = coo_permute(A, jnp.asarray(perm))
        bw = bandwidth(B)
        # RCM on a path-like band graph recovers near-optimal width.
        assert bw <= 3 * band, bw
        # Permutation correctness vs the dense oracle.
        np.testing.assert_array_equal(np.asarray(B.to_dense()),
                                      S[np.ix_(perm, perm)])

    def test_matches_scipy_quality(self, rng):
        scipy_sparse = pytest.importorskip("scipy.sparse")
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        n = 96
        A, _, S = scrambled_band(rng, n, 2)
        perm = rcm_permutation(A)
        sp_perm = reverse_cuthill_mckee(
            scipy_sparse.csr_matrix(S), symmetric_mode=True)
        ours = bandwidth(coo_permute(A, jnp.asarray(perm)))
        Sp = S[np.ix_(sp_perm, sp_perm)]
        ii, jj = np.nonzero(Sp)
        theirs = int(np.abs(ii - jj).max())
        assert ours <= 2 * max(theirs, 1)       # same ballpark

    def test_disconnected_components_and_selfloops(self, rng):
        b = CooBuilder((9, 9), dtype=np.float64)
        # Two components: {0,3,6} chain and {1,4} pair; node 2 isolated
        # with a self-loop; 5,7,8 fully isolated.
        for i, j in [(0, 3), (3, 6), (1, 4), (2, 2)]:
            b.add((i, j), 1.0)
            if i != j:
                b.add((j, i), 1.0)
        A = b.build()
        perm = rcm_permutation(A)
        assert sorted(perm.tolist()) == list(range(9))
        B = coo_permute(A, jnp.asarray(perm))
        Ad = np.asarray(A.to_dense())
        np.testing.assert_array_equal(np.asarray(B.to_dense()),
                                      Ad[np.ix_(perm, perm)])

    def test_spmv_commutes_with_permutation(self, rng):
        n = 64
        A, _, S = scrambled_band(rng, n, 2)
        perm = rcm_permutation(A)
        B = coo_permute(A, jnp.asarray(perm)).consolidate((0, 1))
        x = rng.uniform(-1, 1, n)
        y_perm = np.asarray(spmv(to_csr(B), jnp.asarray(x[perm])))
        y = S @ x
        np.testing.assert_allclose(y_perm, y[perm], rtol=1e-12)

    def test_dia_diag_count_drops(self, rng):
        n = 128
        A, _, _ = scrambled_band(rng, n, 2)
        perm = rcm_permutation(A)
        B = coo_permute(A, jnp.asarray(perm)).consolidate((0, 1))
        d_scrambled = to_dia(A.consolidate((0, 1)))
        d_rcm = to_dia(B)
        assert len(d_rcm.offsets) <= 13         # ~2*3*2+1
        assert len(d_rcm.offsets) < len(d_scrambled.offsets) / 4

    def test_rectangular_two_sided(self, rng):
        b = CooBuilder((4, 6), dtype=np.float64)
        b.add((1, 5), 2.0)
        b.add((3, 0), 1.0)
        A = b.build()
        rp = np.asarray([2, 0, 3, 1])
        cp = np.asarray([5, 4, 3, 2, 1, 0])
        B = coo_permute(A, jnp.asarray(rp), jnp.asarray(cp))
        Ad = np.asarray(A.to_dense())
        np.testing.assert_array_equal(np.asarray(B.to_dense()),
                                      Ad[np.ix_(rp, cp)])

    def test_permute_jit_and_padding(self, rng):
        A, _, S = scrambled_band(rng, 32, 2)
        perm = jnp.asarray(rcm_permutation(A))
        B = jax.jit(coo_permute)(A, perm)
        np.testing.assert_array_equal(
            np.asarray(B.to_dense()),
            S[np.ix_(np.asarray(perm), np.asarray(perm))])
        # Padding rows keep the sentinel (valid_mask unchanged).
        np.testing.assert_array_equal(np.asarray(B.valid_mask()),
                                      np.asarray(A.valid_mask()))

    def test_validation(self, rng):
        from spsparse_tpu import SpSparseError, coo_vector
        vb = coo_vector(4, dtype=np.float64)
        vb.add((0,), 1.0)
        v = vb.build()
        with pytest.raises(SpSparseError):
            rcm_permutation(v)
        with pytest.raises(SpSparseError):
            bandwidth(v)
        A, _, _ = scrambled_band(rng, 8, 1)
        with pytest.raises(SpSparseError):
            coo_permute(A, jnp.arange(5))

    def test_empty(self):
        A = CooBuilder((6, 6), dtype=np.float64).build(cap=4)
        assert bandwidth(A) == 0
        perm = rcm_permutation(A)
        assert sorted(perm.tolist()) == list(range(6))
