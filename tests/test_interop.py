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


class TestNpzInterop:
    """scipy.sparse save_npz/load_npz container, both directions."""

    def _random(self, seed, shape=(9, 7), density=0.3):
        import scipy.sparse as sps
        return sps.random(*shape, density=density, random_state=seed)

    @pytest.mark.parametrize("fmt", ["coo", "csr", "csc"])
    def test_read_scipy_written(self, tmp_path, fmt):
        import scipy.sparse as sps
        from spsparse_tpu.io import load_npz
        m = self._random(1).asformat(fmt)
        p = tmp_path / f"m_{fmt}.npz"
        sps.save_npz(p, m)
        A = load_npz(p)
        assert A.shape == m.shape
        np.testing.assert_allclose(np.asarray(A.to_dense()), m.toarray())

    def test_scipy_reads_ours(self, tmp_path):
        import scipy.sparse as sps
        from spsparse_tpu.core.interop import from_scipy
        from spsparse_tpu.io import save_npz
        m = self._random(2)
        A = from_scipy(m)
        p = tmp_path / "ours.npz"
        save_npz(p, A)
        back = sps.load_npz(p)
        np.testing.assert_allclose(back.toarray(), m.toarray())

    def test_round_trip_padding_dropped(self, tmp_path):
        from spsparse_tpu import SparseCOO
        from spsparse_tpu.io import load_npz, save_npz
        A = SparseCOO.from_arrays(np.array([[0, 1], [2, 3]]),
                                  np.array([1.5, -2.5]), (4, 5), cap=16)
        p = tmp_path / "pad.npz"
        save_npz(p, A)
        B = load_npz(p)
        assert int(B.nnz) == 2
        np.testing.assert_allclose(np.asarray(B.to_dense()),
                                   np.asarray(A.to_dense()))

    def test_rank2_only(self, tmp_path):
        from spsparse_tpu import SparseCOO
        from spsparse_tpu.core.errors import SpSparseError
        from spsparse_tpu.io import save_npz
        A = SparseCOO.from_arrays(np.array([[0, 0, 0]]), np.array([1.0]),
                                  (2, 2, 2))
        with pytest.raises(SpSparseError, match="rank-2"):
            save_npz(tmp_path / "r3.npz", A)

    def test_unicode_format_member(self, tmp_path):
        # scipy accepts both bytes and str `format` on load; third-party
        # writers may store a unicode string — we must too
        from spsparse_tpu.io import load_npz
        p = tmp_path / "uni.npz"
        np.savez(p, format="coo", shape=np.array([3, 4]),
                 data=np.array([2.0, -1.0]), row=np.array([0, 2]),
                 col=np.array([1, 3]))
        A = load_npz(p)
        dense = np.zeros((3, 4))
        dense[0, 1], dense[2, 3] = 2.0, -1.0
        np.testing.assert_allclose(np.asarray(A.to_dense()), dense)

    def test_uncompressed_variant(self, tmp_path):
        import scipy.sparse as sps
        from spsparse_tpu.core.interop import from_scipy
        from spsparse_tpu.io import save_npz
        m = self._random(3)
        p = tmp_path / "unc.npz"
        save_npz(p, from_scipy(m), compressed=False)
        np.testing.assert_allclose(sps.load_npz(p).toarray(), m.toarray())
