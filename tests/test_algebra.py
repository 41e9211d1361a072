"""Elementwise sparse algebra (coo_concat / coo_add / coo_scale).

Reference parity: these compose the reference's copy-into-one-accumulator
+ consolidate pattern (algorithm.hpp:30-37, :251-319); oracles are dense.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spsparse_tpu import (CooBuilder, DuplicatePolicy, SpSparseError,
                          coo_add, coo_concat, coo_scale)


def random_coo(rng, shape, nnz, dtype=np.float64):
    b = CooBuilder(shape, dtype=dtype)
    idx = np.stack([rng.integers(0, s, size=nnz) for s in shape], axis=1)
    b.add_many(idx, rng.uniform(-1, 1, size=nnz))
    return b.build()


class TestConcat:
    def test_preserves_all_entries_in_order(self, rng):
        A = random_coo(rng, (6, 6), 10)
        B = random_coo(rng, (6, 6), 7)
        C = coo_concat(A, B)
        ia, va = A.to_lists()
        ib, vb = B.to_lists()
        ic, vc = C.to_lists()
        assert ic == ia + ib
        np.testing.assert_array_equal(vc, va + vb)
        assert C.sort_order is None
        # default cap: sum of operand caps rounded to a power of two
        # (CLAUDE.md capacity convention — compile-cache reuse)
        from spsparse_tpu.core.coo import round_up_pow2
        assert C.cap == round_up_pow2(A.cap + B.cap)

    def test_three_way_and_empty(self, rng):
        A = random_coo(rng, (4, 4), 5)
        E = CooBuilder((4, 4), dtype=np.float64).build()
        C = coo_concat(A, E, A)
        assert int(C.nnz) == 10
        np.testing.assert_allclose(np.asarray(C.to_dense()),
                                   2 * np.asarray(A.to_dense()), rtol=1e-12)

    def test_shape_mismatch_raises(self, rng):
        with pytest.raises(SpSparseError):
            coo_concat(random_coo(rng, (4, 4), 3), random_coo(rng, (4, 5), 3))

    def test_jittable(self, rng):
        A = random_coo(rng, (8, 8), 12)
        B = random_coo(rng, (8, 8), 9)
        C = jax.jit(coo_concat)(A, B)
        np.testing.assert_allclose(
            np.asarray(C.to_dense()),
            np.asarray(A.to_dense()) + np.asarray(B.to_dense()), rtol=1e-12)


class TestAdd:
    def test_linear_combination_matches_dense(self, rng):
        A = random_coo(rng, (9, 7), 20)
        B = random_coo(rng, (9, 7), 15)
        C = coo_add(A, B, alpha=2.5, beta=-0.5)
        np.testing.assert_allclose(
            np.asarray(C.to_dense()),
            2.5 * np.asarray(A.to_dense()) - 0.5 * np.asarray(B.to_dense()),
            rtol=1e-12)
        assert C.sort_order == (0, 1)

    def test_exact_cancellation_kept_as_zero(self):
        # Reference consolidate emits merged sums unconditionally, even
        # when they cancel to 0 (algorithm.hpp:287) — coo_add inherits
        # that; an extra consolidate drops them.
        a = CooBuilder((3, 3), dtype=np.float64)
        a.add((1, 1), 2.0)
        a.add((0, 2), 1.0)
        b = CooBuilder((3, 3), dtype=np.float64)
        b.add((1, 1), -2.0)
        C = coo_add(a.build(), b.build())
        ic, vc = C.to_lists()
        assert ic == [(0, 2), (1, 1)]
        np.testing.assert_array_equal(vc, [1.0, 0.0])
        # (the member form short-circuits on matching sort_order —
        # reference VectorCooArray.hpp:305-306 — so use the functional one)
        from spsparse_tpu import consolidate
        ic2, vc2 = consolidate(C, (0, 1)).to_lists()
        assert ic2 == [(0, 2)]
        np.testing.assert_array_equal(vc2, [1.0])

    def test_overlay_policies(self):
        a = CooBuilder((2, 2), dtype=np.float64)
        a.add((0, 0), 1.0)
        a.add((1, 1), 3.0)
        b = CooBuilder((2, 2), dtype=np.float64)
        b.add((0, 0), 9.0)
        A, B = a.build(), b.build()
        first = coo_add(A, B, duplicate_policy=DuplicatePolicy.LEAVE_ALONE)
        last = coo_add(A, B, duplicate_policy=DuplicatePolicy.REPLACE)
        assert np.asarray(first.to_dense())[0, 0] == 1.0   # A wins
        assert np.asarray(last.to_dense())[0, 0] == 9.0    # B overlays
        assert np.asarray(first.to_dense())[1, 1] == 3.0

    def test_jittable_with_static_cap(self, rng):
        A = random_coo(rng, (10, 10), 25)
        B = random_coo(rng, (10, 10), 25)

        @jax.jit
        def f(x, y):
            return coo_add(x, y, cap=128)

        C = f(A, B)
        np.testing.assert_allclose(
            np.asarray(C.to_dense()),
            np.asarray(A.to_dense()) + np.asarray(B.to_dense()), rtol=1e-12)


class TestScale:
    def test_scale_preserves_structure_and_sortedness(self, rng):
        A = random_coo(rng, (6, 6), 12).consolidate((0, 1))
        S = coo_scale(A, -3.0)
        assert S.sort_order == (0, 1)
        np.testing.assert_allclose(np.asarray(S.to_dense()),
                                   -3.0 * np.asarray(A.to_dense()),
                                   rtol=1e-12)


def test_concat_undersized_cap_raises(rng):
    from spsparse_tpu import SpSparseError
    A = random_coo(rng, (6, 6), 10)
    B = random_coo(rng, (6, 6), 7)
    import pytest as _pytest
    with _pytest.raises(SpSparseError):
        coo_concat(A, B, cap=8)


class TestStacking:
    """hstack / vstack / block_diag (scipy.sparse parity; no reference
    counterpart — the reference would hand-loop add() with offsets)."""

    def _rand(self, rng, shape, nnz):
        from spsparse_tpu import CooBuilder
        b = CooBuilder(shape, dtype=np.float64)
        idx = np.stack([rng.integers(0, s, nnz) for s in shape], 1)
        b.add_many(idx, rng.uniform(-1, 1, nnz))
        return b.build()

    def test_hstack_vstack_match_dense(self, rng):
        from spsparse_tpu import coo_hstack, coo_vstack
        A = self._rand(rng, (5, 7), 12)
        B = self._rand(rng, (5, 3), 6)
        C = self._rand(rng, (4, 7), 9)
        H = coo_hstack(A, B)
        assert H.shape == (5, 10)
        np.testing.assert_array_equal(
            np.asarray(H.to_dense()),
            np.concatenate([np.asarray(A.to_dense()),
                            np.asarray(B.to_dense())], axis=1))
        V = coo_vstack(A, C)
        assert V.shape == (9, 7)
        np.testing.assert_array_equal(
            np.asarray(V.to_dense()),
            np.concatenate([np.asarray(A.to_dense()),
                            np.asarray(C.to_dense())], axis=0))

    def test_block_diag_and_jit(self, rng):
        import jax
        from spsparse_tpu import coo_block_diag
        A = self._rand(rng, (3, 4), 6)
        B = self._rand(rng, (2, 2), 3)
        D = jax.jit(coo_block_diag)(A, B)
        assert D.shape == (5, 6)
        expect = np.zeros((5, 6))
        expect[:3, :4] = np.asarray(A.to_dense())
        expect[3:, 4:] = np.asarray(B.to_dense())
        np.testing.assert_array_equal(np.asarray(D.to_dense()), expect)

    def test_duplicates_preserved_and_order(self, rng):
        # Stacking preserves raw entries (incl. duplicates) in operand
        # order, so a later consolidate sees insertion-order semantics.
        from spsparse_tpu import CooBuilder, coo_vstack, DuplicatePolicy
        b1 = CooBuilder((2, 2), dtype=np.float64)
        b1.add((0, 0), 1.0)
        b1.add((0, 0), 2.0)
        b2 = CooBuilder((1, 2), dtype=np.float64)
        b2.add((0, 0), 5.0)
        V = coo_vstack(b1.build(), b2.build())
        assert int(V.nnz) == 3
        c = V.consolidate((0, 1), DuplicatePolicy.LEAVE_ALONE)
        d = np.asarray(c.to_dense())
        assert d[0, 0] == 1.0 and d[2, 0] == 5.0

    def test_validation(self, rng):
        from spsparse_tpu import SpSparseError, coo_hstack, coo_vstack
        A = self._rand(rng, (3, 4), 5)
        B = self._rand(rng, (2, 4), 5)
        with pytest.raises(SpSparseError):
            coo_hstack(A, B)
        with pytest.raises(SpSparseError):
            coo_vstack()
        C = self._rand(rng, (3, 5), 5)
        with pytest.raises(SpSparseError):
            coo_vstack(A, C)


class TestNorm:
    def test_matches_scipy_conventions(self, rng):
        import jax.numpy as jnp
        from spsparse_tpu import CooBuilder, coo_norm
        b = CooBuilder((4, 6), dtype=np.float64)
        idx = np.stack([rng.integers(0, 4, 15), rng.integers(0, 6, 15)], 1)
        b.add_many(idx, rng.uniform(-2, 2, 15))
        A = b.build().consolidate((0, 1))
        Ad = np.asarray(A.to_dense())
        np.testing.assert_allclose(float(coo_norm(A)),
                                   np.linalg.norm(Ad, "fro"), rtol=1e-12)
        np.testing.assert_allclose(float(coo_norm(A, 1)),
                                   np.abs(Ad).sum(0).max(), rtol=1e-12)
        np.testing.assert_allclose(float(coo_norm(A, jnp.inf)),
                                   np.abs(Ad).sum(1).max(), rtol=1e-12)
        np.testing.assert_allclose(float(coo_norm(A, "max")),
                                   np.abs(Ad).max(), rtol=1e-12)

    def test_jit_and_errors(self, rng):
        import jax
        from spsparse_tpu import CooBuilder, SpSparseError, coo_norm
        b = CooBuilder((3, 3), dtype=np.float64)
        b.add((1, 2), -3.0)
        A = b.build()
        assert float(jax.jit(coo_norm)(A)) == 3.0
        with pytest.raises(SpSparseError):
            coo_norm(A, 2)

    def test_undersized_cap_raises_eagerly(self, rng):
        # Same contract as coo_concat: silently dropping entries on an
        # undersized explicit cap would corrupt assembled operators.
        from spsparse_tpu import CooBuilder, SpSparseError, coo_hstack

        def rand(shape, nnz):
            b = CooBuilder(shape, dtype=np.float64)
            idx = np.stack([rng.integers(0, s, nnz) for s in shape], 1)
            b.add_many(idx, rng.uniform(-1, 1, nnz))
            return b.build()

        A, B = rand((3, 4), 4), rand((3, 2), 4)
        with pytest.raises(SpSparseError):
            coo_hstack(A, B, cap=3)


class TestBinop:
    """coo_multiply / coo_maximum / coo_minimum / coo_power vs scipy
    oracles (VERDICT r3 item 6). Composes the join/merge tier the
    reference builds from xiter.hpp:149-282."""

    def _pair(self, rng, shape=(9, 11), nnz_a=25, nnz_b=20, overlap=8):
        # guaranteed structural overlap so the intersection is non-empty
        A = random_coo(rng, shape, nnz_a)
        ib, _ = A.to_lists()
        b = CooBuilder(shape, dtype=np.float64)
        pick = rng.permutation(len(ib))[:min(overlap, len(ib))]
        for p in pick:
            b.add(tuple(ib[p]), float(rng.uniform(-1, 1)))
        idx = np.stack([rng.integers(0, s, size=nnz_b) for s in shape], 1)
        b.add_many(idx, rng.uniform(-1, 1, size=nnz_b))
        return A, b.build()

    @pytest.mark.parametrize("seed", range(5))
    def test_multiply_vs_scipy(self, seed):
        import scipy.sparse as sps
        from spsparse_tpu import coo_multiply
        rng = np.random.default_rng(seed)
        A, B = self._pair(rng)
        C = coo_multiply(A, B)
        ref = sps.coo_matrix(np.asarray(A.to_dense())).multiply(
            sps.coo_matrix(np.asarray(B.to_dense())))
        np.testing.assert_allclose(np.asarray(C.to_dense()),
                                   ref.toarray(), rtol=1e-12)
        # result invariants: sorted row-major, unique keys
        iv, _ = C.to_lists()
        assert iv == sorted(iv)
        assert len(set(map(tuple, iv))) == len(iv)

    @pytest.mark.parametrize("op", ["maximum", "minimum"])
    @pytest.mark.parametrize("seed", range(4))
    def test_maxmin_vs_scipy(self, op, seed):
        import scipy.sparse as sps
        from spsparse_tpu import coo_maximum, coo_minimum
        rng = np.random.default_rng(100 + seed)
        A, B = self._pair(rng)
        fn = coo_maximum if op == "maximum" else coo_minimum
        C = fn(A, B)
        sa = sps.csr_matrix(np.asarray(A.to_dense()))
        sb = sps.csr_matrix(np.asarray(B.to_dense()))
        ref = getattr(sa, op)(sb)
        np.testing.assert_allclose(np.asarray(C.to_dense()),
                                   ref.toarray(), rtol=1e-12)

    def test_duplicates_summed_before_combine(self):
        # scipy canonicalizes (sums duplicates) before _binopt; so do we
        from spsparse_tpu import coo_multiply
        a = CooBuilder((3, 3), dtype=np.float64)
        a.add((1, 1), 2.0); a.add((1, 1), 3.0)      # -> 5
        b = CooBuilder((3, 3), dtype=np.float64)
        b.add((1, 1), 4.0); b.add((1, 1), -1.0)     # -> 3
        C = coo_multiply(a.build(), b.build())
        assert int(C.nnz) == 1
        assert float(np.asarray(C.to_dense())[1, 1]) == 15.0

    def test_multiply_nan_times_implicit_zero_absent(self):
        # scipy's intersection never evaluates NaN * implicit-zero;
        # require_both pins the same structural contract
        from spsparse_tpu import coo_multiply
        a = CooBuilder((2, 2), dtype=np.float64)
        a.add((0, 0), np.nan); a.add((1, 1), 2.0)
        b = CooBuilder((2, 2), dtype=np.float64)
        b.add((1, 1), 3.0)
        C = coo_multiply(a.build(), b.build())
        dense = np.asarray(C.to_dense())
        assert dense[0, 0] == 0.0 and dense[1, 1] == 6.0

    def test_maximum_negative_vs_implicit_zero_dropped(self):
        # max(-1, implicit 0) = 0 -> not stored (dense oracle via scipy)
        import scipy.sparse as sps
        from spsparse_tpu import coo_maximum
        a = CooBuilder((2, 2), dtype=np.float64)
        a.add((0, 1), -1.0); a.add((1, 0), 4.0)
        b = CooBuilder((2, 2), dtype=np.float64)
        b.add((1, 0), 2.0)
        A, B = a.build(), b.build()
        C = coo_maximum(A, B)
        ref = sps.csr_matrix(np.asarray(A.to_dense())).maximum(
            sps.csr_matrix(np.asarray(B.to_dense())))
        np.testing.assert_allclose(np.asarray(C.to_dense()), ref.toarray())
        assert int(C.nnz) == 1                      # only the (1,0)=4 entry

    def test_jittable(self, rng):
        from spsparse_tpu import coo_multiply, coo_maximum
        A, B = self._pair(rng)
        C = jax.jit(coo_multiply)(A, B)
        D = jax.jit(coo_maximum)(A, B)
        np.testing.assert_allclose(
            np.asarray(C.to_dense()),
            np.asarray(A.to_dense()) * np.asarray(B.to_dense()),
            rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(D.to_dense()),
            np.maximum(np.asarray(A.to_dense()), np.asarray(B.to_dense())),
            rtol=1e-12)

    def test_rank3_union(self, rng):
        from spsparse_tpu import coo_maximum
        A = random_coo(rng, (4, 5, 6), 18)
        B = random_coo(rng, (4, 5, 6), 14)
        C = coo_maximum(A, B)
        np.testing.assert_allclose(
            np.asarray(C.to_dense()),
            np.maximum(np.asarray(A.to_dense()), np.asarray(B.to_dense())),
            rtol=1e-12)

    def test_shape_mismatch_raises(self, rng):
        from spsparse_tpu import coo_multiply
        with pytest.raises(SpSparseError, match="shape"):
            coo_multiply(random_coo(rng, (4, 4), 3),
                         random_coo(rng, (4, 5), 3))

    @pytest.mark.parametrize("p", [2, 3, 0.5, -1])
    def test_power_vs_scipy(self, p):
        import scipy.sparse as sps
        from spsparse_tpu import coo_power
        from spsparse_tpu import consolidate
        rng = np.random.default_rng(7)
        # canonical (duplicate-free): powering is per *stored* entry, so
        # duplicate slots would power-then-sum while the dense oracle
        # sums-then-powers
        A = consolidate(random_coo(rng, (6, 6), 12))
        # positive values so fractional powers stay real
        import dataclasses
        A = dataclasses.replace(A, vals=jnp.abs(A.vals) + 0.5 * A.valid_mask())
        C = coo_power(A, p)
        ref = sps.coo_matrix(np.asarray(A.to_dense())).power(p)
        np.testing.assert_allclose(np.asarray(C.to_dense()), ref.toarray(),
                                   rtol=1e-12)

    def test_power_zero_rejected(self, rng):
        from spsparse_tpu import coo_power
        with pytest.raises(SpSparseError, match="power"):
            coo_power(random_coo(rng, (3, 3), 4), 0)
