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
