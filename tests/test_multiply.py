"""Multiply-chain tests: randomized differential testing vs a dense oracle.

Mirrors /root/reference/tests/test_multiply_sparse.cpp:

* ``test_random_MM_multiply`` (``:84-136``): random 5x5 A,B, sparse multiply
  with identity ``scalej``, compare densified result to the naive dense
  oracle (reference uses EXPECT_DOUBLE_EQ = 4 ULP; we run f64 and assert
  to 1e-12 rtol).
* ``test_random_MV_multiply`` (``:138-203``): same for matrix-vector.
* The diag-scale chain golden the reference left ``#if 0``'d
  (``:40-81``, expected values {128., 60.}) — enabled here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder, SparseCOO
from spsparse_tpu.ops import multiply, multiply_mv
from spsparse_tpu import SpSparseError


def random_coo(rng, shape, nnz, dtype=np.float64):
    b = CooBuilder(shape, dtype=dtype)
    idx = np.stack([rng.integers(0, s, size=nnz) for s in shape], axis=1)
    vals = rng.uniform(0, 1, size=nnz)
    b.add_many(idx, vals)
    return b.build()


def eye_vector(n):
    b = CooBuilder((n,), dtype=np.float64)
    b.add_many(np.arange(n)[:, None], np.ones(n))
    return b.build()


class TestRandomMM:
    # test_multiply_sparse.cpp:84-136 — a few seeds through the EAGER
    # auto-capacity path; the full 999-seed reference sweep runs vectorized
    # in TestFullSeedSweep below.
    @pytest.mark.parametrize("seed", list(range(1, 9)))
    def test_mm_vs_dense_oracle(self, seed):
        dsize = 5
        rng = np.random.default_rng(seed)
        nranda = int(rng.uniform(0, 1) * dsize * dsize)
        nrandb = int(rng.uniform(0, 1) * dsize * dsize)
        A = random_coo(rng, (dsize, dsize), nranda)
        B = random_coo(rng, (dsize, dsize), nrandb)
        eye = eye_vector(dsize)

        C = multiply(1.0, A, B, scalej=eye)
        Ad = np.asarray(A.to_dense())
        Bd = np.asarray(B.to_dense())
        Cd = np.asarray(C.to_dense())
        np.testing.assert_allclose(Cd, Ad @ Bd, rtol=1e-12, atol=1e-300)

    def test_mm_no_scales(self):
        rng = np.random.default_rng(7)
        A = random_coo(rng, (6, 4), 10)
        B = random_coo(rng, (4, 7), 12)
        C = multiply(1.0, A, B)
        np.testing.assert_allclose(
            np.asarray(C.to_dense()),
            np.asarray(A.to_dense()) @ np.asarray(B.to_dense()),
            rtol=1e-12)

    @pytest.mark.parametrize("ta,tb", [(True, False), (False, True),
                                       (True, True)])
    def test_mm_transposes(self, ta, tb):
        rng = np.random.default_rng(11)
        A = random_coo(rng, (4, 6), 9)
        B = random_coo(rng, (7, 6) if not tb else (7, 6), 11)
        # choose shapes so inner dims match: A' = A or A.T; B' = B or B.T
        Ad = np.asarray(A.to_dense()).T if ta else np.asarray(A.to_dense())
        # make B compatible
        Bm = random_coo(rng, (Ad.shape[1], 5), 10)
        if tb:
            Bm = random_coo(rng, (5, Ad.shape[1]), 10)
        Bd = np.asarray(Bm.to_dense()).T if tb else np.asarray(Bm.to_dense())
        C = multiply(1.0, A, Bm, transpose_a=ta, transpose_b=tb)
        np.testing.assert_allclose(np.asarray(C.to_dense()), Ad @ Bd,
                                   rtol=1e-12)

    def test_ab_equals_btat_transposed(self):
        # multiply_sparse.hpp:14-18 code example: AB == (B^T A^T)^T
        rng = np.random.default_rng(3)
        A = random_coo(rng, (5, 5), 12)
        B = random_coo(rng, (5, 5), 14)
        AB = multiply(1.0, A, B)
        BtAt = multiply(1.0, B, A, transpose_a=True, transpose_b=True)
        np.testing.assert_allclose(np.asarray(AB.to_dense()),
                                   np.asarray(BtAt.to_dense()).T, rtol=1e-12)

    def test_inner_dim_mismatch_raises(self):
        rng = np.random.default_rng(1)
        A = random_coo(rng, (3, 4), 5)
        B = random_coo(rng, (5, 3), 5)
        with pytest.raises(SpSparseError):
            multiply(1.0, A, B)

    def test_zero_outputs_dropped_and_c_scaling(self):
        # A row times B col that sums to zero must not be emitted.
        a = CooBuilder((2, 2))
        a.add((0, 0), 1.0)
        a.add((0, 1), 1.0)
        a.add((1, 0), 2.0)
        b = CooBuilder((2, 2))
        b.add((0, 0), 1.0)
        b.add((1, 0), -1.0)  # dot(row0, col0) = 0
        b.add((0, 1), 3.0)
        C = multiply(2.0, a.build(), b.build())
        idx, vals = C.to_lists()
        assert (0, 0) not in idx
        got = dict(zip(idx, vals))
        assert got[(0, 1)] == pytest.approx(6.0)   # 1*3 * C=2
        assert got[(1, 0)] == pytest.approx(4.0)   # 2*1 * 2
        assert got[(1, 1)] == pytest.approx(12.0)  # 2*3 * 2

    def test_c_zero_short_circuit(self):
        rng = np.random.default_rng(5)
        A = random_coo(rng, (4, 4), 6)
        B = random_coo(rng, (4, 4), 6)
        C = multiply(0.0, A, B)
        assert int(C.nnz) == 0


class TestDiagScaleChain:
    def test_reference_disabled_golden(self):
        # test_multiply_sparse.cpp:40-79 (#if 0'd): expected {128., 60.}
        row = CooBuilder((2, 10))
        row.add((0, 8), 6.0)
        row.add((0, 4), 4.0)
        row.add((0, 0), 2.0)
        row.add((0, 3), 3.0)
        row.add((1, 8), 3.0)

        scale = CooBuilder((10,))
        scale.add((0,), 2.0)
        scale.add((4,), 4.0)
        scale.add((8,), 4.0)

        col = CooBuilder((10, 1))
        col.add((0, 0), 2.0)
        col.add((3, 0), 3.0)
        col.add((8, 0), 5.0)

        eye = eye_vector(10)
        ret2 = multiply(1.0, row.build(), col.build(),
                        scalei=eye_vector(2), scalej=scale.build(),
                        scalek=eye_vector(1))
        idx, vals = ret2.to_lists()
        assert idx == [(0, 0), (1, 0)]
        np.testing.assert_allclose(vals, [128.0, 60.0])

    def test_scalei_row_skipping(self):
        # A row missing from scalei is skipped entirely; zero scale too.
        a = CooBuilder((3, 2))
        a.add((0, 0), 1.0)
        a.add((1, 0), 2.0)
        a.add((2, 0), 3.0)
        b = CooBuilder((2, 1))
        b.add((0, 0), 1.0)
        si = CooBuilder((3,))
        si.add((0,), 2.0)   # row 0 scaled by 2
        si.add((1,), 0.0)   # row 1: zero scale -> skipped
        # row 2 absent -> skipped
        C = multiply(1.0, a.build(), b.build(), scalei=si.build())
        idx, vals = C.to_lists()
        assert idx == [(0, 0)]
        np.testing.assert_allclose(vals, [2.0])

    def test_scalej_inner_masking(self):
        # Inner index absent from scalej contributes nothing.
        a = CooBuilder((1, 3))
        a.add((0, 0), 1.0)
        a.add((0, 1), 10.0)
        a.add((0, 2), 100.0)
        b = CooBuilder((3, 1))
        b.add((0, 0), 1.0)
        b.add((1, 0), 1.0)
        b.add((2, 0), 1.0)
        sj = CooBuilder((3,))
        sj.add((0,), 1.0)
        sj.add((2,), 2.0)
        C = multiply(1.0, a.build(), b.build(), scalej=sj.build())
        idx, vals = C.to_lists()
        assert idx == [(0, 0)]
        np.testing.assert_allclose(vals, [201.0])  # 1*1 + 100*2

    def test_scalek_col_skipping(self):
        a = CooBuilder((1, 2))
        a.add((0, 0), 1.0)
        b = CooBuilder((2, 3))
        b.add((0, 0), 1.0)
        b.add((0, 1), 2.0)
        b.add((0, 2), 3.0)
        sk = CooBuilder((3,))
        sk.add((1,), 10.0)
        C = multiply(1.0, a.build(), b.build(), scalek=sk.build())
        idx, vals = C.to_lists()
        assert idx == [(0, 1)]
        np.testing.assert_allclose(vals, [20.0])


class TestRandomMV:
    # test_multiply_sparse.cpp:138-203
    @pytest.mark.parametrize("seed", list(range(1, 9)))
    def test_mv_vs_dense_oracle(self, seed):
        dsize = 5
        rng = np.random.default_rng(seed)
        nranda = int(rng.uniform(0, 1) * dsize * dsize)
        nrandb = int(rng.uniform(0, 1) * dsize)
        A = random_coo(rng, (dsize, dsize), nranda)
        V = random_coo(rng, (dsize,), nrandb)

        C = multiply_mv(1.0, A, V)
        Ad = np.asarray(A.to_dense())
        Vd = np.asarray(V.to_dense())
        Cd = np.asarray(C.to_dense())
        np.testing.assert_allclose(Cd, Ad @ Vd, rtol=1e-12, atol=1e-300)

    def test_mv_transpose(self):
        rng = np.random.default_rng(9)
        A = random_coo(rng, (4, 6), 9)
        V = random_coo(rng, (4,), 3)
        C = multiply_mv(1.0, A, V, transpose_a=True)
        np.testing.assert_allclose(
            np.asarray(C.to_dense()),
            np.asarray(A.to_dense()).T @ np.asarray(V.to_dense()),
            rtol=1e-12)

    def test_mv_with_scales(self):
        rng = np.random.default_rng(13)
        A = random_coo(rng, (5, 5), 12)
        V = random_coo(rng, (5,), 4)
        si = random_coo(rng, (5,), 3)
        sj = random_coo(rng, (5,), 4)
        C = multiply_mv(3.0, A, V, scalei=si, scalej=sj)
        Ad = np.asarray(A.to_dense())
        Vd = np.asarray(V.to_dense())
        si_d = np.asarray(si.to_dense())
        sj_d = np.asarray(sj.to_dense())
        expect = 3.0 * si_d * (Ad @ (sj_d * Vd))
        # rows with si absent/zero are skipped -> both give 0 there
        np.testing.assert_allclose(np.asarray(C.to_dense()), expect,
                                   rtol=1e-12)

    def test_mv_inner_dim_mismatch(self):
        rng = np.random.default_rng(2)
        A = random_coo(rng, (3, 4), 4)
        V = random_coo(rng, (3,), 2)
        with pytest.raises(SpSparseError):
            multiply_mv(1.0, A, V)


class TestJitted:
    def test_mm_under_jit_with_caps(self):
        rng = np.random.default_rng(42)
        A = random_coo(rng, (5, 5), 10)
        B = random_coo(rng, (5, 5), 10)

        @jax.jit
        def f(a, b):
            return multiply(1.0, a, b, expand_cap=128, cap=32)

        C = f(A, B)
        np.testing.assert_allclose(
            np.asarray(C.to_dense()),
            np.asarray(A.to_dense()) @ np.asarray(B.to_dense()),
            rtol=1e-12)

    def test_mv_under_jit(self):
        rng = np.random.default_rng(43)
        A = random_coo(rng, (5, 5), 10)
        V = random_coo(rng, (5,), 3)

        @jax.jit
        def f(a, v):
            return multiply_mv(1.0, a, v, cap=16)

        C = f(A, V)
        np.testing.assert_allclose(
            np.asarray(C.to_dense()),
            np.asarray(A.to_dense()) @ np.asarray(V.to_dense()),
            rtol=1e-12)


class TestSpgemmHelpers:
    def test_spgemm_and_aat(self):
        rng = np.random.default_rng(21)
        A = random_coo(rng, (10, 8), 30)
        C = multiply(1.0, A, A, transpose_b=True)
        from spsparse_tpu.ops.spgemm import spgemm_aat, spgemm
        C2 = spgemm_aat(A)
        np.testing.assert_allclose(np.asarray(C2.to_dense()),
                                   np.asarray(C.to_dense()), rtol=1e-12)
        Ad = np.asarray(A.to_dense())
        np.testing.assert_allclose(np.asarray(C2.to_dense()), Ad @ Ad.T,
                                   rtol=1e-12)
        C3 = spgemm(A, A, transpose_a=True)
        np.testing.assert_allclose(np.asarray(C3.to_dense()), Ad.T @ Ad,
                                   rtol=1e-12)

    def test_plan_caps_under_jit(self):
        rng = np.random.default_rng(22)
        A = random_coo(rng, (12, 12), 40)
        B = random_coo(rng, (12, 12), 40)
        from spsparse_tpu.ops.spgemm import plan_spgemm_caps, spgemm
        expand_cap, out_cap = plan_spgemm_caps(A, B)

        @jax.jit
        def f(a, b):
            return spgemm(a, b, expand_cap=expand_cap, cap=out_cap)

        C = f(A, B)
        np.testing.assert_allclose(
            np.asarray(C.to_dense()),
            np.asarray(A.to_dense()) @ np.asarray(B.to_dense()), rtol=1e-12)


@pytest.mark.slow
class TestFullSeedSweep:
    """The reference sweeps seeds 1..999 (test_multiply_sparse.cpp:132-136,
    198-203). Same coverage here, vectorized: all seeds share one compiled
    program via fixed capacities + vmap."""

    @pytest.mark.parametrize("merge_method,atol", [
        ("scatter", 1e-300),   # reference EXPECT_DOUBLE_EQ parity
        ("compact", 5e-15),    # fast default: prefix-sum-difference sums
    ])
    def test_mm_999_seeds(self, merge_method, atol):
        dsize, cap = 5, 32
        As, Bs, Ads, Bds = [], [], [], []
        for seed in range(1, 1000):
            rng = np.random.default_rng(seed)
            na = int(rng.uniform(0, 1) * dsize * dsize)
            nb = int(rng.uniform(0, 1) * dsize * dsize)
            A = random_coo(rng, (dsize, dsize), na).with_capacity(cap)
            B = random_coo(rng, (dsize, dsize), nb).with_capacity(cap)
            As.append(A)
            Bs.append(B)
            Ads.append(np.asarray(A.to_dense()))
            Bds.append(np.asarray(B.to_dense()))
        stackA = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *As)
        stackB = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *Bs)

        @jax.jit
        @jax.vmap
        def f(a, b):
            return multiply(1.0, a, b, expand_cap=1024, cap=64,
                            merge_method=merge_method).to_dense()

        dense = np.asarray(f(stackA, stackB))
        expect = np.einsum("sij,sjk->sik", np.stack(Ads), np.stack(Bds))
        np.testing.assert_allclose(dense, expect, rtol=1e-12, atol=atol)

    def test_mv_999_seeds(self):
        dsize, cap = 5, 32
        As, Vs, Ads, Vds = [], [], [], []
        for seed in range(1, 1000):
            rng = np.random.default_rng(seed)
            na = int(rng.uniform(0, 1) * dsize * dsize)
            nv = int(rng.uniform(0, 1) * dsize)
            A = random_coo(rng, (dsize, dsize), na).with_capacity(cap)
            V = random_coo(rng, (dsize,), nv).with_capacity(cap)
            As.append(A)
            Vs.append(V)
            Ads.append(np.asarray(A.to_dense()))
            Vds.append(np.asarray(V.to_dense()))
        stackA = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *As)
        stackV = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *Vs)

        @jax.jit
        @jax.vmap
        def f(a, v):
            return multiply_mv(1.0, a, v, cap=32).to_dense()

        dense = np.asarray(f(stackA, stackV))
        expect = np.einsum("sij,sj->si", np.stack(Ads), np.stack(Vds))
        np.testing.assert_allclose(dense, expect, rtol=1e-12, atol=1e-300)


class TestOperandConsolidationSemantics:
    """multiply consolidates unsorted operands with the CALLER's
    duplicate_policy / zero_nan (reference multiply_sparse.hpp:187-188) —
    pin that the knobs actually reach the consolidation."""

    def test_duplicate_policy_reaches_operands(self):
        a = CooBuilder((1, 1))
        a.add((0, 0), 2.0)
        a.add((0, 0), 10.0)   # duplicate
        b = CooBuilder((1, 1))
        b.add((0, 0), 1.0)
        A, B = a.build(), b.build()
        from spsparse_tpu import DuplicatePolicy
        got_add = multiply(1.0, A, B)
        assert dict(zip(*got_add.to_lists()))[(0, 0)] == pytest.approx(12.0)
        got_first = multiply(1.0, A, B,
                             duplicate_policy=DuplicatePolicy.LEAVE_ALONE)
        assert dict(zip(*got_first.to_lists()))[(0, 0)] == pytest.approx(2.0)
        got_last = multiply(1.0, A, B,
                            duplicate_policy=DuplicatePolicy.REPLACE)
        assert dict(zip(*got_last.to_lists()))[(0, 0)] == pytest.approx(10.0)

    def test_zero_nan_reaches_operands(self):
        a = CooBuilder((1, 2))
        a.add((0, 0), np.nan)
        a.add((0, 1), 3.0)
        b = CooBuilder((2, 1))
        b.add((0, 0), 1.0)
        b.add((1, 0), 2.0)
        A, B = a.build(), b.build()
        # zero_nan=False: NaN entry participates -> NaN sum, emitted
        kept = multiply(1.0, A, B)
        assert np.isnan(dict(zip(*kept.to_lists()))[(0, 0)])
        # zero_nan=True: NaN dropped during consolidation -> clean product
        dropped = multiply(1.0, A, B, zero_nan=True)
        assert dict(zip(*dropped.to_lists()))[(0, 0)] == pytest.approx(6.0)

    def test_mv_policy_and_zero_nan(self):
        a = CooBuilder((1, 1))
        a.add((0, 0), 4.0)
        a.add((0, 0), 6.0)
        v = CooBuilder((1,))
        v.add((0,), np.nan)
        v.add((0,), 5.0)
        from spsparse_tpu import DuplicatePolicy
        # REPLACE keeps last per operand: A -> 6, V -> 5 (NaN dropped first
        # under zero_nan, so last surviving duplicate is 5)
        got = multiply_mv(1.0, a.build(), v.build(),
                          duplicate_policy=DuplicatePolicy.REPLACE,
                          zero_nan=True)
        assert dict(zip(*got.to_lists()))[(0,)] == pytest.approx(30.0)


class TestMatrixPower:
    """coo_matrix_power (scipy.sparse.linalg.matrix_power parity)."""

    def test_small_powers_vs_dense(self):
        rng = np.random.default_rng(0)
        n = 12
        D = np.where(rng.uniform(size=(n, n)) < 0.3,
                     rng.uniform(-1, 1, (n, n)), 0.0)
        ii, jj = D.nonzero()
        A = SparseCOO.from_arrays(np.stack([ii, jj], 1), D[ii, jj], (n, n))
        from spsparse_tpu.ops import coo_matrix_power
        for k in range(5):
            P = coo_matrix_power(A, k)
            np.testing.assert_allclose(np.asarray(P.to_dense()),
                                       np.linalg.matrix_power(D, k),
                                       rtol=1e-10, atol=1e-12)

    def test_f64_stays_exact_through_best_spgemm(self):
        # dense-ish f64 operand: best_spgemm must not route through the
        # f32 tiled engine (silent precision downgrade)
        rng = np.random.default_rng(1)
        n = 40
        D = np.diag(rng.uniform(3, 5, n)) + 0.3 * rng.standard_normal((n, n))
        ii, jj = D.nonzero()
        A = SparseCOO.from_arrays(np.stack([ii, jj], 1), D[ii, jj], (n, n))
        from spsparse_tpu.ops import coo_matrix_power
        P = coo_matrix_power(A, 3)
        np.testing.assert_allclose(np.asarray(P.to_dense()),
                                   np.linalg.matrix_power(D, 3),
                                   rtol=1e-10)

    def test_identity_and_errors(self):
        from spsparse_tpu.core.errors import SpSparseError
        from spsparse_tpu.ops import coo_matrix_power
        A = SparseCOO.from_arrays(np.array([[0, 1]]), np.array([2.0]),
                                  (3, 3))
        I = coo_matrix_power(A, 0)
        np.testing.assert_allclose(np.asarray(I.to_dense()), np.eye(3))
        with pytest.raises(SpSparseError):
            coo_matrix_power(A, -1)
        B = SparseCOO.from_arrays(np.array([[0, 1]]), np.array([2.0]),
                                  (3, 4))
        with pytest.raises(SpSparseError):
            coo_matrix_power(B, 2)
