"""Static-pattern planned ESC SpGEMM (ops.spgemm_planned)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.ops.spgemm_planned import (plan_esc, spgemm_planned,
                                             spgemm_planned_vals)


def _rand(rng, shape, nnz, dtype=np.float64):
    b = CooBuilder(shape, dtype=dtype)
    idx = np.stack([rng.integers(0, shape[0], nnz),
                    rng.integers(0, shape[1], nnz)], 1)
    b.add_many(idx, rng.uniform(-1, 1, nnz))
    return b.build()


class TestPlannedEsc:
    @pytest.mark.parametrize("seed", range(5))
    def test_matches_dense(self, seed):
        rng = np.random.default_rng(seed)
        A = _rand(rng, (17, 23), 60)
        B = _rand(rng, (23, 19), 55)
        plan, acon, bcon = plan_esc(A, B)
        C = spgemm_planned(plan, acon.vals, bcon.vals)
        want = np.asarray(A.to_dense()) @ np.asarray(B.to_dense())
        np.testing.assert_allclose(np.asarray(C.to_dense()), want,
                                   rtol=1e-12, atol=1e-12)

    @pytest.mark.parametrize("seed", range(3))
    def test_aat_transpose_b(self, seed):
        rng = np.random.default_rng(100 + seed)
        A = _rand(rng, (20, 30), 70)
        plan, acon, bcon = plan_esc(A, A, transpose_b=True)
        C = spgemm_planned(plan, acon.vals, bcon.vals)
        Ad = np.asarray(A.to_dense())
        np.testing.assert_allclose(np.asarray(C.to_dense()), Ad @ Ad.T,
                                   rtol=1e-12, atol=1e-12)

    def test_value_updates_reuse_plan(self, rng):
        """The point of the plan: new values, same pattern, no re-plan —
        and the jitted apply retraces nothing."""
        A = _rand(rng, (15, 15), 40)
        B = _rand(rng, (15, 15), 40)
        plan, acon, bcon = plan_esc(A, B)
        traces = {"n": 0}
        f = jax.jit(lambda p, va, vb: spgemm_planned_vals(p, va, vb))
        for it in range(3):
            va = acon.vals * (1.0 + it)
            vb = bcon.vals * (2.0 - it)
            got = spgemm_planned(plan, va, vb)
            Ad = np.asarray(acon.to_dense()) * (1.0 + it)
            Bd = np.asarray(bcon.to_dense()) * (2.0 - it)
            np.testing.assert_allclose(np.asarray(got.to_dense()),
                                       Ad @ Bd, rtol=1e-12, atol=1e-12)

    def test_zero_sums_retained_documented_divergence(self):
        """Planned path keeps exact-zero cells (static pattern); the ESC
        path drops them — pinned as the documented divergence."""
        from spsparse_tpu.ops.spgemm import spgemm
        b = CooBuilder((2, 2), dtype=np.float64)
        b.add((0, 0), 1.0)
        b.add((0, 1), 1.0)
        A = b.build()
        b2 = CooBuilder((2, 2), dtype=np.float64)
        b2.add((0, 0), 1.0)
        b2.add((1, 0), -1.0)         # A @ B -> cell (0,0) sums to 0
        B = b2.build()
        plan, acon, bcon = plan_esc(A, B)
        C = spgemm_planned(plan, acon.vals, bcon.vals)
        assert int(C.nnz) == 1       # the zero cell is present...
        assert float(C.vals[0]) == 0.0
        C_esc = spgemm(A, B)
        assert int(C_esc.nnz) == 0   # ...while ESC drops it

    def test_empty_operand(self):
        A = CooBuilder((4, 5), dtype=np.float64).build()
        B = _rand(np.random.default_rng(0), (5, 6), 10)
        plan, acon, bcon = plan_esc(A, B)
        assert plan.n_products == 0
        C = spgemm_planned(plan, acon.vals, bcon.vals)
        assert int(C.nnz) == 0

    def test_accumulation_order_matches_esc(self, rng):
        """Within-cell ascending-k accumulation — bitwise-comparable to
        the ESC path's stable-sorted sums for f64 inputs."""
        from spsparse_tpu.ops.spgemm import spgemm
        A = _rand(rng, (9, 11), 50)
        B = _rand(rng, (11, 9), 50)
        plan, acon, bcon = plan_esc(A, B)
        C_pl = spgemm_planned(plan, acon.vals, bcon.vals)
        C_es = spgemm(A, B)
        np.testing.assert_allclose(np.asarray(C_pl.to_dense()),
                                   np.asarray(C_es.to_dense()),
                                   rtol=1e-13, atol=1e-14)


class TestHostPlan:
    """plan_esc(host=True): native/numpy consolidate at plan time —
    identical plan structure to the device-consolidate path."""

    @pytest.mark.parametrize("seed", range(3))
    def test_host_plan_matches_device_plan(self, seed):
        rng = np.random.default_rng(200 + seed)
        A = _rand(rng, (17, 23), 90)   # dense enough for duplicates
        B = _rand(rng, (23, 19), 80)
        ph, ah, bh = plan_esc(A, B, host=True)
        pdev, ad, bd = plan_esc(A, B)
        for f in ("ea", "eb", "seg", "out_indices"):
            np.testing.assert_array_equal(np.asarray(getattr(ph, f)),
                                          np.asarray(getattr(pdev, f)), f)
        assert ph.n_out == pdev.n_out
        # consolidated patterns agree; values up to fp summation order
        na = int(ah.nnz)
        assert na == int(ad.nnz)
        np.testing.assert_array_equal(np.asarray(ah.indices[:na]),
                                      np.asarray(ad.indices[:na]))
        np.testing.assert_allclose(np.asarray(ah.vals[:na]),
                                   np.asarray(ad.vals[:na]), rtol=1e-13)

    def test_host_plan_matches_dense(self, rng):
        A = _rand(rng, (21, 13), 70)
        B = _rand(rng, (13, 18), 60)
        plan, acon, bcon = plan_esc(A, B, host=True)
        C = spgemm_planned(plan, acon.vals, bcon.vals)
        want = np.asarray(A.to_dense()) @ np.asarray(B.to_dense())
        np.testing.assert_allclose(np.asarray(C.to_dense()), want,
                                   rtol=1e-12, atol=1e-12)

    def test_host_plan_transposes(self, rng):
        A = _rand(rng, (12, 16), 50)
        plan, acon, bcon = plan_esc(A, A, transpose_b=True, host=True)
        C = spgemm_planned(plan, acon.vals, bcon.vals)
        Ad = np.asarray(A.to_dense())
        np.testing.assert_allclose(np.asarray(C.to_dense()), Ad @ Ad.T,
                                   rtol=1e-12, atol=1e-12)
