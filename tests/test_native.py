"""Native host runtime vs the JAX core: identical consolidate semantics."""

import os
import numpy as np
import pytest

from spsparse_tpu import CooBuilder, DuplicatePolicy, consolidate
from spsparse_tpu import native


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def random_case(rng, n, shape):
    idx = np.stack([rng.integers(0, s, n) for s in shape], axis=1)
    vals = rng.uniform(-1, 1, n)
    vals[rng.uniform(size=n) < 0.1] = 0.0  # sprinkle structural zeros
    return idx, vals


POLICIES = [DuplicatePolicy.ADD, DuplicatePolicy.LEAVE_ALONE,
            DuplicatePolicy.REPLACE]


class TestNativeConsolidate:
    @pytest.mark.parametrize("policy", POLICIES)
    @pytest.mark.parametrize("order", [(0, 1), (1, 0)])
    def test_matches_jax_core(self, have_native, rng, policy, order):
        shape = (13, 9)
        idx, vals = random_case(rng, 200, shape)
        out_idx, out_vals = native.consolidate_host(
            idx, vals, shape, order, policy)
        b = CooBuilder(shape, dtype=np.float64)
        b.add_many(idx, vals)
        ref = consolidate(b.build(), order, policy)
        ridx, rvals = ref.to_lists()
        np.testing.assert_array_equal(out_idx, np.asarray(ridx, np.int64))
        # The JAX merge evaluates ADD sums as prefix-sum differences
        # (merge_sorted_entries(method="compact")); the C++ host path sums
        # per run left-to-right, so agreement is O(n*eps) relative, not
        # bitwise.
        np.testing.assert_allclose(out_vals, rvals, rtol=1e-10)

    @pytest.mark.parametrize("policy", POLICIES)
    def test_matches_numpy_fallback(self, have_native, rng, policy):
        shape = (11, 7)
        idx, vals = random_case(rng, 150, shape)
        a = native.consolidate_host(idx, vals, shape, (0, 1), policy)
        b = native._numpy_consolidate(idx.astype(np.int64),
                                      vals.astype(np.float64), shape,
                                      (0, 1), policy, False)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_allclose(a[1], b[1], rtol=1e-15)

    def test_zero_nan(self, have_native):
        idx = np.array([[0], [1], [1], [2]])
        vals = np.array([np.nan, 2.0, np.nan, 0.0])
        oi, ov = native.consolidate_host(idx, vals, (4,), (0,),
                                         DuplicatePolicy.ADD, zero_nan=True)
        np.testing.assert_array_equal(oi, [[1]])
        np.testing.assert_allclose(ov, [2.0])
        oi, ov = native.consolidate_host(idx, vals, (4,), (0,),
                                         DuplicatePolicy.ADD, zero_nan=False)
        assert oi.shape[0] == 2  # NaNs kept, zero dropped
        assert np.isnan(ov[0])

    def test_stability_first_last(self, have_native):
        idx = np.array([[1, 2], [1, 2], [0, 0], [1, 2]])
        vals = np.array([10.0, 20.0, 1.0, 30.0])
        _, first = native.consolidate_host(idx, vals, (2, 4), (0, 1),
                                           DuplicatePolicy.LEAVE_ALONE)
        np.testing.assert_allclose(first, [1.0, 10.0])
        _, last = native.consolidate_host(idx, vals, (2, 4), (0, 1),
                                          DuplicatePolicy.REPLACE)
        np.testing.assert_allclose(last, [1.0, 30.0])

    def test_large_multithreaded(self, have_native, rng):
        shape = (1000, 1000)
        idx, vals = random_case(rng, 200_000, shape)
        oi1, ov1 = native.consolidate_host(idx, vals, shape, (0, 1),
                                           DuplicatePolicy.ADD, n_threads=4)
        oi2, ov2 = native._numpy_consolidate(
            idx.astype(np.int64), vals.astype(np.float64), shape, (0, 1),
            DuplicatePolicy.ADD, False)
        np.testing.assert_array_equal(oi1, oi2)
        np.testing.assert_allclose(ov1, ov2, rtol=1e-12)


class TestNativeHelpers:
    def test_dim_beginnings(self, have_native):
        lead = np.array([0, 0, 1, 1, 1, 6])
        begins, rows = native.dim_beginnings_host(lead)
        np.testing.assert_array_equal(begins, [0, 2, 5, 6])
        np.testing.assert_array_equal(rows, [0, 1, 6])

    def test_csr_row_ptr(self, have_native):
        rows = np.array([0, 0, 2, 2, 2, 4])
        ptr = native.csr_row_ptr_host(rows, 5)
        np.testing.assert_array_equal(ptr, [0, 2, 2, 5, 5, 6])

    def test_check_bounds(self, have_native):
        idx = np.array([[0, 1], [2, 3], [1, 9]])
        assert native.check_bounds_host(idx, (3, 4)) == 2
        assert native.check_bounds_host(idx[:2], (3, 4)) == -1


class TestWheelPackaging:
    """setup.py ships the native library inside the wheel
    (spsparse_tpu/native/_spsparse_host*.so) and the loader prefers it."""

    def test_find_so_prefers_packaged_ext(self, tmp_path, monkeypatch):
        import glob as _glob
        fake = str(tmp_path / "_spsparse_host.cpython-312-x86_64.so")
        monkeypatch.setattr(
            _glob, "glob", lambda pat: [fake] if "_spsparse_host" in pat
            else [])
        assert native._find_so() == fake

    def test_find_so_falls_back_to_csrc(self, monkeypatch):
        import glob as _glob
        monkeypatch.setattr(_glob, "glob", lambda pat: [])
        assert native._find_so() == native._SO

    @pytest.mark.slow
    def test_wheel_contains_native_so(self, tmp_path):
        import subprocess
        import sys
        import zipfile
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable, "-m", "pip", "wheel", "--no-deps",
             "--no-build-isolation", repo, "-w", str(tmp_path)],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        (whl,) = tmp_path.glob("*.whl")
        names = zipfile.ZipFile(whl).namelist()
        assert any(n.startswith("spsparse_tpu/native/_spsparse_host")
                   and n.endswith(".so") for n in names), names
