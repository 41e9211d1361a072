"""Rolling-window banded tiled SpGEMM (ops.spgemm_window)."""

import numpy as np
import pytest

import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.errors import SpSparseError
from spsparse_tpu.core.tiled import to_tiled
from spsparse_tpu.ops.pallas_tiled import prepare_tiled_dense
from spsparse_tpu.ops.spgemm_window import (band_to_tiled_blocks,
                                            plan_window_spgemm,
                                            spgemm_window_pallas)


def _regrid(n_dst, per, rng, jitter=3):
    """Config-4 style: c = 2r + U(0, jitter) — block-banded A A^T."""
    r = np.repeat(np.arange(n_dst), per)
    c = np.minimum(r * 2 + rng.integers(0, jitter, r.size), n_dst * 2 - 1)
    b = CooBuilder((n_dst, n_dst * 2), dtype=np.float32)
    b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
    return b.build()


def _run_aat(A, group, dtype=jnp.float32):
    prep = prepare_tiled_dense(to_tiled(A), dtype=dtype)
    plan = plan_window_spgemm(
        prep.tcols, prep.tcols, nbc=prep.nbc,
        out_shape=(A.shape[0], A.shape[0]), group=group, dtype=dtype)
    band = spgemm_window_pallas(plan, prep.blocks, interpret=True)
    return band_to_tiled_blocks(band, plan), plan


@pytest.mark.parametrize("seed", range(2))
@pytest.mark.parametrize("group", [2, 4])
@pytest.mark.parametrize("n_dst", [512, 1000])
def test_aat_matches_dense(seed, group, n_dst):
    rng = np.random.default_rng(seed)
    A = _regrid(n_dst, 4, rng)
    tb, plan = _run_aat(A, group)
    Ad = np.asarray(A.to_dense())
    np.testing.assert_allclose(np.asarray(tb.to_dense()), Ad @ Ad.T,
                               rtol=1e-5, atol=1e-5)


def test_aat_bf16_mode():
    rng = np.random.default_rng(3)
    A = _regrid(768, 4, rng)
    tb, plan = _run_aat(A, 4, dtype=jnp.bfloat16)
    Ad = np.asarray(A.to_dense())
    want = Ad @ Ad.T
    rel = np.abs(np.asarray(tb.to_dense()) - want).max() / np.abs(want).max()
    assert rel < 2e-2


def test_two_operand_abt():
    rng = np.random.default_rng(5)
    A = _regrid(512, 4, rng)
    B = _regrid(512, 3, rng)
    pa = prepare_tiled_dense(to_tiled(A), dtype=jnp.float32)
    pb = prepare_tiled_dense(to_tiled(B), dtype=jnp.float32)
    plan = plan_window_spgemm(pa.tcols, pb.tcols, nbc=pa.nbc,
                              out_shape=(512, 512), group=2,
                              dtype=jnp.float32)
    assert not plan.shared
    band = spgemm_window_pallas(plan, pa.blocks, pb.blocks, interpret=True)
    tb = band_to_tiled_blocks(band, plan)
    want = np.asarray(A.to_dense()) @ np.asarray(B.to_dense()).T
    np.testing.assert_allclose(np.asarray(tb.to_dense()), want,
                               rtol=1e-5, atol=1e-5)


def test_matches_pair_kernel_semantics():
    """Same result as the plan-order pair path (spgemm_tiled_xla)."""
    from spsparse_tpu.ops.spgemm_tiled import (densify_tiled,
                                               plan_tiled_spgemm,
                                               spgemm_tiled_xla)
    rng = np.random.default_rng(7)
    A = _regrid(640, 4, rng)
    ta = densify_tiled(to_tiled(A))
    pplan = plan_tiled_spgemm(ta, ta, transpose_b=True)
    ref = spgemm_tiled_xla(ta, ta, pplan).to_dense()
    tb, _ = _run_aat(A, 4)
    np.testing.assert_allclose(np.asarray(tb.to_dense()), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_spgemm_tiled_auto_routes_window():
    """spgemm_tiled(A, A, transpose_b=True) on a banded product routes
    through the window kernel (round-5 auto-routing) with results
    matching the pair path; an unbanded product silently falls back."""
    from spsparse_tpu.ops.spgemm_tiled import spgemm_tiled
    import spsparse_tpu.ops.spgemm_window as wmod
    import unittest.mock as mock

    rng = np.random.default_rng(13)
    A = _regrid(640, 4, rng)
    calls = {}
    orig = wmod.spgemm_window_pallas

    def spy(*a, **k):
        calls["window"] = calls.get("window", 0) + 1
        return orig(*a, **k)

    with mock.patch.object(wmod, "spgemm_window_pallas", spy):
        C = spgemm_tiled(A, A, transpose_b=True, interpret=True,
                         use_window=True)
    assert calls.get("window") == 1
    Ad = np.asarray(A.to_dense())
    np.testing.assert_allclose(np.asarray(C.to_dense()), Ad @ Ad.T,
                               rtol=1e-5, atol=1e-5)
    # unbanded: falls back to the pair kernel without error
    r = np.repeat(np.arange(1024), 2)
    c = rng.integers(0, 64 * 1024, r.size)
    b2 = CooBuilder((1024, 64 * 1024), dtype=np.float32)
    b2.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
    B = b2.build()
    C2 = spgemm_tiled(B, B, transpose_b=True, interpret=True,
                      use_window=True, use_pallas=False)
    Bd = np.asarray(B.to_dense())
    np.testing.assert_allclose(np.asarray(C2.to_dense()), Bd @ Bd.T,
                               rtol=1e-4, atol=1e-4)


def test_irregular_row_lengths():
    """Config-4 round-5 matrix family: zipf-mixture row lengths with
    regridding column locality — the window plan must adapt (pmax_band
    from data) and match dense."""
    rng = np.random.default_rng(17)
    n = 1024
    k = np.minimum(rng.zipf(2.0, n), 24)
    r = np.repeat(np.arange(n), k)
    c = np.minimum(r * 2 + rng.integers(0, 3 + (np.repeat(k, k) > 8) * 5),
                   2 * n - 1)
    b = CooBuilder((n, 2 * n), dtype=np.float32)
    b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
    A = b.build()
    tb, plan = _run_aat(A, 4)
    Ad = np.asarray(A.to_dense())
    np.testing.assert_allclose(np.asarray(tb.to_dense()), Ad @ Ad.T,
                               rtol=1e-5, atol=1e-4)
    assert max(plan.pmax_band) >= 2


def test_unbanded_rejected():
    """Scattered pair structure (wide band) must raise at plan time."""
    rng = np.random.default_rng(9)
    n = 4096
    r = np.repeat(np.arange(n), 2)
    c = rng.integers(0, 2 * n, r.size)   # random columns -> full band
    b = CooBuilder((n, 2 * n), dtype=np.float32)
    b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
    prep = prepare_tiled_dense(to_tiled(b.build()), dtype=jnp.float32)
    with pytest.raises(SpSparseError, match="window|pairs"):
        plan_window_spgemm(prep.tcols, prep.tcols, nbc=prep.nbc,
                           out_shape=(n, n), group=16)


def test_empty_rows_and_uneven_groups():
    rng = np.random.default_rng(11)
    n = 900                 # nbr = 8, group 3 -> uneven last group
    r = np.repeat(np.arange(0, n, 2), 2)     # half the rows empty
    c = np.minimum(r * 2 + rng.integers(0, 3, r.size), 2 * n - 1)
    b = CooBuilder((n, 2 * n), dtype=np.float32)
    b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
    A = b.build()
    tb, _ = _run_aat(A, 3)
    Ad = np.asarray(A.to_dense())
    np.testing.assert_allclose(np.asarray(tb.to_dense()), Ad @ Ad.T,
                               rtol=1e-5, atol=1e-5)
