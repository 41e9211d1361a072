"""Super-row window dense-block SpMM (ops.pallas_tiled_window)."""

import numpy as np
import pytest

import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.errors import SpSparseError
from spsparse_tpu.core.tiled import to_tiled
from spsparse_tpu.ops.pallas_tiled_window import (prepare_tiled_window,
                                                  spmm_tiled_window_pallas)


def _regrid(m, k, rng, spread=100):
    ncols = 2 * m
    rr = np.repeat(np.arange(m), k)
    cc = np.clip(rr * 2 + rng.integers(-spread, spread + 1, rr.size),
                 0, ncols - 1)
    b = CooBuilder((m, ncols), dtype=np.float32)
    b.add_many(np.stack([rr, cc], 1),
               rng.uniform(-1, 1, rr.size).astype(np.float32))
    return b.build()


@pytest.mark.parametrize("seed", range(2))
@pytest.mark.parametrize("group", [2, 4])
@pytest.mark.parametrize("m,k", [(1024, 6), (2000, 3)])
def test_matches_dense(seed, group, m, k):
    rng = np.random.default_rng(seed)
    A = _regrid(m, k, rng)
    prep = prepare_tiled_window(to_tiled(A), group=group,
                                dtype=jnp.float32)
    X = jnp.asarray(rng.uniform(-1, 1, (A.shape[1], 128))
                    .astype(np.float32))
    Y = spmm_tiled_window_pallas(prep, X, interpret=True)
    want = np.asarray(A.to_dense()) @ np.asarray(X)
    np.testing.assert_allclose(np.asarray(Y), want, rtol=2e-5, atol=2e-4)


def test_bf16_mode():
    rng = np.random.default_rng(3)
    A = _regrid(1024, 5, rng)
    prep = prepare_tiled_window(to_tiled(A), group=4)
    assert prep.blocks.dtype == jnp.bfloat16
    X = jnp.asarray(rng.uniform(-1, 1, (A.shape[1], 128))
                    .astype(np.float32))
    Y = spmm_tiled_window_pallas(prep, X, interpret=True)
    want = np.asarray(A.to_dense()) @ np.asarray(X)
    rel = np.abs(np.asarray(Y) - want).max() / np.abs(want).max()
    assert rel < 2e-2                    # bf16 operand precision

def test_wide_window_rejected():
    # fully scattered columns -> window spans everything -> budget error
    rng = np.random.default_rng(0)
    m = 4096
    ncols = 64 * m
    rr = np.repeat(np.arange(m), 4)
    cc = rng.integers(0, ncols, rr.size)
    b = CooBuilder((m, ncols), dtype=np.float32)
    b.add_many(np.stack([rr, cc], 1),
               rng.uniform(-1, 1, rr.size).astype(np.float32))
    with pytest.raises(SpSparseError, match="window"):
        prepare_tiled_window(to_tiled(b.build()), group=64)


def test_wide_rhs_budget_check_and_call_time_fallback():
    """ADVICE r4 (medium): the scratch is (2, ws*TILE, Np) — the budget
    must scale with the actual RHS width. A wide X that would overflow
    VMEM is (a) rejected at prepare time when the width is declared, and
    (b) silently delegated to the per-tile dense kernel at call time,
    with identical results."""
    from spsparse_tpu.ops import pallas_tiled_window as w

    rng = np.random.default_rng(7)
    A = _regrid(1024, 5, rng)
    tl = to_tiled(A)
    prep = prepare_tiled_window(tl, group=4, dtype=jnp.float32)
    # (a) declared-width prepare check: a width that blows the budget
    wide_n = (w._WINDOW_VMEM_BUDGET // (2 * prep.ws * 128 * 4) + 1) * 128
    with pytest.raises(SpSparseError, match="RHS width"):
        prepare_tiled_window(tl, group=4, dtype=jnp.float32,
                             n_cols_rhs=wide_n)
    # (b) call-time fallback: same prepared object, wide X -> per-tile
    # kernel, result still correct
    X = jnp.asarray(rng.uniform(-1, 1, (A.shape[1], 128))
                    .astype(np.float32))
    y_narrow = spmm_tiled_window_pallas(prep, X, interpret=True)
    import unittest.mock as mock
    calls = {}
    orig = w.to_tiled_dense

    def spy(p):
        calls["hit"] = True
        return orig(p)

    with mock.patch.object(w, "_WINDOW_VMEM_BUDGET", 1 << 12), \
            mock.patch.object(w, "to_tiled_dense", spy):
        y_fb = spmm_tiled_window_pallas(prep, X, interpret=True)
    assert calls.get("hit")
    np.testing.assert_allclose(np.asarray(y_fb), np.asarray(y_narrow),
                               rtol=2e-5, atol=2e-4)


def test_to_tiled_dense_reconstruction():
    from spsparse_tpu.core.tiled import to_tiled as _tt
    from spsparse_tpu.ops.pallas_tiled import (prepare_tiled_dense,
                                               spmm_tiled_dense_pallas)
    from spsparse_tpu.ops.pallas_tiled_window import to_tiled_dense

    rng = np.random.default_rng(9)
    A = _regrid(1024, 4, rng)
    tl = _tt(A)
    prep_w = prepare_tiled_window(tl, group=4, dtype=jnp.float32)
    rec = to_tiled_dense(prep_w)
    X = jnp.asarray(rng.uniform(-1, 1, (A.shape[1], 64))
                    .astype(np.float32))
    y = spmm_tiled_dense_pallas(rec, X, interpret=True)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(A.to_dense()) @ np.asarray(X),
                               rtol=2e-5, atol=2e-4)


def test_uneven_last_super_and_empty_rows():
    rng = np.random.default_rng(5)
    m = 900                              # nbr = 8, group 3 -> 3 supers
    b = CooBuilder((m, 2 * m), dtype=np.float32)
    rr = np.repeat(np.arange(0, m, 2), 2)   # half the rows empty
    cc = np.clip(rr * 2 + rng.integers(-30, 31, rr.size), 0, 2 * m - 1)
    b.add_many(np.stack([rr, cc], 1),
               rng.uniform(-1, 1, rr.size).astype(np.float32))
    A = b.build()
    prep = prepare_tiled_window(to_tiled(A), group=3, dtype=jnp.float32)
    X = jnp.asarray(rng.uniform(-1, 1, (2 * m, 128)).astype(np.float32))
    Y = spmm_tiled_window_pallas(prep, X, interpret=True)
    np.testing.assert_allclose(np.asarray(Y),
                               np.asarray(A.to_dense()) @ np.asarray(X),
                               rtol=2e-5, atol=2e-4)
