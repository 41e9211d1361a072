"""Hypothesis property-based differential tests (ROADMAP item 12).

The seeded sweeps in test_multiply.py pin the reference's own 5x5
configuration (test_multiply_sparse.cpp:84-136) across 999 seeds; these
properties instead let hypothesis explore the *structural* space — shapes,
ranks, duplicate patterns, transposes, scale presence — and shrink any
counterexample to a minimal case. Oracles are dense numpy.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from spsparse_tpu import CooBuilder, DuplicatePolicy
from spsparse_tpu.core.consolidate import consolidate
from spsparse_tpu.ops import multiply, multiply_mv

# Shared knobs: JAX recompiles per shape, so keep example counts modest;
# deadline=None because first-example compiles dominate wall time.
PROP = settings(max_examples=25, deadline=None)


@st.composite
def coo_case(draw, max_dim=7, rank=2, allow_empty=True):
    shape = tuple(draw(st.integers(1, max_dim)) for _ in range(rank))
    n_max = 2 * int(np.prod(shape))
    n = draw(st.integers(0 if allow_empty else 1, n_max))
    idx = np.array([[draw(st.integers(0, s - 1)) for s in shape]
                    for _ in range(n)], np.int64).reshape(n, rank)
    vals = np.array([draw(st.floats(-2, 2, allow_nan=False, width=32))
                     for _ in range(n)], np.float64)
    return shape, idx, vals


def build(shape, idx, vals):
    b = CooBuilder(shape, dtype=np.float64)
    if len(vals):
        b.add_many(idx, vals)
    return b.build()


def scale_vector(draw_vals, n):
    b = CooBuilder((n,), dtype=np.float64)
    b.add_many(np.arange(n)[:, None], draw_vals)
    return b.build()


@pytest.mark.slow
class TestMultiplyChainProperties:
    """Marked slow: every hypothesis example has fresh shapes -> fresh XLA
    compiles (~2 min for the class); the nightly lane runs it, the fast
    lane keeps the consolidate-law properties below."""

    @PROP
    @given(a=coo_case(), b=coo_case(), ta=st.booleans(), tb=st.booleans(),
           cscale=st.floats(-3, 3, allow_nan=False),
           data=st.data())
    def test_full_chain_matches_dense(self, a, b, ta, tb, cscale, data):
        """C·diag(si)·A'·diag(sj)·B'·diag(sk) == the dense product, for any
        shapes/duplicates/transposes, with all scale rows present (the
        missing-row skip semantics have their own pinned tests)."""
        (sa, ia, va), (sb0, ib, vb) = a, b
        A = build(sa, ia, va)
        inner = sa[0] if ta else sa[1]
        # Regenerate B with a compatible inner dimension.
        m_out = sa[1] if ta else sa[0]
        sb = (sb0[0], inner) if tb else (inner, sb0[1])
        ib = np.stack([np.minimum(ib[:, 0], sb[0] - 1),
                       np.minimum(ib[:, 1], sb[1] - 1)], 1)
        B = build(sb, ib, vb)
        n_out = sb[0] if tb else sb[1]

        si = np.array([data.draw(st.floats(-2, 2, allow_nan=False))
                       for _ in range(m_out)])
        sj = np.array([data.draw(st.floats(-2, 2, allow_nan=False))
                       for _ in range(inner)])
        sk = np.array([data.draw(st.floats(-2, 2, allow_nan=False))
                       for _ in range(n_out)])

        C = multiply(cscale, A, B, transpose_a=ta, transpose_b=tb,
                     scalei=scale_vector(si, m_out),
                     scalej=scale_vector(sj, inner),
                     scalek=scale_vector(sk, n_out))
        Ad = np.asarray(A.to_dense())
        Bd = np.asarray(B.to_dense())
        Ad = Ad.T if ta else Ad
        Bd = Bd.T if tb else Bd
        expect = cscale * (np.diag(si) @ Ad @ np.diag(sj) @ Bd @ np.diag(sk))
        np.testing.assert_allclose(np.asarray(C.to_dense()), expect,
                                   rtol=1e-10, atol=1e-12)

    @PROP
    @given(a=coo_case(), v=coo_case(rank=1), ta=st.booleans())
    def test_mv_matches_dense(self, a, v, ta):
        (sa, ia, va), (sv0, iv, vv) = a, v
        A = build(sa, ia, va)
        inner = sa[0] if ta else sa[1]
        iv = np.minimum(iv, inner - 1)
        V = build((inner,), iv, vv)
        y = multiply_mv(1.0, A, V, transpose_a=ta)
        Ad = np.asarray(A.to_dense())
        Ad = Ad.T if ta else Ad
        np.testing.assert_allclose(np.asarray(y.to_dense()),
                                   Ad @ np.asarray(V.to_dense()),
                                   rtol=1e-10, atol=1e-12)

    @PROP
    @given(a=coo_case(max_dim=6), b=coo_case(max_dim=6))
    def test_ab_equals_btat_transposed(self, a, b):
        """(B^T A^T)^T == A B — the reference's own documented identity
        (multiply_sparse.hpp:14-18) — over arbitrary rectangular shapes."""
        (sa, ia, va), (sb0, ib, vb) = a, b
        A = build(sa, ia, va)
        sb = (sa[1], sb0[1])
        ib = np.stack([np.minimum(ib[:, 0], sb[0] - 1),
                       np.minimum(ib[:, 1], sb[1] - 1)], 1)
        B = build(sb, ib, vb)
        AB = multiply(1.0, A, B)
        BtAt = multiply(1.0, B, A, transpose_a=True, transpose_b=True)
        np.testing.assert_allclose(np.asarray(AB.to_dense()),
                                   np.asarray(BtAt.to_dense()).T,
                                   rtol=1e-10, atol=1e-12)


class TestConsolidateProperties:
    @PROP
    @given(a=coo_case(max_dim=6, rank=3),
           policy=st.sampled_from(list(DuplicatePolicy)),
           zero_nan=st.booleans())
    def test_idempotent(self, a, policy, zero_nan):
        """consolidate(consolidate(x)) == consolidate(x) under any policy —
        the second pass sees no duplicates, zeros, or NaNs to act on (for
        ADD, sums that landed on 0.0 are kept, so re-consolidating with
        zero-drop CAN remove them; assert on the policy-stable pair)."""
        shape, idx, vals = a
        A = build(shape, idx, vals)
        c1 = consolidate(A, None, policy, zero_nan)
        c2 = consolidate(c1, None, policy, zero_nan)
        i1, v1 = c1.to_lists()
        i2, v2 = c2.to_lists()
        if policy is DuplicatePolicy.ADD:
            # exact-zero ADD sums are kept by pass 1 and dropped by pass 2;
            # filter them from the comparison (reference algorithm.hpp:287
            # semantics, pinned in test_core).
            keep = [k for k, val in enumerate(v1) if val != 0]
            i1 = [i1[k] for k in keep]
            v1 = [v1[k] for k in keep]
        assert i2 == i1
        np.testing.assert_array_equal(v2, v1)

    @PROP
    @given(a=coo_case(max_dim=6, rank=2))
    def test_transpose_involution(self, a):
        shape, idx, vals = a
        A = build(shape, idx, vals)
        T2 = A.transposed((1, 0)).transposed((1, 0))
        np.testing.assert_array_equal(np.asarray(T2.to_dense()),
                                      np.asarray(A.to_dense()))

    @PROP
    @given(a=coo_case(max_dim=8, rank=2))
    def test_pack_columns_preserves_products(self, a):
        from spsparse_tpu.core.tiled import pack_columns, to_tiled
        from spsparse_tpu.ops.tiled_ops import spmm_tiled
        shape, idx, vals = a
        A = build(shape, idx, vals)
        Ap, order = pack_columns(A)
        X = np.linspace(-1, 1, shape[1] * 3).reshape(shape[1], 3)
        Y = spmm_tiled(to_tiled(Ap), jnp.asarray(X)[np.asarray(order)])
        np.testing.assert_allclose(np.asarray(Y),
                                   np.asarray(A.to_dense()) @ X,
                                   rtol=1e-5, atol=1e-5)


class TestRound3Properties:
    """Stacking / permutation / norm laws for the round-3 surface."""

    @given(a=coo_case(max_dim=6), b=coo_case(max_dim=6),
           mode=st.sampled_from(["h", "v", "d"]))
    @settings(max_examples=40, deadline=None)
    def test_stacking_matches_dense(self, a, b, mode):
        from spsparse_tpu import coo_block_diag, coo_hstack, coo_vstack
        sa, ia, va = a
        sb, ib, vb = b
        if mode == "h":
            sb = (sa[0], sb[1])
        elif mode == "v":
            sb = (sb[0], sa[1])
        ib = np.minimum(ib, np.asarray(sb) - 1).reshape(len(vb), 2)
        A, B = build(sa, ia, va), build(sb, ib, vb)
        Ad, Bd = np.asarray(A.to_dense()), np.asarray(B.to_dense())
        if mode == "h":
            got = coo_hstack(A, B)
            expect = np.concatenate([Ad, Bd], axis=1)
        elif mode == "v":
            got = coo_vstack(A, B)
            expect = np.concatenate([Ad, Bd], axis=0)
        else:
            got = coo_block_diag(A, B)
            expect = np.zeros((sa[0] + sb[0], sa[1] + sb[1]))
            expect[:sa[0], :sa[1]] = Ad
            expect[sa[0]:, sa[1]:] = Bd
        np.testing.assert_allclose(np.asarray(got.to_dense()), expect,
                                   rtol=1e-12)

    @given(a=coo_case(max_dim=6), seed=st.integers(0, 2**31 - 1))
    @settings(max_examples=40, deadline=None)
    def test_permute_matches_dense_and_inverts(self, a, seed):
        from spsparse_tpu import coo_permute
        sa, ia, va = a
        A = build(sa, ia, va)
        rng = np.random.default_rng(seed)
        rp = rng.permutation(sa[0])
        cp = rng.permutation(sa[1])
        B = coo_permute(A, jnp.asarray(rp), jnp.asarray(cp))
        Ad = np.asarray(A.to_dense())
        np.testing.assert_allclose(np.asarray(B.to_dense()),
                                   Ad[np.ix_(rp, cp)], rtol=1e-12)
        # Applying the inverse permutations restores the original.
        irp = np.argsort(rp)
        icp = np.argsort(cp)
        C = coo_permute(B, jnp.asarray(irp), jnp.asarray(icp))
        np.testing.assert_allclose(np.asarray(C.to_dense()), Ad,
                                   rtol=1e-12)

    @given(a=coo_case(max_dim=6))
    @settings(max_examples=40, deadline=None)
    def test_norms_match_dense(self, a):
        from spsparse_tpu import coo_norm
        sa, ia, va = a
        A = build(sa, ia, va).consolidate((0, 1))
        Ad = np.asarray(A.to_dense())
        np.testing.assert_allclose(float(coo_norm(A, "fro")),
                                   np.linalg.norm(Ad, "fro"),
                                   rtol=1e-12, atol=1e-300)
        np.testing.assert_allclose(
            float(coo_norm(A, 1)),
            np.abs(Ad).sum(0).max() if Ad.size else 0.0,
            rtol=1e-12, atol=1e-300)
        np.testing.assert_allclose(
            float(coo_norm(A, jnp.inf)),
            np.abs(Ad).sum(1).max() if Ad.size else 0.0,
            rtol=1e-12, atol=1e-300)

    @given(a=coo_case(max_dim=6, allow_empty=False))
    @settings(max_examples=20, deadline=None)
    def test_csc_is_transposed_csr(self, a):
        from spsparse_tpu import to_csc
        from spsparse_tpu.ops.spmm import spmv
        sa, ia, va = a
        A = build(sa, ia, va)
        Ad = np.asarray(A.to_dense())
        u = np.linspace(-1, 1, sa[0])
        got = np.asarray(spmv(to_csc(A), jnp.asarray(u)))
        np.testing.assert_allclose(got, Ad.T @ u, rtol=1e-12, atol=1e-12)
