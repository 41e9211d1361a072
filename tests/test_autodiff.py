"""Autodiff through the COO pipeline (consolidate / multiply chain / MV).

The ESC formulation is built from sorts, gathers, segmented scans and
wheres — all differentiable JAX primitives — so ``jax.grad`` w.r.t.
*values* flows through the whole multiply chain with no custom VJPs
(the Pallas kernels have their own custom VJPs, tested in test_pallas).
These tests pin that against central finite differences.

No reference counterpart (a C++ template library has no autodiff).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder, DuplicatePolicy, coo_add
from spsparse_tpu.ops import multiply, multiply_mv


@pytest.fixture
def rng():
    return np.random.default_rng(13)


def mk(rng, shape, nnz, dups=True):
    b = CooBuilder(shape, dtype=np.float64)
    idx = np.stack([rng.integers(0, s, nnz) for s in shape], 1)
    if dups and nnz >= 2:
        idx[1] = idx[0]                   # guarantee at least one duplicate
    b.add_many(idx, rng.uniform(-1, 1, nnz))
    return b.build()


def check_grad(loss, v0, atol=1e-6):
    g = np.asarray(jax.grad(loss)(jnp.asarray(v0)))
    eps = 1e-6
    fd = np.zeros_like(v0)
    for i in range(len(v0)):
        vp, vm = v0.copy(), v0.copy()
        vp[i] += eps
        vm[i] -= eps
        fd[i] = (float(loss(jnp.asarray(vp)))
                 - float(loss(jnp.asarray(vm)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, atol=atol, rtol=1e-4)


class TestAutodiff:
    def test_grad_through_multiply_wrt_both_operands(self, rng):
        A, B = mk(rng, (6, 5), 10), mk(rng, (5, 7), 12)

        def loss_a(va):
            C = multiply(1.0, dataclasses.replace(A, vals=va), B,
                         expand_cap=256, cap=128)
            return jnp.sum(C.vals ** 2)

        def loss_b(vb):
            C = multiply(1.0, A, dataclasses.replace(B, vals=vb),
                         expand_cap=256, cap=128)
            return jnp.sum(C.vals ** 2)

        check_grad(loss_a, np.asarray(A.vals).copy())
        check_grad(loss_b, np.asarray(B.vals).copy())

    def test_grad_through_scaled_chain(self, rng):
        A, B = mk(rng, (5, 4), 8), mk(rng, (4, 6), 9)
        sj = CooBuilder((4,), dtype=np.float64)
        for i in range(4):
            sj.add((i,), float(rng.uniform(0.5, 1.5)))
        SJ = sj.build()

        def loss(vs):
            C = multiply(2.0, A, B,
                         scalej=dataclasses.replace(SJ, vals=vs),
                         expand_cap=256, cap=128)
            return jnp.sum(jnp.tanh(C.vals))

        check_grad(loss, np.asarray(SJ.vals).copy())

    def test_grad_through_mv(self, rng):
        A = mk(rng, (7, 5), 11)
        vb = CooBuilder((5,), dtype=np.float64)
        for i in range(5):
            vb.add((i,), float(rng.uniform(-1, 1)))
        V = vb.build()

        def loss(va):
            y = multiply_mv(1.0, dataclasses.replace(A, vals=va), V,
                            cap=32)
            return jnp.sum(y.vals ** 2)

        check_grad(loss, np.asarray(A.vals).copy())

    def test_grad_through_consolidate_policies(self, rng):
        A = mk(rng, (6, 6), 12)
        for pol in (DuplicatePolicy.ADD, DuplicatePolicy.LEAVE_ALONE,
                    DuplicatePolicy.REPLACE):
            def loss(va):
                c = dataclasses.replace(A, vals=va).consolidate(
                    (0, 1), pol, force=True)
                return jnp.sum(c.vals ** 2)

            check_grad(loss, np.asarray(A.vals).copy())

    def test_grad_through_coo_add(self, rng):
        A, B = mk(rng, (5, 5), 8), mk(rng, (5, 5), 8)

        def loss(va):
            s = coo_add(dataclasses.replace(A, vals=va), B,
                        alpha=1.5, beta=-0.5)
            return jnp.sum(s.vals ** 2)

        check_grad(loss, np.asarray(A.vals).copy())

    def test_jit_grad_composes(self, rng):
        A, B = mk(rng, (5, 4), 8), mk(rng, (4, 5), 8)
        f = jax.jit(jax.grad(lambda va: jnp.sum(multiply(
            1.0, dataclasses.replace(A, vals=va), B,
            expand_cap=128, cap=64).vals ** 2)))
        g = np.asarray(f(A.vals))
        assert np.isfinite(g).all() and (np.abs(g) > 0).any()
