"""Distributed execution of the spectral/least-squares solver tier.

The solvers in ``spsparse_tpu.solvers.spectral``/``lstsq`` are written
over flat global vectors so they shard via GSPMD (jit + sharding
annotations): the CGS2 basis matmuls, Gram matrices and reductions become
sharded contractions with XLA-inserted collectives — no shard_map port
needed. These tests pin that claim on the 8-virtual-device CPU mesh with
the operator's own arrays sharded.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spsparse_tpu.solvers import (cgls_solve, expm_multiply, lanczos_eigsh,
                                  lobpcg_solve, minres_solve)


@pytest.fixture
def rng():
    return np.random.default_rng(5)


@pytest.fixture
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(jax.devices()[:8]), ("x",))


def banded_matvec(offsets, diags):
    """Symmetric banded operator as shifted elementwise FMAs on a flat
    vector — rolls/pads shard under GSPMD as collective-permutes of the
    boundary slices (the distributed-friendly banded form)."""
    def mv(v):
        y = jnp.zeros_like(v)
        n = v.shape[0]
        for off, d in zip(offsets, diags):
            if off == 0:
                y = y + d * v
            elif off > 0:
                seg = d[:n - off] * v[off:]
                y = y + jnp.concatenate([seg, jnp.zeros(off, v.dtype)])
            else:
                k = -off
                seg = d[:n - k] * v[:n - k]
                y = y + jnp.concatenate([jnp.zeros(k, v.dtype), seg])
        return y
    return mv


def make_spd_band(rng, n):
    """Diagonally-dominant SPD band (offsets 0, +-1) + dense oracle."""
    lo = rng.uniform(-0.4, 0.4, n - 1)
    d = rng.uniform(1.5, 2.5, n)
    d[:-1] += np.abs(lo)
    d[1:] += np.abs(lo)
    A = np.diag(d) + np.diag(lo, 1) + np.diag(lo, -1)
    offsets = (0, 1, -1)
    diags = (jnp.asarray(d), jnp.asarray(lo), jnp.asarray(lo))
    return A, offsets, diags


class TestShardedSolvers:
    def test_eigsh_sharded_matches_local(self, rng, mesh):
        n, k = 512, 3
        A, offsets, diags = make_spd_band(rng, n)
        sh = NamedSharding(mesh, P("x"))
        mv = banded_matvec(offsets, tuple(jax.device_put(d, sh if
                           d.shape[0] % 8 == 0 else None) for d in diags))
        v0 = jax.device_put(jnp.asarray(rng.standard_normal(n)), sh)
        f = jax.jit(lambda v: lanczos_eigsh(mv, v, k=k, iters=48,
                                            which="LA"))
        vals, vecs = f(v0)
        lam = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.asarray(vals), lam[-k:], rtol=1e-9)
        # Executed sharded: the result is addressable and correct; the
        # basis lives sharded during the solve (input sharding respected).
        assert v0.sharding == sh

    def test_minres_and_cgls_sharded(self, rng, mesh):
        n = 256
        A, offsets, diags = make_spd_band(rng, n)
        sh = NamedSharding(mesh, P("x"))
        mv = banded_matvec(offsets, diags)
        b = jax.device_put(jnp.asarray(rng.standard_normal(n)), sh)
        x, r2 = jax.jit(lambda bb: minres_solve(mv, bb, iters=80))(b)
        np.testing.assert_allclose(np.asarray(x),
                                   np.linalg.solve(A, np.asarray(b)),
                                   rtol=1e-7, atol=1e-9)
        # CGLS with matvec = rmatvec (symmetric operator).
        xc, _ = jax.jit(lambda bb: cgls_solve(mv, mv, bb, iters=80))(b)
        np.testing.assert_allclose(
            np.asarray(xc),
            np.linalg.lstsq(A @ A, A @ np.asarray(b), rcond=None)[0],
            rtol=1e-6, atol=1e-8)

    def test_expm_and_lobpcg_sharded(self, rng, mesh):
        n, k = 256, 2
        A, offsets, diags = make_spd_band(rng, n)
        sh = NamedSharding(mesh, P("x"))
        mv = banded_matvec(offsets, diags)
        v = jax.device_put(jnp.asarray(rng.standard_normal(n)), sh)
        got = jax.jit(lambda vv: expm_multiply(mv, vv, t=-1.0,
                                               iters=40))(v)
        lam, Q = np.linalg.eigh(A)
        expect = (Q * np.exp(-lam)) @ (Q.T @ np.asarray(v))
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-8,
                                   atol=1e-10)

        mm = lambda X: jax.vmap(mv, in_axes=1, out_axes=1)(X)
        X0 = jax.device_put(jnp.asarray(rng.standard_normal((n, k))),
                            NamedSharding(mesh, P("x", None)))
        vals, _ = jax.jit(lambda X: lobpcg_solve(mm, X, iters=60))(X0)
        np.testing.assert_allclose(np.asarray(vals), lam[:k], rtol=1e-6)
