"""Iterative solvers over sparse operators (single- and multi-chip).

The reference library stops at the multiply chain; real deployments of a
sparse framework run *iterations* of those products (conservative-regridding
pipelines, solvers). These are the end-to-end drivers used by the benchmark
harness and the multi-chip dry run: conjugate gradients and power iteration,
formulated so the matrix operator is pluggable — a local CSR/ELL SpMV or a
row-partitioned :func:`spsparse_tpu.dist.dist_spmv` under ``shard_map``.

Everything is functional and ``lax.scan``-friendly: no data-dependent
Python control flow, fixed iteration counts, carries as pytrees.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

Array = Any

__all__ = ["CGState", "cg_step", "cg_solve", "pcg_solve",
           "jacobi_preconditioner", "power_iteration"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CGState:
    x: Array = dataclasses.field(metadata=dict(static=False))
    r: Array = dataclasses.field(metadata=dict(static=False))
    p: Array = dataclasses.field(metadata=dict(static=False))
    rs: Array = dataclasses.field(metadata=dict(static=False))


def cg_step(matvec: Callable[[Array], Array], state: CGState) -> CGState:
    """One conjugate-gradient iteration for SPD ``A``.

    ``matvec`` may be a local SpMV or a distributed one; the reductions are
    plain ``jnp`` sums, which XLA turns into cross-device ``psum``s when the
    operands are sharded.
    """
    Ap = matvec(state.p)
    denom = jnp.vdot(state.p, Ap)
    alpha = state.rs / jnp.where(denom == 0, 1, denom)
    x = state.x + alpha * state.p
    r = state.r - alpha * Ap
    rs_new = jnp.vdot(r, r)
    beta = rs_new / jnp.where(state.rs == 0, 1, state.rs)
    p = r + beta * state.p
    return CGState(x=x, r=r, p=p, rs=rs_new)


def cg_solve(matvec: Callable[[Array], Array], b: Array, *, iters: int,
             x0: Array | None = None) -> tuple[Array, Array]:
    """Fixed-iteration CG; returns ``(x, final_residual_norm_sq)``."""
    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x0)
    state = CGState(x=x0, r=r0, p=r0, rs=jnp.vdot(r0, r0))

    def body(state, _):
        return cg_step(matvec, state), None

    state, _ = jax.lax.scan(body, state, None, length=iters)
    return state.x, state.rs


def pcg_solve(matvec: Callable[[Array], Array], b: Array, *, iters: int,
              minv: Array | Callable[[Array], Array] | None = None,
              x0: Array | None = None) -> tuple[Array, Array]:
    """Preconditioned CG: ``minv`` is the preconditioner application —
    either a dense vector (Jacobi: elementwise ``1/diag(A)``) or a callable
    ``z = M^{-1} r``. Falls back to plain CG when ``minv`` is None."""
    if minv is None:
        return cg_solve(matvec, b, iters=iters, x0=x0)
    apply_m = minv if callable(minv) else (lambda r: minv * r)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x0)
    z0 = apply_m(r0)
    state = (x0, r0, z0, jnp.vdot(r0, z0))

    def body(state, _):
        x, r, p, rz = state
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap)
        alpha = rz / jnp.where(denom == 0, 1, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_m(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1, rz)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, r, _, _), _ = jax.lax.scan(body, state, None, length=iters)
    return x, jnp.vdot(r, r)


def jacobi_preconditioner(diag: Array, eps: float = 1e-12) -> Array:
    """Elementwise inverse-diagonal preconditioner vector for
    :func:`pcg_solve` (guards zero diagonal entries)."""
    return jnp.where(jnp.abs(diag) > eps, 1.0 / diag, 1.0)


def power_iteration(matvec: Callable[[Array], Array], v0: Array, *,
                    iters: int) -> tuple[Array, Array]:
    """Dominant eigenpair estimate by normalized power iteration."""
    def body(v, _):
        w = matvec(v)
        nrm = jnp.sqrt(jnp.vdot(w, w))
        return w / jnp.where(nrm == 0, 1, nrm), nrm

    v, nrms = jax.lax.scan(body, v0, None, length=iters)
    lam = nrms[-1]
    return v, lam
