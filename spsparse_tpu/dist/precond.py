"""Distributed preconditioning — partition-local block-Jacobi.

Block-Jacobi is the natural multi-chip preconditioner: with blocks aligned
inside row partitions, applying ``M^{-1}`` is an embarrassingly parallel
batched matmul — zero collectives, so it adds no latency barriers to the
CG loop (whose reductions already pay one ``psum`` each). The setup cost
(batched ``jnp.linalg.inv`` of ``bs x bs`` diagonal blocks) is paid once.

No reference counterpart (the reference is single-process and has no
solver layer); this composes :func:`spsparse_tpu.solvers.pcg_solve` with
the row distribution of :func:`spsparse_tpu.dist.partition_rows`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core.coo import SparseCOO
from ..core.errors import SpSparseError
from ..solvers.precond import extract_diag_blocks

Array = Any

__all__ = ["DistBlockJacobi", "dist_block_jacobi"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistBlockJacobi:
    """Inverted diagonal blocks, partition-major: ``inv (P, nb_local, bs,
    bs)``. Callable on a block-row-partitioned residual ``r (P,
    rows_local)`` (the layout of :func:`..dist.partition_vector`);
    application is one batched matmul, local to every partition."""

    inv: Array = dataclasses.field(metadata=dict(static=False))

    @property
    def n_parts(self) -> int:
        return self.inv.shape[0]

    @property
    def rows_local(self) -> int:
        return self.inv.shape[1] * self.inv.shape[3]

    def __call__(self, r_parts: Array) -> Array:
        P, nb, bs, _ = self.inv.shape
        rb = r_parts.reshape(P, nb, bs)
        z = jnp.einsum("pbij,pbj->pbi", self.inv,
                       rb.astype(self.inv.dtype))
        return z.reshape(P, nb * bs).astype(r_parts.dtype)


def dist_block_jacobi(a: SparseCOO, n_parts: int, *, bs: int = 128,
                      eps: float = 1e-12) -> DistBlockJacobi:
    """Build the partition-aligned block-Jacobi preconditioner for the
    block-row distribution of :func:`..dist.partition_rows` (host-side
    eager setup, like the partitioners).

    ``bs`` is clipped to ``rows_local`` and must divide it (blocks may not
    straddle partition boundaries — that would make application need a
    halo). Rows with an empty diagonal (including the padding rows of the
    last partition) get a unit diagonal, i.e. identity preconditioning —
    the same guard as the single-chip
    :func:`spsparse_tpu.solvers.block_jacobi_preconditioner`."""
    if a.rank != 2:
        raise SpSparseError("dist_block_jacobi requires a rank-2 array")
    nrows = a.shape[0]
    rows_local = -(-nrows // n_parts)
    bs = min(bs, rows_local)
    if rows_local % bs:
        raise SpSparseError(
            f"bs={bs} must divide rows_local={rows_local} (blocks cannot "
            "straddle partition boundaries)")
    n_pad = n_parts * rows_local
    blocks = extract_diag_blocks(a, bs)                 # (ceil(n/bs), ...)
    nb_total = n_pad // bs
    pad = nb_total - blocks.shape[0]
    if pad > 0:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((pad, bs, bs), blocks.dtype)], axis=0)
    d = jnp.diagonal(blocks, axis1=1, axis2=2)
    fix = (jnp.abs(d) <= eps).astype(blocks.dtype)
    blocks = blocks + jax.vmap(jnp.diag)(fix)
    inv = jnp.linalg.inv(blocks)
    return DistBlockJacobi(inv=inv.reshape(n_parts, rows_local // bs,
                                           bs, bs))
