"""``LinearOperator`` — composable matrix-free operators over any sparse
format (the ``scipy.sparse.linalg.LinearOperator`` capability).

Every solver in this package takes a ``matvec`` callable; this class
makes those callables *algebra*: operators compose with ``@``, combine
with ``+``/``-``/scalar ``*``, and transpose with ``.T`` — so a
regridding normal-equations solve is literally

    R = aslinearoperator(prepare_general(A))      # fastest kernel route
    N = R.T @ R + damp**2 * identity(R.shape[1])
    x, _ = cg_solve(N, rhs, iters=...)

(``LinearOperator.__call__`` is ``matvec``, so an operator drops
directly into ``cg_solve``/``minres_solve``/``lanczos_eigsh``/... , and
``(op.matvec, op.rmatvec)`` into the least-squares pair solvers.)

Host/device split: construction is host-side Python (choosing kernels,
building transpose views once); application is whatever jitted kernel
the wrapped format dispatches to (``ops.best_spmv``/``best_spmm``) — an
operator used inside ``jit`` traces only device code.

No reference counterpart (citibeth/spsparse has no operator layer).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.coo import SparseCOO
from ..core.dia import SparseDIA
from ..core.errors import SpSparseError
from ..core.structure import SparseCSR, SparseELL, to_csc, to_csr

Array = jax.Array

__all__ = ["LinearOperator", "aslinearoperator", "identity_operator"]


class LinearOperator:
    """A shaped pair of ``matvec``/``rmatvec`` callables with operator
    algebra. ``matmat`` defaults to a column ``vmap`` of ``matvec``
    (overridable with a true multi-RHS kernel)."""

    def __init__(self, shape, matvec: Callable[[Array], Array],
                 rmatvec: Callable[[Array], Array] | None = None,
                 matmat: Callable[[Array], Array] | None = None):
        if len(shape) != 2:
            raise SpSparseError(f"LinearOperator shape must be (m, n), "
                                f"got {shape}")
        self.shape = (int(shape[0]), int(shape[1]))
        self._mv = matvec
        self._rmv = rmatvec
        self._mm = matmat

    # -- application ----------------------------------------------------
    def matvec(self, x: Array) -> Array:
        return self._mv(x)

    __call__ = matvec          # drops straight into cg_solve(minv=...) etc.

    def rmatvec(self, u: Array) -> Array:
        if self._rmv is None:
            raise SpSparseError(
                "this LinearOperator has no rmatvec (transpose product); "
                "construct it from a COO/CSR operand or pass rmatvec=")
        return self._rmv(u)

    def matmat(self, X: Array) -> Array:
        if self._mm is not None:
            return self._mm(X)
        return jax.vmap(self._mv, in_axes=1, out_axes=1)(X)

    # -- algebra ---------------------------------------------------------
    @property
    def T(self) -> "LinearOperator":
        if self._rmv is None:
            raise SpSparseError("transpose needs rmatvec; see rmatvec()")
        return LinearOperator((self.shape[1], self.shape[0]),
                              self._rmv, self._mv)

    def __matmul__(self, other):
        if isinstance(other, LinearOperator):
            if self.shape[1] != other.shape[0]:
                raise SpSparseError(
                    f"operator shapes {self.shape} @ {other.shape} "
                    f"do not chain")
            rmv = None
            if self._rmv is not None and other._rmv is not None:
                rmv = lambda u: other._rmv(self._rmv(u))  # noqa: E731
            return LinearOperator(
                (self.shape[0], other.shape[1]),
                lambda x: self._mv(other._mv(x)), rmv,
                lambda X: self.matmat(other.matmat(X)))
        other = jnp.asarray(other)
        if other.ndim == 1:
            return self.matvec(other)
        if other.ndim == 2:
            return self.matmat(other)
        raise SpSparseError(f"cannot apply operator to ndim-{other.ndim}")

    def __add__(self, other: "LinearOperator") -> "LinearOperator":
        if not isinstance(other, LinearOperator):
            raise SpSparseError("operator + expects another LinearOperator"
                                " (wrap arrays with aslinearoperator)")
        if self.shape != other.shape:
            raise SpSparseError(
                f"operator shapes {self.shape} + {other.shape} differ")
        rmv = None
        if self._rmv is not None and other._rmv is not None:
            rmv = lambda u: self._rmv(u) + other._rmv(u)  # noqa: E731
        return LinearOperator(
            self.shape, lambda x: self._mv(x) + other._mv(x), rmv,
            lambda X: self.matmat(X) + other.matmat(X))

    def __sub__(self, other: "LinearOperator") -> "LinearOperator":
        return self + (-1.0) * other

    def __mul__(self, c) -> "LinearOperator":
        rmv = (None if self._rmv is None
               else (lambda u: c * self._rmv(u)))
        return LinearOperator(self.shape, lambda x: c * self._mv(x), rmv,
                              lambda X: c * self.matmat(X))

    __rmul__ = __mul__

    def __neg__(self) -> "LinearOperator":
        return (-1.0) * self

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return (f"LinearOperator(shape={self.shape}, "
                f"rmatvec={'yes' if self._rmv else 'no'})")


def identity_operator(n: int) -> LinearOperator:
    """The ``n x n`` identity as an operator (for shifts/regularizers)."""
    ident = lambda x: x  # noqa: E731
    return LinearOperator((n, n), ident, ident, ident)


def aslinearoperator(a) -> LinearOperator:
    """Wrap anything this framework can multiply by into a
    :class:`LinearOperator`:

    * ``LinearOperator`` — returned as-is.
    * dense 2-D array — plain matmuls.
    * :class:`SparseCOO` — CSR + CSC views built once (host-side), so
      both ``matvec`` and ``rmatvec`` run the sorted kernel paths.
    * :class:`SparseCSR` / :class:`SparseELL` — forward only (``rmatvec``
      raises; wrap the COO instead for a free transpose view).
    * :class:`SparseDIA` and prepared operands (``PreparedDIA``,
      ``PreparedGeneral``, tiled/BSR forms) — forward ``matvec`` through
      :func:`ops.best_spmv` / ``matmat`` through ``best_spmm``.
    """
    from ..ops.spmm import spmm, spmv
    from ..ops.spmv_kernels import best_spmm, best_spmv

    if isinstance(a, LinearOperator):
        return a
    if isinstance(a, SparseCOO):
        if a.rank != 2:
            raise SpSparseError("aslinearoperator needs a rank-2 array")
        csr = to_csr(a)
        csc = to_csc(a)
        return LinearOperator(
            a.shape, lambda x: spmv(csr, x), lambda u: spmv(csc, u),
            lambda X: spmm(csr, X))
    if isinstance(a, (SparseCSR, SparseELL)):
        return LinearOperator(a.shape, lambda x: spmv(a, x), None,
                              lambda X: spmm(a, X)
                              if isinstance(a, SparseCSR) else None)
    if isinstance(a, SparseDIA):
        return LinearOperator(a.shape, lambda x: best_spmv(a, x), None,
                              lambda X: best_spmm(a, X))
    from ..core.bsr import SparseBSR
    from ..core.tiled import SparseTiledCOO
    if isinstance(a, (SparseBSR, SparseTiledCOO)):
        # Block formats have SpMM kernels only; a single vector rides as
        # a one-column block.
        return LinearOperator(
            a.shape, lambda x: best_spmm(a, x[:, None])[:, 0], None,
            lambda X: best_spmm(a, X))
    shape = getattr(a, "shape", None)
    if shape is not None and not hasattr(a, "ndim"):
        # Prepared operands (PreparedDIA / PreparedGeneral); matmat falls
        # back to the column-vmapped matvec.
        return LinearOperator(shape, lambda x: best_spmv(a, x), None)
    arr = jnp.asarray(a)
    if arr.ndim != 2:
        raise SpSparseError(
            f"cannot wrap ndim-{arr.ndim} object as a LinearOperator")
    return LinearOperator(arr.shape, lambda x: arr @ x,
                          lambda u: arr.T @ u, lambda X: arr @ X)
