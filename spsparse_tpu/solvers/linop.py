"""``LinearOperator`` — composable matrix-free operators over any sparse
format (the ``scipy.sparse.linalg.LinearOperator`` capability).

Every solver in this package takes a ``matvec`` callable; this class
makes those callables *algebra*: operators compose with ``@``, combine
with ``+``/``-``/scalar ``*``, and transpose with ``.T`` — so a
regridding normal-equations solve is literally

    R = aslinearoperator(A_coo)        # CSR + CSC kernel views built once
    N = R.T @ R + damp**2 * identity_operator(R.shape[1])
    x, _ = cg_solve(N, rhs, iters=...)

(``.T`` needs a transpose product: wrap the COO — or a dense array, or
pass ``rmatvec=`` explicitly; prepared/DIA/BSR operands are
forward-only.)

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
    algebra. ``matmat``/``rmatmat`` default to column ``vmap``s of the
    vector products (overridable with true multi-RHS kernels; ``rmatmat``
    keeps the fast block path alive across ``.T``)."""

    def __init__(self, shape, matvec: Callable[[Array], Array],
                 rmatvec: Callable[[Array], Array] | None = None,
                 matmat: Callable[[Array], Array] | None = None,
                 rmatmat: Callable[[Array], Array] | None = None):
        if len(shape) != 2:
            raise SpSparseError(f"LinearOperator shape must be (m, n), "
                                f"got {shape}")
        self.shape = (int(shape[0]), int(shape[1]))
        self._mv = matvec
        self._rmv = rmatvec
        self._mm = matmat
        self._rmm = rmatmat

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

    def rmatmat(self, U: Array) -> Array:
        if self._rmm is not None:
            return self._rmm(U)
        if self._rmv is None:
            raise SpSparseError(
                "this LinearOperator has no rmatvec (transpose product); "
                "construct it from a COO/CSR operand or pass rmatvec=")
        return jax.vmap(self._rmv, in_axes=1, out_axes=1)(U)

    # -- algebra ---------------------------------------------------------
    @property
    def T(self) -> "LinearOperator":
        if self._rmv is None:
            raise SpSparseError("transpose needs rmatvec; see rmatvec()")
        # Swap the vector AND block kernels so .T keeps the fast matmat
        # and .T.T restores the original exactly.
        return LinearOperator((self.shape[1], self.shape[0]),
                              self._rmv, self._mv,
                              matmat=self._rmm, rmatmat=self._mm)

    def __matmul__(self, other):
        if isinstance(other, LinearOperator):
            if self.shape[1] != other.shape[0]:
                raise SpSparseError(
                    f"operator shapes {self.shape} @ {other.shape} "
                    f"do not chain")
            rmv = None
            rmm = None
            if self._rmv is not None and other._rmv is not None:
                rmv = lambda u: other._rmv(self._rmv(u))  # noqa: E731
                rmm = lambda U: other.rmatmat(self.rmatmat(U))  # noqa: E731
            return LinearOperator(
                (self.shape[0], other.shape[1]),
                lambda x: self._mv(other._mv(x)), rmv,
                matmat=lambda X: self.matmat(other.matmat(X)),
                rmatmat=rmm)
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
        rmm = None
        if self._rmv is not None and other._rmv is not None:
            rmv = lambda u: self._rmv(u) + other._rmv(u)  # noqa: E731
            rmm = lambda U: self.rmatmat(U) + other.rmatmat(U)  # noqa: E731
        return LinearOperator(
            self.shape, lambda x: self._mv(x) + other._mv(x), rmv,
            matmat=lambda X: self.matmat(X) + other.matmat(X),
            rmatmat=rmm)

    def __sub__(self, other: "LinearOperator") -> "LinearOperator":
        return self + (-1.0) * other

    def __mul__(self, c) -> "LinearOperator":
        if isinstance(c, LinearOperator) or jnp.ndim(c) != 0:
            # opA * opB is a natural typo for opA @ opB; without this
            # check matvec would silently return an operator object.
            raise SpSparseError(
                "operator * expects a scalar; use @ for composition")
        rmv = (None if self._rmv is None
               else (lambda u: c * self._rmv(u)))
        rmm = (None if self._rmv is None
               else (lambda U: c * self.rmatmat(U)))
        return LinearOperator(self.shape, lambda x: c * self._mv(x), rmv,
                              matmat=lambda X: c * self.matmat(X),
                              rmatmat=rmm)

    __rmul__ = __mul__

    def __neg__(self) -> "LinearOperator":
        return (-1.0) * self

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return (f"LinearOperator(shape={self.shape}, "
                f"rmatvec={'yes' if self._rmv else 'no'})")


def identity_operator(n: int) -> LinearOperator:
    """The ``n x n`` identity as an operator (for shifts/regularizers)."""
    ident = lambda x: x  # noqa: E731
    return LinearOperator((n, n), ident, ident, matmat=ident,
                          rmatmat=ident)


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
            matmat=lambda X: spmm(csr, X),
            rmatmat=lambda U: spmm(csc, U))
    if isinstance(a, (SparseCSR, SparseELL)):
        # spmm handles both CSR and ELL blocks (ops/spmm.py).
        return LinearOperator(a.shape, lambda x: spmv(a, x), None,
                              matmat=lambda X: spmm(a, X))
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
