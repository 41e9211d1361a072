"""SpMV compute kernels: format-specialized, TPU-tuned.

Dispatch layer over the storage formats:

* :func:`spmv_dia` — banded/diagonal matrices: per-diagonal shifted FMA.
  Zero gathers; streams ``data`` once and ``x`` once per diagonal. This is
  the speed-of-light path for the BASELINE config-2 banded family.
* :func:`spmv_ell` — general bounded-row-length matrices: row-blocked
  gather + reduce (XLA lowering; Pallas CSR variant in
  :mod:`spsparse_tpu.ops.pallas_segsum`).
* :func:`best_spmv` — picks the fastest available implementation for the
  operand's format.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..core.dia import SparseDIA
from ..core.structure import SparseCSR, SparseELL
from .spmm import spmv as _spmv_generic

Array = Any

__all__ = ["spmv_dia", "spmv_ell", "best_spmv", "best_spmm"]


def spmv_dia(dia: SparseDIA, x: Array) -> Array:
    """``y = A @ x`` for diagonal storage: ``y[i] += data[d,i] * x[i+off]``.

    Each diagonal contributes a shifted elementwise product; XLA fuses the
    whole loop (static ``offsets``) into one streaming pass."""
    n, m = dia.shape
    y = jnp.zeros((n,), jnp.result_type(dia.data, x))
    for d, off in enumerate(dia.offsets):
        # rows i in [max(0,-off), min(n, m-off)) read x[i+off]
        lo = max(0, -off)
        hi = min(n, m - off)
        if hi <= lo:
            continue
        seg = dia.data[d, lo:hi] * jax.lax.dynamic_slice_in_dim(
            x, lo + off, hi - lo)
        y = y.at[lo:hi].add(seg)
    return y


def spmv_ell(ell: SparseELL, x: Array) -> Array:
    """Gather + row-reduce over the regular ELL layout."""
    xg = jnp.take(x, ell.cols, mode="fill", fill_value=0)
    return jnp.sum(ell.vals * xg, axis=1)


def _on_tpu() -> bool:
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def best_spmv(a, x: Array) -> Array:
    """Format-dispatched SpMV (jittable; dispatch is static on type and
    backend). On TPU, DIA operands route to the Pallas streaming kernel;
    elsewhere the XLA lowerings apply."""
    if isinstance(a, SparseDIA):
        if _on_tpu():
            from .pallas_dia import spmv_dia_pallas

            return spmv_dia_pallas(a, x)
        return spmv_dia(a, x)
    from .pallas_dia import PreparedDIA

    if isinstance(a, PreparedDIA):
        from .pallas_dia import spmv_dia_pallas

        return spmv_dia_pallas(a, x, interpret=not _on_tpu())
    from .general import PreparedGeneral, spmv_general

    if isinstance(a, PreparedGeneral):
        return spmv_general(a, x, interpret=not _on_tpu())
    from .spmv_shuffle import PreparedShuffleSpMV, spmv_shuffle

    if isinstance(a, PreparedShuffleSpMV):
        # unstructured/uniform-random patterns: slab lane-gather +
        # compile-bounded static shuffle + ELL reduce (prepare once with
        # ops.spmv_shuffle.prepare_shuffle_spmv)
        return spmv_shuffle(a, x, interpret=not _on_tpu())
    if isinstance(a, SparseELL):
        return spmv_ell(a, x)
    if isinstance(a, SparseCSR):
        # NB: on TPU the raw-CSR path is gather-bound (~0.1 Gnnz/s,
        # docs/PERFORMANCE.md); for repeated products convert once with
        # ops.prepare_general (host-side) and pass that instead.
        return _spmv_generic(a, x)
    return _spmv_generic(a, x)


def best_spmm(a, X: Array, *, interpret: bool | None = None) -> Array:
    """Format-dispatched SpMM ``Y = A @ X`` (dense ``X (K, N)``).

    Routes: ``PreparedGeneral`` -> packed tiled kernels;
    ``SparseTiledCOO``/``PreparedTiledDense``/``PreparedTiledRows`` ->
    tiled kernels; ``SparseBSR`` -> block matmuls; ``SparseDIA`` with a
    lane-shaped RHS stays on the XLA shifted-FMA (vmapped); CSR/ELL ->
    the generic gather path (prepare once for the TPU-fast route)."""
    from ..core.bsr import SparseBSR
    from ..core.tiled import SparseTiledCOO
    from .general import PreparedGeneral, spmm_general
    from .pallas_tiled import (PreparedTiledDense, PreparedTiledRows,
                               spmm_tiled_dense_pallas, spmm_tiled_pallas)
    from .spmm import spmm as _spmm_generic, spmm_bsr

    interp = (not _on_tpu()) if interpret is None else interpret
    from .pallas_tiled_window import (PreparedTiledWindow,
                                      spmm_tiled_window_pallas)

    if isinstance(a, PreparedTiledWindow):
        return spmm_tiled_window_pallas(a, X, interpret=interp)
    if isinstance(a, PreparedGeneral):
        return spmm_general(a, X, interpret=interp)
    if isinstance(a, PreparedTiledDense):
        return spmm_tiled_dense_pallas(a, X, interpret=interp)
    if isinstance(a, PreparedTiledRows):
        return spmm_tiled_pallas(a, X, interpret=interp)
    if isinstance(a, SparseTiledCOO):
        from .tiled_ops import spmm_tiled

        return spmm_tiled(a, X)
    if isinstance(a, SparseBSR):
        return spmm_bsr(a, X)
    if isinstance(a, SparseDIA):
        return jax.vmap(lambda col: spmv_dia(a, col), in_axes=1,
                        out_axes=1)(jnp.asarray(X))
    return _spmm_generic(a, X)
