"""Interop with ``jax.experimental.sparse`` (BCOO) and scipy.sparse.

spsparse-tpu's :class:`SparseCOO` and JAX's ``BCOO`` share the padded-COO
idea; converting between them is a metadata shuffle, so users can hand
matrices to libraries built on either, and scipy users can bring host
matrices in without going through dense.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from .coo import SparseCOO
from .errors import SpSparseError

__all__ = ["to_bcoo", "from_bcoo", "from_scipy", "to_scipy"]

Array = Any


def to_bcoo(a: SparseCOO):
    """:class:`SparseCOO` → ``jax.experimental.sparse.BCOO``.

    Padding entries are preserved as BCOO's own padding convention
    (out-of-range indices with zero data are treated as padding by BCOO
    when ``indices_sorted``/dedup passes run), so the conversion is O(1)
    metadata plus no copies beyond what XLA inserts.
    """
    from jax.experimental import sparse as jsparse

    a = a.repad()
    return jsparse.BCOO((a.vals, a.indices), shape=a.shape,
                        indices_sorted=a.sort_order == tuple(range(a.rank)),
                        unique_indices=False)


def from_bcoo(m, *, check: bool = True) -> SparseCOO:
    """``BCOO`` → :class:`SparseCOO` (dense layout: n_batch=n_dense=0)."""
    if m.n_batch or m.n_dense:
        raise SpSparseError(
            "from_bcoo supports unbatched, fully-sparse BCOO "
            f"(n_batch={m.n_batch}, n_dense={m.n_dense})")
    idx = jnp.asarray(m.indices)
    vals = jnp.asarray(m.data)
    shape = tuple(int(s) for s in m.shape)
    # BCOO padding = out-of-range or duplicated-sentinel rows with zero
    # data; normalize to our sentinel form by masking on in-bounds.
    in_bounds = jnp.all(
        (idx >= 0) & (idx < jnp.asarray(shape, idx.dtype)), axis=1)
    from .coo import default_index_dtype
    idt = jnp.dtype(default_index_dtype(shape))
    try:
        concrete = np.asarray(in_bounds)
        nnz_guess = int(concrete.sum())
        if concrete[:nnz_guess].all() and not concrete[nnz_guess:].any():
            # padding already at the tail: cheap path
            return SparseCOO.from_arrays(
                np.asarray(idx), np.asarray(vals), shape,
                nnz=nnz_guess, cap=idx.shape[0], check=check)
    except Exception:
        pass
    # general path: compact in-bounds entries to the front. Index dtype
    # follows the extents (an unconditional int32 cast would wrap
    # indices of >=2^31 extents — default_index_dtype exists for this).
    from .consolidate import filter_compact

    base = SparseCOO(indices=idx.astype(idt), vals=vals,
                     nnz=jnp.asarray(idx.shape[0], jnp.int32),
                     shape=shape, sort_order=None)
    return filter_compact(base, in_bounds)


def from_scipy(m, *, cap: int | None = None, dtype=None) -> SparseCOO:
    """scipy.sparse matrix → :class:`SparseCOO` (host-side eager)."""
    from .coo import default_index_dtype

    coo = m.tocoo()
    idt = np.dtype(default_index_dtype(coo.shape))
    idx = np.stack([coo.row, coo.col], axis=1).astype(idt)
    vals = coo.data if dtype is None else coo.data.astype(dtype)
    return SparseCOO.from_arrays(idx, vals, coo.shape, cap=cap, check=False)


def to_scipy(a: SparseCOO):
    """:class:`SparseCOO` → ``scipy.sparse.coo_matrix`` (rank-2, eager)."""
    import scipy.sparse as ss

    if a.rank != 2:
        raise SpSparseError("to_scipy requires a rank-2 array")
    idx, vals = a.to_lists()
    idx = np.asarray(idx, np.int64).reshape(len(vals), 2)
    return ss.coo_matrix((np.asarray(vals), (idx[:, 0], idx[:, 1])),
                         shape=a.shape)
