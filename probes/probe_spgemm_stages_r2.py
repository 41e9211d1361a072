"""Stage-by-stage timing of the config-4 SpGEMM (A A^T, 131K nnz) on the
real chip: transpose-consolidate, to_csr row_ptr, expansion, product sort,
merge, emission — robust slope each."""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.consolidate import consolidate
from spsparse_tpu.core.structure import to_csr
from spsparse_tpu.ops.multiply import (expand_products_raw, expansion_size,
                                       sort_and_merge_products)
from spsparse_tpu.ops.spgemm import spgemm_aat, plan_spgemm_caps
from spsparse_tpu.utils.benchtime import bench_slope

rng = np.random.default_rng(0)
n_dst = 1 << 15
per = 4
r = np.repeat(np.arange(n_dst), per)
c = np.minimum(r * 2 + rng.integers(0, 3, r.size), n_dst * 2 - 1)
b = CooBuilder((n_dst, n_dst * 2), dtype=np.float32)
b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
A = b.build()
expand_cap, out_cap = plan_spgemm_caps(A, A, transpose_b=True)
print(f"nnz_a={r.size} expand_cap={expand_cap} out_cap={out_cap} "
      f"A.cap={A.cap}")

SL = dict(iters=8, reps=5, u_lo=2, u_hi=10)


def tfn(name, fn, init):
    def step(x):
        y = fn(x)
        leaves = jax.tree_util.tree_leaves(y)
        eps = sum(jnp.sum(l).astype(jnp.float32) * 0 for l in leaves
                  if jnp.issubdtype(l.dtype, jnp.number))
        lx = jax.tree_util.tree_leaves(x)[0]
        return jax.tree_util.tree_map(
            lambda l: (l.at[(0,) * l.ndim].add(
                (eps * jnp.ones((), l.dtype)).astype(l.dtype))
                if jnp.issubdtype(l.dtype, jnp.inexact) else l), x)
    t = bench_slope(step, init, **SL)
    print(f"{name}: {t*1e3:.3f} ms")
    return t


# full pipeline
def full(a):
    res = spgemm_aat(a, cap=out_cap, expand_cap=expand_cap)
    eps = jnp.sum(res.vals) * jnp.float32(1e-38)
    return dataclasses.replace(a, vals=a.vals + eps)


t_full = bench_slope(full, A, **SL)
print(f"FULL spgemm_aat: {t_full*1e3:.3f} ms")

# stage 1: B = A^T consolidate
Bt = A.transposed((1, 0))
tfn("consolidate(B^T)", lambda a: consolidate(a, (0, 1)), Bt)

# stage 2: to_csr of consolidated B
bcon = consolidate(Bt, (0, 1))
tfn("to_csr(bcon)", lambda a: to_csr(a), bcon)

# stage 3: expansion (uses acon + b_csr)
acon = consolidate(A, (0, 1))
b_csr = to_csr(bcon)
row_len = b_csr.row_ptr[1:] - b_csr.row_ptr[:-1]


def expand(a):
    i_a = a.indices[:, 0]
    k_a = a.indices[:, 1]
    live = a.valid_mask()
    i_t, j_t, v_t, valid_t = expand_products_raw(
        i_a, k_a, a.vals, live, b_csr.row_ptr[:-1], row_len,
        b_csr.cols, b_csr.vals, b_csr.ncols, b_csr.nrows, None, None,
        expand_cap)
    eps = jnp.sum(v_t) * jnp.float32(1e-38)
    return dataclasses.replace(a, vals=a.vals + eps)


t = bench_slope(expand, acon, **SL)
print(f"expand_products: {t*1e3:.3f} ms")

# stage 4: product sort+merge
i_a = acon.indices[:, 0]
k_a = acon.indices[:, 1]
live = acon.valid_mask()
i_t, j_t, v_t, valid_t = expand_products_raw(
    i_a, k_a, acon.vals, live, b_csr.row_ptr[:-1], row_len,
    b_csr.cols, b_csr.vals, b_csr.ncols, b_csr.nrows, None, None,
    expand_cap)


def sortmerge(v):
    m = sort_and_merge_products(i_t, j_t, v, valid_t,
                                (A.shape[0], A.shape[0]), merge_cap=out_cap)
    eps = jnp.sum(m.vals) * jnp.float32(1e-38)
    return v + eps


t = bench_slope(sortmerge, v_t, **SL)
print(f"sort_and_merge: {t*1e3:.3f} ms")
