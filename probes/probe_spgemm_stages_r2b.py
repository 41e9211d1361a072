"""Cumulative pipeline bisection for config-4 SpGEMM: add one stage at a
time inside ONE jitted chain step to find where the 15 ms hides."""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.consolidate import consolidate, filter_compact
from spsparse_tpu.core.structure import to_csr
from spsparse_tpu.ops.multiply import (expand_products_raw,
                                       sort_and_merge_products)
from spsparse_tpu.utils.benchtime import bench_slope

rng = np.random.default_rng(0)
n_dst = 1 << 15
per = 4
r = np.repeat(np.arange(n_dst), per)
c = np.minimum(r * 2 + rng.integers(0, 3, r.size), n_dst * 2 - 1)
b = CooBuilder((n_dst, n_dst * 2), dtype=np.float32)
b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
A = b.build()
expand_cap = 131072
out_cap = 131072
out_shape = (A.shape[0], A.shape[0])
print("A.sort_order =", A.sort_order, "A.cap =", A.cap)

SL = dict(iters=8, reps=5, u_lo=2, u_hi=10)


def upto(stage):
    def step(a):
        acc = jnp.float32(0)
        Bt = a.transposed((1, 0))
        bcon = consolidate(Bt, (0, 1))
        acc += jnp.sum(bcon.vals)
        if stage >= 2:
            b_csr = to_csr(bcon)
            acc += jnp.sum(b_csr.vals)
        if stage >= 3:
            acon = a if a.sort_order == (0, 1) else consolidate(a, (0, 1))
            row_len = b_csr.row_ptr[1:] - b_csr.row_ptr[:-1]
            i_t, j_t, v_t, valid_t = expand_products_raw(
                acon.indices[:, 0], acon.indices[:, 1], acon.vals,
                acon.valid_mask(), b_csr.row_ptr[:-1], row_len,
                b_csr.cols, b_csr.vals, b_csr.ncols, b_csr.nrows,
                None, None, expand_cap)
            acc += jnp.sum(v_t)
        if stage >= 4:
            merged = sort_and_merge_products(i_t, j_t, v_t, valid_t,
                                             out_shape)
            acc += jnp.sum(merged.vals)
        if stage >= 5:
            live = merged.valid_mask()
            keep = live & (merged.vals != 0)
            res = filter_compact(merged, keep, cap=out_cap)
            acc += jnp.sum(res.vals)
        return dataclasses.replace(a, vals=a.vals + acc * jnp.float32(1e-38))
    return step


names = {1: "consolidate(B^T)", 2: "+to_csr", 3: "+expand", 4: "+sortmerge",
         5: "+emission(filter_compact)"}
for s in range(1, 6):
    t = bench_slope(upto(s), A, **SL)
    print(f"stage {s} ({names[s]}): {t*1e3:.3f} ms")
