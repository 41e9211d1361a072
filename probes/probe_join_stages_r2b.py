"""Direct dynamic-input timing on TPU: _expand_join vs gather expansion,
sort_and_merge with dynamic keys, and full multiply — config-4 operands.
All index inputs are chained (x*0 added) so nothing constant-folds."""
import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
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
A = b.build().consolidate((0, 1))
Bc = A.transposed((1, 0)).consolidate((0, 1))
bcsr = to_csr(Bc)
rl = bcsr.row_ptr[1:] - bcsr.row_ptr[:-1]
expand_cap = 131072
SL = dict(iters=8, reps=5, u_lo=2, u_hi=10)

i_a = A.indices[:, 0]
k_a = A.indices[:, 1]
live = A.valid_mask()

for method in ("join", "gather"):
    def step(x, method=method):
        d = (x[0] * 0).astype(i_a.dtype)
        i_t, j_t, v_t, val = expand_products_raw(
            i_a + d, k_a + d, A.vals + x[0] * 0, live,
            bcsr.row_ptr[:-1] + d.astype(jnp.int32),
            rl + d.astype(jnp.int32),
            bcsr.cols + d, bcsr.vals + x[0] * 0,
            bcsr.ncols, bcsr.nrows, None, None, expand_cap, method=method)
        return x.at[0].add(jnp.sum(v_t) * 0 + jnp.sum(j_t).astype(
            jnp.float32) * 0)
    t = bench_slope(step, jnp.zeros((8,), jnp.float32), **SL)
    print(f"expand[{method}] dynamic: {t*1e3:.3f} ms")

# sort_and_merge with dynamic keys
i_t, j_t, v_t, val = expand_products_raw(
    i_a, k_a, A.vals, live, bcsr.row_ptr[:-1], rl, bcsr.cols, bcsr.vals,
    bcsr.ncols, bcsr.nrows, None, None, expand_cap, method="join")


def sm(x):
    d = (x[0] * 0).astype(jnp.int32)
    m = sort_and_merge_products(i_t + d, j_t + d, v_t + x[0] * 0, val,
                                (A.shape[0], A.shape[0]),
                                merge_cap=expand_cap)
    return x.at[0].add(jnp.sum(m.vals) * 0)


t = bench_slope(sm, jnp.zeros((8,), jnp.float32), **SL)
print(f"sort_and_merge dynamic: {t*1e3:.3f} ms")
