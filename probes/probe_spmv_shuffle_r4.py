"""Shuffle-SpMV throughput on the VERDICT r3 item-2 target matrix:
1M rows x 1M cols, uniform-random 10 nnz/row. Round-3 status: such
matrices fell to the 0.095-0.13 Gnnz/s gather wall.

The static shuffle rides the compile-bounded chunked sort on int32
destination ids (globally unique, so no x64 composite is needed).
"""
import sys
import time
import json

import numpy as np
import jax
# NB: x64 must stay OFF — Pallas grid kernels fail Mosaic lowering when
# traced under jax_enable_x64 on this stack (isolated 2026-08-20: even a
# trivial no-gather grid kernel 500s in remote_compile with x64 on, and
# passes with it off). The shuffle path is int32-native anyway.
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from spsparse_tpu import CooBuilder  # noqa
from spsparse_tpu.ops.spmv_shuffle import (prepare_shuffle_spmv,  # noqa
                                           spmv_shuffle)
from spsparse_tpu.utils.benchtime import bench_slope  # noqa
from spsparse_tpu.utils.compilecache import enable_persistent_cache  # noqa

enable_persistent_cache()


def main():
    rng = np.random.default_rng(0)
    n = 1 << 20
    k = 10
    nnz = n * k
    rows = np.repeat(np.arange(n), k)
    cols = rng.integers(0, n, nnz)
    b = CooBuilder((n, n), dtype=np.float32)
    b.add_many(np.stack([rows, cols], 1),
               rng.uniform(-1, 1, nnz).astype(np.float32))
    A = b.build()
    t0 = time.time()
    prep = prepare_shuffle_spmv(A)
    print(json.dumps({"prepare_s": time.time() - t0,
                      "batches": prep.n_batches,
                      "slots": prep.n_slots,
                      "gather_fill": nnz / (prep.n_batches * 1024),
                      "n_vrows": prep.n_vrows}), flush=True)
    x = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))

    # correctness on a slice of rows
    t0 = time.time()
    y = np.asarray(jax.block_until_ready(spmv_shuffle(prep, x)))
    print("first call (incl compile):", time.time() - t0, flush=True)
    sel = rng.integers(0, n, 200)
    want = np.zeros(200)
    xn = np.asarray(x, np.float64)
    import scipy.sparse as sp
    S = sp.coo_matrix((np.asarray(A.vals[:nnz]),
                       (rows, cols)), shape=(n, n)).tocsr()
    want = S[sel] @ xn
    err = np.abs(y[sel] - want).max() / max(np.abs(want).max(), 1e-9)
    print("rel err:", err, flush=True)
    assert err < 1e-3, err

    def step(st):
        p, xv = st
        yv = spmv_shuffle(p, xv)
        return (p, xv.at[0].add(yv[0] * jnp.float32(1e-30)))

    t = bench_slope(step, (prep, x), iters=8, reps=5, u_lo=2, u_hi=10)
    print(json.dumps({"time_s": t, "gnnz_per_s": nnz / t / 1e9,
                      "vs_round3_gather_wall": (nnz / t) / 0.095e9}),
          flush=True)


if __name__ == "__main__":
    main()
