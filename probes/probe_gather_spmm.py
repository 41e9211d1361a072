"""Reproduce the GATHER_FILL_THRESHOLD crossover numbers cited in
ops/general.py: at ultra-low tile fill (~1.6 entries per occupied
128x128 tile) the plain XLA row-gather SpMM (512B X-row granules via
``jnp.take(..., axis=0)`` + ``segment_sum``) beats the packed one-hot
tiled kernel (64KB X-tile DMA per occupied tile).

Round-2 measured values (v5e, slope method): row-gather ~95 Mnnz/s,
packed one-hot ~3.8 Mnnz/s at fill 1.6 — crossover modelled at
f * 10.5ns ~= 0.35us -> f ~= 32 (= GATHER_FILL_THRESHOLD).

Run on TPU:  PYTHONPATH=/root/.axon_site:. python probes/probe_gather_spmm.py
"""
import json

import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.tiled import to_tiled
from spsparse_tpu.ops.general import (PreparedGeneral, _prepare_gather,
                                      spmm_general)
from spsparse_tpu.ops.pallas_tiled import prepare_tiled_rows, spmm_tiled_pallas
from spsparse_tpu.core.tiled import pack_columns
from spsparse_tpu.utils.benchtime import bench_slope


def main():
    on_cpu = jax.devices()[0].platform == "cpu"
    rng = np.random.default_rng(0)
    m = 1 << 11 if on_cpu else 1 << 14
    K, N = 8, 128
    ncols = 8 * m                        # sparse-wide scattered regime
    rr = np.repeat(np.arange(m), K)
    cc = rng.integers(0, ncols, rr.size)
    b = CooBuilder((m, ncols), dtype=np.float32)
    b.add_many(np.stack([rr, cc], 1),
               rng.uniform(-1, 1, rr.size).astype(np.float32))
    A = b.build()
    nnz = rr.size
    X = jnp.asarray(rng.uniform(-1, 1, (ncols, N)).astype(np.float32))

    # --- row-gather layout ---
    pg = PreparedGeneral(order=None, prep=_prepare_gather(A))

    def step_g(state):
        p, Xc = state
        Y = spmm_general(p, Xc)
        return (p, Xc.at[0, 0].add(Y[0, 0] * jnp.float32(1e-38)))

    t_g = bench_slope(step_g, (pg, X), iters=4 if on_cpu else 8,
                      reps=3, u_lo=2, u_hi=6)

    # --- packed one-hot tiled kernel on the same matrix ---
    ap, order = pack_columns(A)
    tl = to_tiled(ap)
    prep = prepare_tiled_rows(tl)
    fill = nnz / max(int(tl.n_tiles), 1)
    Xp = X[order]

    def step_t(state):
        p, Xc = state
        Y = spmm_tiled_pallas(p, Xc, interpret=on_cpu)
        return (p, Xc.at[0, 0].add(Y[0, 0] * jnp.float32(1e-38)))

    t_t = bench_slope(step_t, (prep, Xp), iters=4 if on_cpu else 8,
                      reps=3, u_lo=2, u_hi=6)

    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "rows": m, "nnz": nnz, "fill_packed": fill,
        "gather_time_s": t_g, "gather_nnz_per_s": nnz / t_g,
        "one_hot_time_s": t_t, "one_hot_nnz_per_s": nnz / t_t,
        "gather_over_one_hot": t_t / t_g,
    }, indent=1))


if __name__ == "__main__":
    main()
