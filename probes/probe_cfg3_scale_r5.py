"""Round 5 (VERDICT r4 item 3): config 3 at the BASELINE-stated scale.

BASELINE config 3 says 5M rows x 50 nnz/row x 128-col block; the bench
ran 32K rows (150x smaller). This probe climbs a scale ladder
(2^18 -> 2^20 -> 5*2^20 rows) through the window SpMM kernel, measuring
each phase (host prepare, device transfer, compile, steady-state exec)
so the 5M-row entry in bench_detail is either real or the blocker is
measured, not guessed.

Working set at 5M rows (bf16 blocks, bf16 X, f32 Y): ~5.2 + 2.7 + 2.7
= ~10.6 GB of 16 GB HBM. X is kept loop-INVARIANT bf16 (the round-4
bf16 hazard is loop-CARRIED bf16 operands; an invariant operand is
converted once).

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 3600 python probes/probe_cfg3_scale_r5.py
"""

import gc
import time

import numpy as np

import jax
import jax.numpy as jnp

from spsparse_tpu.utils.compilecache import enable_persistent_cache

enable_persistent_cache()

from spsparse_tpu import CooBuilder                                # noqa: E402
from spsparse_tpu.core.tiled import to_tiled, TILE                 # noqa: E402
from spsparse_tpu.ops.pallas_tiled_window import (                 # noqa: E402
    prepare_tiled_window, spmm_tiled_window_pallas)


def wide_slope(step, init, fetch, u_lo, u_hi, reps=5):
    def chain(state, n):
        for _ in range(n):
            state = step(state)
        return state

    f_lo = jax.jit(lambda s: chain(s, u_lo))
    f_hi = jax.jit(lambda s: chain(s, u_hi))
    for f in (f_lo, f_hi):
        fetch(f(init))
    los, his = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); fetch(f_lo(init)); los.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fetch(f_hi(init)); his.append(time.perf_counter() - t0)
    return float(np.median(his) - np.median(los)) / (u_hi - u_lo)


def run_scale(m, K=50, N=128, spread=128, group=32):
    print(f"\n=== m={m} ({m/1e6:.2f}M rows, nnz={m*K/1e6:.0f}M) ===",
          flush=True)
    rng = np.random.default_rng(0)
    ncols = 2 * m
    t0 = time.perf_counter()
    rr = np.repeat(np.arange(m, dtype=np.int64), K)
    cc = np.clip(rr * 2 + rng.integers(-spread, spread + 1, rr.size),
                 0, ncols - 1)
    vv = rng.uniform(-1, 1, rr.size).astype(np.float32)
    b = CooBuilder((m, ncols), dtype=np.float32)
    b.add_many(np.stack([rr, cc], 1), vv)
    A = b.build()
    # host copies kept for the oracle spot-check (re-fetching the device
    # indices through the tunnel costs minutes at 5M rows)
    import scipy.sparse as sp
    Acsr_host = sp.csr_matrix((vv, (rr, cc)), shape=(m, ncols))
    del rr, cc, vv
    gc.collect()
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    tl = to_tiled(A)
    prep = prepare_tiled_window(tl, group=group,
                            host_limit_bytes=24 << 30)
    t_prep = time.perf_counter() - t0
    n_tiles = int(tl.n_tiles)
    blocks_gb = prep.blocks.size * 2 / 1e9
    print(f"build {t_build:.1f}s prepare {t_prep:.1f}s | n_tiles "
          f"{n_tiles} Rt {prep.blocks.shape[1]} ws {prep.ws} | blocks "
          f"{blocks_gb:.2f} GB", flush=True)

    t0 = time.perf_counter()
    Xh = rng.uniform(-1, 1, (ncols, N)).astype(np.float32)
    Xh_bf16 = Xh.astype(jnp.bfloat16)       # host bf16 copy for oracle
    X = jax.device_put(jnp.asarray(Xh_bf16))
    prep = jax.device_put(prep)
    jax.block_until_ready((X, prep.blocks))
    t_xfer = time.perf_counter() - t0
    print(f"device transfer {t_xfer:.1f}s "
          f"({(blocks_gb + Xh.nbytes/2e9):.1f} GB)", flush=True)
    del Xh
    gc.collect()

    t0 = time.perf_counter()
    Y = jax.block_until_ready(spmm_tiled_window_pallas(prep, X))
    t_first = time.perf_counter() - t0
    print(f"first call (compile+exec) {t_first:.1f}s", flush=True)

    # spot-check a few rows against the HOST oracle (no device fetches
    # beyond the checked Y rows)
    n_chk = 4
    rows_chk = np.sort(rng.integers(0, m, n_chk))
    want = Acsr_host[rows_chk] @ Xh_bf16.astype(np.float32)
    got = np.asarray(Y[rows_chk])
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    print(f"oracle spot-check ({n_chk} rows): rel err {rel:.2e}",
          flush=True)
    assert rel < 3e-2
    del Xh_bf16, Acsr_host
    gc.collect()

    import dataclasses

    def step(state):
        p, Xc = state
        Yv = spmm_tiled_window_pallas(p, Xc)
        eps = (Yv[0, 0] * jnp.float32(1e-30)).astype(p.blocks.dtype)
        return (dataclasses.replace(
            p, blocks=p.blocks.at[0, 0, 0, 0].add(eps)), Xc)

    # arms scaled to the expected per-call time (~13 ms at 5M)
    u_hi = 9 if m <= (1 << 20) else 5
    t = wide_slope(step, (prep, X),
                   lambda st: float(st[0].blocks[0, 0, 0, 0]),
                   u_lo=1, u_hi=u_hi, reps=5)
    nnz = m * K
    occ_cb = int(np.unique(np.asarray(tl.tile_col)[: n_tiles]).size)
    bytes_moved = (n_tiles * tl.tile_cap * (2 + 2)
                   + occ_cb * TILE * N * 2
                   + -(-m // TILE) * TILE * N * 4)
    sol = bytes_moved / 8.19e11
    print(f"steady-state: {t*1e3:.2f} ms/call | {nnz/t/1e9:.1f} Gnnz/s | "
          f"bytes {bytes_moved/1e9:.2f} GB sol {sol*1e3:.2f} ms | "
          f"pct {100*sol/t:.1f}%", flush=True)
    return dict(m=m, t=t, nnz=nnz, pct=100 * sol / t)


if __name__ == "__main__":
    import sys
    print("devices:", jax.devices())
    sizes = [1 << 18, 1 << 20, 5 << 20]
    if len(sys.argv) > 1:
        sizes = [int(s) for s in sys.argv[1:]]
    for m in sizes:
        try:
            run_scale(m)
        except Exception as e:
            print(f"m={m} FAILED: {type(e).__name__}: {e}", flush=True)
            break
