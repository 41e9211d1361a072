"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE config 2): SpMV throughput (nnz/s) on a synthetic
banded matrix (~10 nnz/row, 1M rows on TPU; scaled down on CPU) via the
Pallas DIA chain kernel, timed with the steady-state slope method (see
CLAUDE.md / docs/PERFORMANCE.md for why naive timing is invalid on this
machine's remote TPU tunnel).

Honest bytes model: the chain kernel keeps x and y VMEM-resident across
iterations, so steady-state HBM traffic is the diagonal stream only —
``4 bytes/nnz`` — and the speed-of-light denominator uses exactly that
(round 1 charged a phantom ``8*nrows`` of x/y traffic per iteration,
inflating ``vs_baseline`` ~18%; VERDICT flagged it). ``vs_baseline`` is
achieved throughput over 70% of that roofline (>= 1.0 meets the
BASELINE.json target).

``--all`` additionally reports every BASELINE.md config (1-5) as JSON
lines on stderr, each with its own stated bytes model and
``pct_of_roofline`` where a roofline is meaningful.

Run: ``python bench.py`` — the last stdout line is always the single
headline JSON.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

try:
    # Persistent XLA compile cache: the rig's remote compiles are the
    # dominant cold cost (minutes at large shapes); cache them per machine.
    from spsparse_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
except Exception:  # pragma: no cover - cache is best-effort
    pass


def build_banded_dia(n: int, band: int, dtype=np.float32):
    from spsparse_tpu.core.dia import SparseDIA

    rng = np.random.default_rng(0)
    offs = np.arange(-band, band + 1)
    cols = np.arange(n)[:, None] + offs[None, :]
    valid = (cols >= 0) & (cols < n)
    vals = np.where(valid, rng.uniform(-1, 1, (n, 2 * band + 1)), 0).astype(dtype)
    dia = SparseDIA(data=jnp.asarray(vals.T.copy()),
                    offsets=tuple(int(o) for o in offs), shape=(n, n))
    return dia, int(valid.sum())


def bench_spmv(n: int, band: int, use_pallas: bool) -> dict:
    import time

    from spsparse_tpu.ops.spmv_kernels import spmv_dia
    from spsparse_tpu.ops.pallas_dia import prepare_dia
    from spsparse_tpu.ops.pallas_dia_chain import spmv_dia_chain_pallas
    from spsparse_tpu.utils.benchtime import bench_slope
    from spsparse_tpu.utils.roofline import device_hbm_bandwidth

    dia, nnz = build_banded_dia(n, band)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, n)
                    .astype(np.float32))
    if use_pallas:
        # Steady-state kernel throughput: T device-resident SpMV iterations
        # per launch; per-iteration time = slope between two T values
        # (cancels this rig's large per-call tunnel latency).
        prep = prepare_dia(dia)

        def run(T):
            y = spmv_dia_chain_pallas(prep, x, iters=T, scale=0.3)
            return float(jnp.sum(y))

        # Wide T arm: the slope must tower over the tunnel's multi-ms
        # latency spikes (ΔT=80 gave ~7 ms of device-time difference and
        # once measured an unphysical 4x speed-of-light headline); ΔT=512
        # iterations ≈ 45 ms of device time at the expected ~90 us/iter.
        t_lo_T, t_hi_T = 64, 576
        run(t_lo_T)
        run(t_hi_T)
        # Difference of per-arm MEDIANS, not median of per-pair slopes:
        # the tunnel injects multi-ms positive latency spikes, and a spike
        # landing on either side of a pair swings that pair's slope wildly
        # (the same fix bench_slope itself got — probe_cfg34_stability).
        los, his = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            run(t_lo_T)
            los.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run(t_hi_T)
            his.append(time.perf_counter() - t0)
        t = float(np.median(his) - np.median(los)) / (t_hi_T - t_lo_T)
        impl = "pallas_dia_chain_steady_state"
        # Steady state: x and y live in VMEM across iterations; HBM traffic
        # per iteration is the diagonal stream only.
        bytes_moved = nnz * 4
        bytes_model = "steady_state_chain: 4B/nnz (x,y VMEM-resident)"
    else:
        step = lambda v: spmv_dia(dia, v)  # noqa: E731
        t = bench_slope(step, x, iters=8, reps=3)
        impl = "xla_dia"
        bytes_moved = nnz * 4 + n * 8
        bytes_model = "one-shot: 4B/nnz data + 8B/row x,y"

    kind, bw = device_hbm_bandwidth()
    sol_nnz_s = bw / (bytes_moved / nnz)
    achieved = nnz / t
    return {
        "metric": "spmv_banded_nnz_per_s",
        "value": achieved,
        "unit": "nnz/s",
        "vs_baseline": achieved / (0.7 * sol_nnz_s),
        "detail": {
            "config": 2, "impl": impl, "n": n, "nnz": nnz, "time_s": t,
            "device": kind, "bytes_moved": bytes_moved,
            "bytes_model": bytes_model,
            "pct_of_roofline": 100.0 * achieved / sol_nnz_s,
            "effective_gb_s": bytes_moved / t / 1e9,
        },
    }


def wide_slope(step, init, fetch, *, u_lo: int = 16,
               u_hi: int = 144, reps: int = 7) -> float:
    """Spike-proof slope: the differenced device time (u_hi - u_lo
    iterations, ~20 ms for sub-ms kernels) towers over this tunnel's
    multi-ms latency spikes. Narrow-arm slopes measured 46%..132%-of-
    model on the same kernel the same day (132% is impossible) —
    probes/probe_cfg3_r4c.py, probe_cfg4_r4b.py. ``fetch(state)`` must
    force a scalar to the host."""
    import time

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
        t0 = time.perf_counter()
        fetch(f_lo(init))
        los.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        fetch(f_hi(init))
        his.append(time.perf_counter() - t0)
    return float(np.median(his) - np.median(los)) / (u_hi - u_lo)


def config1_reference_check() -> dict:
    """Config 1: the reference's own CPU-runnable correctness config —
    consolidate + diag-scaled SpGEMM on test_multiply_sparse-style 5x5
    operands vs the dense oracle. Roofline is meaningless at this size;
    the metric is the oracle match."""
    import time

    from spsparse_tpu import CooBuilder
    from spsparse_tpu.ops import multiply

    t0 = time.perf_counter()
    As, Bs, Ads, Bds = [], [], [], []
    for seed in range(1, 33):
        r = np.random.default_rng(seed)
        na = int(r.uniform(0, 1) * 25)
        nb = int(r.uniform(0, 1) * 25)
        ba = CooBuilder((5, 5), dtype=np.float64)
        for _ in range(na):
            ba.add((int(r.integers(5)), int(r.integers(5))),
                   float(r.uniform(-1, 1)))
        bb = CooBuilder((5, 5), dtype=np.float64)
        for _ in range(nb):
            bb.add((int(r.integers(5)), int(r.integers(5))),
                   float(r.uniform(-1, 1)))
        A, B = ba.build(cap=32), bb.build(cap=32)
        As.append(A)
        Bs.append(B)
        Ads.append(np.asarray(A.to_dense()))
        Bds.append(np.asarray(B.to_dense()))

    # All seeds share one compiled program (fixed caps + vmap) — the eager
    # per-seed loop costs ~170 s through this rig's dispatch tunnel.
    stackA = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *As)
    stackB = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *Bs)

    @jax.jit
    @jax.vmap
    def f(a, b):
        return multiply(1.0, a, b, expand_cap=1024, cap=64).to_dense()

    dense = np.asarray(jax.block_until_ready(f(stackA, stackB)))
    expect = np.einsum("sij,sjk->sik", np.stack(Ads), np.stack(Bds))
    max_err = float(np.abs(dense - expect).max(initial=0))
    checked = len(As)
    # f64 oracles need jax x64 (the test suite enables it); without it the
    # values silently run in f32, so calibrate the tolerance to the dtype.
    tol = 1e-12 if jax.config.jax_enable_x64 else 1e-5
    return {"config": 1, "name": "reference_oracle_spgemm",
            "seeds_checked": checked, "max_abs_err": max_err,
            "tolerance": tol,
            "oracle_match": bool(max_err < tol),
            "time_s": time.perf_counter() - t0,
            "pct_of_roofline": None,
            "note": "correctness config (5x5); roofline not meaningful"}


def config2b_multirhs(on_cpu: bool) -> dict | None:
    """Config 2b: multi-RHS banded SpMM — 8 RHS amortize the diagonal
    stream. Bytes model: 4B/nnz data + 8 RHS x/y streamed per pass."""
    if on_cpu:
        return None
    from spsparse_tpu.ops.pallas_dia import prepare_dia
    from spsparse_tpu.ops.pallas_dia_mrhs import spmm_dia_mrhs_pallas
    from spsparse_tpu.utils.benchtime import bench_slope
    from spsparse_tpu.utils.roofline import device_hbm_bandwidth

    rng = np.random.default_rng(0)
    n = 1 << 20
    dia, nnz = build_banded_dia(n, 5)
    prep = prepare_dia(dia)
    X = jnp.asarray(rng.uniform(-1, 1, (8, n)).astype(np.float32))
    # wide arms (dY ~ 16 ms of device time): narrow arms read an
    # impossible 115% of roofline on a spiky tunnel day
    t = bench_slope(lambda Xv: spmm_dia_mrhs_pallas(prep, Xv), X,
                    iters=8, reps=7, u_lo=16, u_hi=96)
    kind, bw = device_hbm_bandwidth()
    bytes_moved = nnz * 4 + 8 * 2 * n * 4
    agg = 8 * nnz / t
    sol = bw / (bytes_moved / (8 * nnz))
    return {"config": "2b", "name": "spmv_banded_8rhs", "nnz": nnz,
            "time_s": t, "nnz_per_s_aggregate": agg,
            "bytes_model": "4B/nnz data + 8 RHS x,y",
            "pct_of_roofline": 100.0 * agg / sol}


def config2c_unstructured(on_cpu: bool) -> dict:
    """Config 2c (round 4): unstructured SpMV — 1M x 1M uniform-random
    columns, 10 nnz/row — via the shuffle layout (ops.spmv_shuffle:
    slab lane-gather + compile-bounded static shuffle + ELL reduce).
    Round 3 had no viable path here (XLA gather wall, 0.095-0.13
    Gnnz/s). The op is bound by the static-shuffle sort bandwidth
    (direct 17M-slot sort at this size; docs/PERFORMANCE.md round-4
    notes), not streaming traffic, so no pct_of_roofline is reported;
    the honest metric is nnz/s and the multiple over the gather wall
    (measured 0.212 Gnnz/s = 2.2x on chip)."""
    from spsparse_tpu import CooBuilder
    from spsparse_tpu.ops.spmv_shuffle import (prepare_shuffle_spmv,
                                               spmv_shuffle)
    from spsparse_tpu.utils.benchtime import bench_slope

    rng = np.random.default_rng(0)
    n = 1 << 13 if on_cpu else 1 << 20
    k = 10
    nnz = n * k
    b = CooBuilder((n, n), dtype=np.float32)
    b.add_many(np.stack([np.repeat(np.arange(n), k),
                         rng.integers(0, n, nnz)], 1),
               rng.uniform(-1, 1, nnz).astype(np.float32))
    prep = prepare_shuffle_spmv(b.build())
    x = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    interp = on_cpu

    def step(st):
        p, xv = st
        y = spmv_shuffle(p, xv, interpret=interp)
        return (p, xv.at[0].add(y[0] * jnp.float32(1e-30)))

    t = bench_slope(step, (prep, x), iters=4 if on_cpu else 8,
                    reps=3 if on_cpu else 5, u_lo=2,
                    u_hi=6 if on_cpu else 10)
    return {"config": "2c", "name": "spmv_unstructured_shuffle",
            "rows": n, "nnz": nnz, "time_s": t, "nnz_per_s": nnz / t,
            "gather_fill": nnz / (prep.n_batches * 1024),
            "vs_gather_wall": (nnz / t) / 0.095e9,
            "pct_of_roofline": None,
            "note": "sort/shuffle-bound op; roofline not meaningful "
                    "(docs/PERFORMANCE.md round-4 notes)"}


def _regrid_matrix(m: int, k: int, rng, spread: int = 128):
    """Column-local 'regridding-style' matrix: row r's k entries cluster
    around column 2r (conservative-interpolation structure — each output
    cell touches a compact source neighbourhood). This is the library's
    target domain; fully random columns are a gather-machine benchmark,
    not a regridding one (see docs/PERFORMANCE.md)."""
    from spsparse_tpu import CooBuilder
    ncols = 2 * m
    rr = np.repeat(np.arange(m), k)
    cc = np.clip(rr * 2 + rng.integers(-spread, spread + 1, rr.size),
                 0, ncols - 1)
    b = CooBuilder((m, ncols), dtype=np.float32)
    b.add_many(np.stack([rr, cc], 1),
               rng.uniform(-1, 1, rr.size).astype(np.float32))
    return b.build()


def config3_spmm(on_cpu: bool) -> dict:
    """Config 3: general sparse (50 nnz/row) x dense 128-col block via the
    dense-block tiled kernel (avg fill 1603 >> DENSE_FILL_THRESHOLD), in
    the BASELINE-specified mixed bf16/f32 mode (bf16 A blocks and X
    stream, f32 accumulation). Pattern-aware roofline: A payload
    (1+1+2 B/entry tiled) + each occupied X tile fetched once (bf16) + Y
    written once (f32). Timed with bench_slope — bench_fori charges this
    rig's ~7 ms fixed cost per loop iteration containing a pallas_call,
    which swamps sub-ms kernels (probes/probe_tiled_dense_r2c.py).

    Round 4: the iteration dependency rides the A BLOCKS (tiny in-place
    perturbation), with X loop-invariant f32 so its bf16 conversion
    hoists out of the chain. The round-3 harness perturbed X instead,
    which charged a per-iteration X copy/convert pass against the kernel
    and (measured, probes/probe_cfg3_r4*.py) hit a pathological slow path
    when a bf16 X rides the loop carry — 40-55%-of-roofline readings that
    were harness artifact, not kernel cost (the kernel itself streams at
    ~830 GB/s = 81% of the pattern-aware model)."""
    import dataclasses
    from spsparse_tpu.core.tiled import to_tiled, TILE
    from spsparse_tpu.ops.pallas_tiled import (prepare_tiled_dense,
                                               spmm_tiled_dense_pallas)
    from spsparse_tpu.ops.tiled_ops import spmm_tiled
    from spsparse_tpu.utils.benchtime import bench_slope
    from spsparse_tpu.utils.roofline import device_hbm_bandwidth

    rng = np.random.default_rng(0)
    # 2^18 rows (round 5): at 2^15 the whole working set fits this
    # chip's large VMEM and XLA keeps it resident across the bench
    # chain — the fat-step kernel measured 17 us = 357% of the HBM
    # model there (physically impossible as an HBM number). 2^18 rows
    # (~0.53 GB working set) forces honest streaming.
    m = 1 << 12 if on_cpu else 1 << 18
    K, N = 50, 128
    A = _regrid_matrix(m, K, rng)
    tl = to_tiled(A)
    X = jnp.asarray(rng.uniform(-1, 1, (A.shape[1], N)).astype(np.float32))
    if on_cpu:
        esize = 4
        impl = "xla_tiled"

        def step(state):
            _, Xc = state
            Y = spmm_tiled(tl, Xc)
            return (state[0], Xc.at[0, 0].add(Y[0, 0] * jnp.float32(1e-38)))

        init = (jnp.zeros(()), X)
    else:
        esize = 2
        impl = "pallas_tiled_window_bf16"
        # Round-4 primary path: super-row X-window kernel — X fetched
        # once per occupied column block instead of once per stored tile
        # (probes/probe_cfg3_window.py: 61.5-64 us = the READ-stream
        # speed of light for A payload + X-min + Y, writes overlapped).
        from spsparse_tpu.ops.pallas_tiled_window import (
            prepare_tiled_window, spmm_tiled_window_pallas)
        prep = prepare_tiled_window(tl, group=32)

        # prep rides through init (a jit argument): closures become HLO
        # constants and overflow the axon tunnel's remote_compile body
        # limit at large sizes (HTTP 413, probes/probe_cfg34_scale.py).
        def step(state):
            p, Xc = state
            Y = spmm_tiled_window_pallas(p, Xc)
            eps = (Y[0, 0] * jnp.float32(1e-30)).astype(p.blocks.dtype)
            p2 = dataclasses.replace(
                p, blocks=p.blocks.at[0, 0, 0, 0].add(eps))
            return (p2, Xc)

        init = (prep, X)

    if on_cpu:
        t = bench_slope(step, init, iters=8, reps=5, u_lo=2, u_hi=10)
    else:
        t = wide_slope(step, init, lambda st: float(
            jnp.sum(st[0].blocks.astype(jnp.float32))))
    nnz = m * K
    n_tiles = int(tl.n_tiles)
    fill = nnz / max(n_tiles, 1)
    kind, bw = device_hbm_bandwidth()
    # X charge: once per OCCUPIED column block — the information-
    # theoretic minimum a tiled kernel must fetch, and what the window
    # kernel actually moves. A charge (round 5): the kernel's ACTUAL
    # traffic — DENSE 128x128 blocks regardless of fill (the inherited
    # one-hot payload formula undercharged the dense layout 2x, which
    # deflates pct_of_roofline; an honest model states what the kernel
    # moves). Y written once, f32.
    occ_cb = int(np.unique(np.asarray(tl.tile_col)[: n_tiles]).size)
    if on_cpu:
        a_bytes = n_tiles * tl.tile_cap * (2 + esize)
    else:
        a_bytes = int(np.prod(prep.blocks.shape)) * esize
    bytes_moved = (a_bytes
                   + occ_cb * TILE * N * esize          # X once/occupied cb
                   + -(-m // TILE) * TILE * N * 4)      # Y (f32)
    sol_nnz = bw / (bytes_moved / nnz)
    achieved = nnz / t
    return {"config": 3, "name": "spmm_tiled_50nnz_128block", "impl": impl,
            "rows": m, "nnz": nnz, "n_tiles": n_tiles,
            "tile_fill": fill, "tile_cap": tl.tile_cap, "time_s": t,
            "nnz_per_s": achieved,
            "bytes_model": ("dense A blocks once + X once per occupied "
                            f"column block ({esize}B) + Y once (f32)"
                            if not on_cpu else
                            f"{2 + esize}B/slot payloads + X/cb + Y"),
            "pct_of_roofline": 100.0 * achieved / sol_nnz,
            "matrix": "column-local regridding-style (spread 128)"}


def config3b_packed_general(on_cpu: bool) -> dict:
    """Config 3b: the *scattered*-column companion to config 3 — random
    columns (no locality), routed through ``ops.prepare_general``:
    pack_columns raises tile fill, then the fill-chosen kernel runs. The
    reported ``n_tiles_packed`` vs ``n_tiles_raw`` is the traffic
    reduction the packing buys; the bytes model prices the *packed*
    layout (X tiles fetched once per occupied tile)."""
    from spsparse_tpu import CooBuilder
    from spsparse_tpu.core.tiled import to_tiled, TILE
    from spsparse_tpu.ops import prepare_general
    from spsparse_tpu.ops.general import spmm_general
    from spsparse_tpu.ops.general import PreparedGather, PreparedGatherEll
    from spsparse_tpu.ops.pallas_tiled import PreparedTiledDense
    from spsparse_tpu.utils.benchtime import bench_slope
    from spsparse_tpu.utils.roofline import device_hbm_bandwidth

    rng = np.random.default_rng(0)
    m = 1 << 11 if on_cpu else 1 << 14
    # Sparse-wide regime (ncols >> nnz per row block): each column is
    # touched by ~1 row block, so a permutation CAN concentrate tiles.
    # (In the tall config-3 regime every column is shared by ~20 row
    # blocks and all tiles are occupied regardless — packing is a no-op
    # there by construction, which config 3 already covers.)
    K, N = 8, 128
    ncols = 8 * m
    rr = np.repeat(np.arange(m), K)
    cc = rng.integers(0, ncols, rr.size)
    b = CooBuilder((m, ncols), dtype=np.float32)
    b.add_many(np.stack([rr, cc], 1),
               rng.uniform(-1, 1, rr.size).astype(np.float32))
    A = b.build()
    n_tiles_raw = int(to_tiled(A).n_tiles)
    pg = prepare_general(A)
    interp = on_cpu
    X = jnp.asarray(rng.uniform(-1, 1, (ncols, N)).astype(np.float32))

    # Same round-4 harness shape as config 3: the dependency rides the
    # prepared operand's values; X is loop-invariant.
    import dataclasses as _dc

    def _perturb(p, eps):
        pr = p.prep
        if isinstance(pr, PreparedGatherEll):
            pr2 = _dc.replace(pr, vals=pr.vals.at[0, 0].add(
                eps.astype(pr.vals.dtype)))
        elif isinstance(pr, PreparedGather):
            pr2 = _dc.replace(pr, vals=pr.vals.at[0].add(eps))
        elif isinstance(pr, PreparedTiledDense):
            pr2 = _dc.replace(pr, blocks=pr.blocks.at[0, 0, 0, 0].add(
                eps.astype(pr.blocks.dtype)))
        else:
            pr2 = _dc.replace(pr, vals=pr.vals.at[0, 0, 0].add(eps))
        return _dc.replace(p, prep=pr2)

    def step(state):
        p, Xc = state
        Y = spmm_general(p, Xc, interpret=interp)
        return (_perturb(p, Y[0, 0] * jnp.float32(1e-30)), Xc)

    t = bench_slope(step, (pg, X), iters=4 if on_cpu else 8,
                    reps=3 if on_cpu else 5, u_lo=2, u_hi=6 if on_cpu else 10)
    # bf16-X arm (round 5): the ELL reduce's dominant stream is the
    # gathered X rows; a bf16 RHS (pre-converted once, loop-invariant —
    # same hoisting as config 3) measured 2.9 Gnnz/s vs 0.8 f32
    # (probes/probe_cfg3b_fix_r5.py).
    t_bf16x = None
    if not on_cpu and pg.kernel == "gather_ell":
        Xb = X.astype(jnp.bfloat16)
        t_bf16x = bench_slope(step, (pg, Xb), iters=8, reps=5,
                              u_lo=2, u_hi=10)
    nnz = rr.size
    kind, bw = device_hbm_bandwidth()
    from spsparse_tpu.ops.pallas_tiled_window import PreparedTiledWindow
    if isinstance(pg.prep, PreparedGatherEll):
        # ELL reduce (round 5): per slot one X row (incl. padding slots,
        # which gather row 0 via the fill mode) + cols/vals payload + Y
        n_tiles = 0
        p = pg.prep
        slots = p.cols.size
        esize = np.dtype(p.vals.dtype).itemsize
        bytes_moved = (slots * (4 + esize) + slots * N * 4
                       + m * N * 4)
    elif isinstance(pg.prep, PreparedGather):
        # row-gather layout: one 512B X row per entry + entry payload + Y
        n_tiles = 0
        bytes_moved = (nnz * (4 + 4 + 4) + nnz * N * 4
                       + -(-m // TILE) * TILE * N * 4)
    elif isinstance(pg.prep, PreparedTiledWindow):
        # window layout: dense per-tile payloads + one window per
        # super-row + Y once
        p = pg.prep
        esize = np.dtype(p.blocks.dtype).itemsize
        n_tiles = int(np.sum(np.asarray(p.offs) >= 0))
        bytes_moved = (p.blocks.size * esize
                       + p.wstart.shape[0] * p.ws * TILE * N * esize
                       + -(-m // TILE) * TILE * N * 4)
    else:
        if isinstance(pg.prep, PreparedTiledDense):
            n_tiles = int(np.sum(np.asarray(pg.prep.tcols) < pg.prep.nbc))
            esize = np.dtype(pg.prep.blocks.dtype).itemsize
            a_bytes = n_tiles * TILE * TILE * esize
        else:
            n_tiles = int(np.sum(np.asarray(pg.prep.tcols) < pg.prep.nbc))
            esize = 4
            a_bytes = n_tiles * pg.prep.tile_cap * (2 + esize)
        bytes_moved = (a_bytes + n_tiles * TILE * N * esize
                       + -(-m // TILE) * TILE * N * 4)
    sol_nnz = bw / (bytes_moved / nnz)
    achieved = nnz / t
    return {"config": "3b", "name": "spmm_packed_general_scattered",
            "impl": f"prepare_general/{pg.kernel}"
                    + (" (interpret)" if interp else ""),
            "rows": m, "nnz": nnz,
            "n_tiles_raw": n_tiles_raw, "n_tiles_packed": n_tiles,
            # tile reduction is meaningless for non-tiled layouts (the
            # gather layout has no tiles; r4's 82822.0 was a /max(0,1)
            # artifact — VERDICT r4 weak #4)
            "pack_tile_reduction": (n_tiles_raw / n_tiles if n_tiles
                                    else None),
            "time_s": t, "nnz_per_s": achieved,
            "bytes_model": ("ELL: one X row per slot + payload + Y (f32)"
                            if pg.kernel == "gather_ell" else
                            "packed layout: A payload + X tiles once + Y "
                            "(f32)"),
            "pct_of_roofline": 100.0 * achieved / sol_nnz,
            "bf16x_time_s": t_bf16x,
            "bf16x_nnz_per_s": (nnz / t_bf16x) if t_bf16x else None,
            "matrix": "uniform random columns (worst-case locality)"}


def config3c_large(on_cpu: bool) -> dict | None:
    """Config 3c (round 5, VERDICT r4 item 3): config 3 at the
    BASELINE-stated scale — 5M rows x 50 nnz/row x 128-col block —
    through the window SpMM kernel (bf16 blocks + bf16 RHS, f32 out).

    Gated behind ``SPSPARSE_BENCH_LARGE=1``: the host prepare +
    device transfer of the ~10.6 GB working set costs tens of minutes
    through this rig's tunnel, too heavy for every driver bench run;
    the artifact run sets the flag once and headline-only runs preserve
    the richer detail file."""
    import os
    if on_cpu:
        return None
    if os.environ.get("SPSPARSE_BENCH_LARGE") != "1":
        # Ungated runs must still carry the BASELINE-scale record (a full
        # --all rerun overwrites bench_detail.json — returning None here
        # would silently drop the documented 5M-row attempt from the
        # artifact): emit the measured round-5 outcome without re-running
        # the >110-min prepare.
        return {
            "config": "3c",
            "name": "spmm_tiled_5M_rows_baseline_scale",
            "status": "attempted_not_completed",
            "note": "BASELINE-scale 5M-row config 3 attempted twice on "
                    "this rig (probes/probe_cfg3_scale_r5.py + bench "
                    "config3c, SPSPARSE_BENCH_LARGE=1): the measured "
                    "blocker is the END-TO-END PREPARE, not the kernel — "
                    "host build + 262M-entry consolidate + dense-block "
                    "fill + 8 GB tunnel transfer exceeded 110 min before "
                    "the measurement phase (ladder phases measured: "
                    "1M-row build 26-56 s, prepare 207-354 s, transfer "
                    "32-43 s; 5M scales these ~5x and adds compile). "
                    "Largest completed rung: 1M rows x 50 nnz/row = 52M "
                    "nnz at 16.6 Gnnz/s (fat-step window kernel, "
                    "3.16 ms/call; ~83% of the honest dense-A model). "
                    "The kernel itself has no 5M blocker (working set "
                    "10.6 GB of 16 GB HBM); wall-clock of prepare "
                    "through this rig's tunnel is the documented "
                    "blocker (measured 2026-08-20, round 5).",
        }
    import gc
    import time
    import dataclasses

    from spsparse_tpu import CooBuilder
    from spsparse_tpu.core.tiled import to_tiled, TILE
    from spsparse_tpu.ops.pallas_tiled_window import (
        prepare_tiled_window, spmm_tiled_window_pallas)
    from spsparse_tpu.utils.roofline import device_hbm_bandwidth

    rng = np.random.default_rng(0)
    m, K, N, spread = 5 << 20, 50, 128, 128
    ncols = 2 * m
    t0 = time.perf_counter()
    rr = np.repeat(np.arange(m, dtype=np.int64), K)
    cc = np.clip(rr * 2 + rng.integers(-spread, spread + 1, rr.size),
                 0, ncols - 1)
    b = CooBuilder((m, ncols), dtype=np.float32)
    b.add_many(np.stack([rr, cc], 1),
               rng.uniform(-1, 1, rr.size).astype(np.float32))
    A = b.build()
    del rr, cc
    gc.collect()
    tl = to_tiled(A)
    # host stages ~10.7 GiB f32 for the 5.4 GiB bf16 device layout —
    # fine on this 125 GiB host, above the default anti-footgun guard
    prep = prepare_tiled_window(tl, group=32, host_limit_bytes=24 << 30)
    t_prep = time.perf_counter() - t0
    n_tiles = int(tl.n_tiles)
    X = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (ncols, N)).astype(np.float32)
        .astype(jnp.bfloat16)))
    prep = jax.device_put(prep)
    jax.block_until_ready((X, prep.blocks))
    t_xfer = time.perf_counter() - t0 - t_prep

    def step(state):
        p, Xc = state
        Y = spmm_tiled_window_pallas(p, Xc)
        eps = (Y[0, 0] * jnp.float32(1e-30)).astype(p.blocks.dtype)
        return (dataclasses.replace(
            p, blocks=p.blocks.at[0, 0, 0, 0].add(eps)), Xc)

    t = wide_slope(step, (prep, X),
                   lambda st: float(st[0].blocks[0, 0, 0, 0]),
                   u_lo=1, u_hi=5, reps=5)
    nnz = m * K
    occ_cb = int(np.unique(np.asarray(tl.tile_col)[: n_tiles]).size)
    # A charged at the kernel's actual dense-block traffic (see config 3)
    bytes_moved = (int(np.prod(prep.blocks.shape)) * 2
                   + occ_cb * TILE * N * 2
                   + -(-m // TILE) * TILE * N * 4)
    kind, bw = device_hbm_bandwidth()
    sol_nnz = bw / (bytes_moved / nnz)
    achieved = nnz / t
    return {"config": "3c", "name": "spmm_tiled_5M_rows_baseline_scale",
            "rows": m, "nnz": nnz, "n_tiles": n_tiles,
            "impl": "pallas_tiled_window_bf16 (bf16 RHS)",
            "prepare_s": t_prep, "transfer_s": t_xfer,
            "time_s": t, "nnz_per_s": achieved,
            "bytes_model": "dense A blocks once (bf16) + X once per "
                           "occupied column block (bf16) + Y once (f32)",
            "pct_of_roofline": 100.0 * achieved / sol_nnz,
            "matrix": "column-local regridding-style (spread 128), "
                      "BASELINE-stated 5M-row scale"}


def config4_spgemm(on_cpu: bool) -> dict:
    """Config 4: SpGEMM A A^T on the regridding-style matrix — round-5
    form per VERDICT r4 items 1+3: genuinely IRREGULAR row lengths
    (capped-zipf mixture) at 2^17 rows (large enough that operands and
    the output band cannot be VMEM-resident, so the streaming model is
    honest — at 2^15 XLA keeps the whole working set in this chip's
    large VMEM and any HBM roofline reads as impossible; measured,
    probes/probe_cfg4_window_r5b.py).

    Primary path (round 5): the rolling-window band kernel
    (ops.spgemm_window) — operand block rows streamed ONCE per
    super-group as multi-MB contiguous DMAs; 4.2x over the round-2/4
    pair-stream kernel at this scale. Roofline: the kernel overlaps its
    read and write streams (measured on this chip for both this kernel
    and the config-3 window kernel), so speed-of-light is
    ``max(read_bytes, write_bytes) / BW`` joined with the MXU floor
    ``n_dots * per-dot peak`` (bf16 21.3 ns = 98.5 TMAC/s book; f32
    HIGHEST 6-pass = 127.8 ns). The pair kernel and the general ESC
    path are reported alongside."""
    import dataclasses

    from spsparse_tpu.core.tiled import to_tiled, TILE
    from spsparse_tpu.ops.pallas_tiled import prepare_tiled_dense
    from spsparse_tpu.ops.spgemm import spgemm_aat, plan_spgemm_caps
    from spsparse_tpu.ops.spgemm_tiled import (
        densify_tiled, plan_tiled_spgemm, spgemm_tiled_xla,
        _spgemm_tiled_pallas)
    from spsparse_tpu.ops.spgemm_window import (plan_window_spgemm,
                                                spgemm_window_pallas)
    from spsparse_tpu.utils.benchtime import bench_slope
    from spsparse_tpu.utils.roofline import (device_hbm_bandwidth,
                                             spgemm_esc_stats)

    rng = np.random.default_rng(0)
    n_dst = 1 << 12 if on_cpu else 1 << 17
    # Irregular row lengths: capped zipf(2.0) — most rows 1-3 entries,
    # a heavy tail to 24 (BASELINE: "irregular row lengths"); column
    # locality stays regridding-style (c ~ 2r + jitter).
    k = np.minimum(rng.zipf(2.0, n_dst), 24).astype(np.int64)
    r = np.repeat(np.arange(n_dst), k)
    c = np.minimum(r * 2 + rng.integers(0, 3, r.size), n_dst * 2 - 1)
    from spsparse_tpu import CooBuilder
    b = CooBuilder((n_dst, n_dst * 2), dtype=np.float32)
    b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
    A = b.build()
    expand_cap, out_cap = plan_spgemm_caps(A, A, transpose_b=True)
    tl = to_tiled(A)
    kind, bw = device_hbm_bandwidth()
    tile_b = TILE * TILE

    def window_arm(dtype):
        prep = prepare_tiled_dense(tl, dtype=dtype)
        plan = plan_window_spgemm(prep.tcols, prep.tcols, nbc=prep.nbc,
                                  out_shape=(n_dst, n_dst), group=8,
                                  dtype=dtype)

        def step(blocks):
            band = spgemm_window_pallas(plan, blocks,
                                        interpret=bool(on_cpu))
            eps = (band[0, 0, 0, 0] * jnp.float32(1e-30)).astype(
                blocks.dtype)
            return blocks.at[0, 0, 0, 0].add(eps)

        if on_cpu:
            t = bench_slope(step, prep.blocks, iters=4, reps=3, u_lo=1,
                            u_hi=3)
        else:
            t = wide_slope(step, prep.blocks, lambda bl: float(
                jnp.sum(bl.astype(jnp.float32))))
        esize = np.dtype(dtype).itemsize
        read_b = plan.nsuper * plan.wrows * prep.tcols.shape[1] \
            * tile_b * esize
        write_b = plan.nbr_pad * plan.nband * tile_b * 4
        per_dot = 21.3e-9 if dtype == jnp.bfloat16 else 127.8e-9
        sol_t = max(max(read_b, write_b) / bw, plan.n_dots * per_dot)
        return t, plan, read_b, write_b, sol_t

    dt_main = jnp.float32 if on_cpu else jnp.bfloat16
    t, plan, read_b, write_b, sol_t = window_arm(dt_main)
    if on_cpu:
        t_f32, sol_f32 = t, sol_t
    else:
        t_f32, _, _, _, sol_f32 = window_arm(jnp.float32)

    # --- pair-stream kernel (round-2/4 path, for comparison) ---
    ta = densify_tiled(tl, dtype=dt_main)
    pplan = plan_tiled_spgemm(ta, ta, transpose_b=True)
    P, Tout = pplan.n_pairs, pplan.n_out_tiles
    if on_cpu:
        def step_pair(blocks):
            a = dataclasses.replace(ta, blocks=blocks)
            out = spgemm_tiled_xla(a, a, pplan).blocks
            eps = (out[0, 0, 0] * jnp.float32(1e-30)).astype(blocks.dtype)
            return blocks.at[0, 0, 0].add(eps)

        t_pair = bench_slope(step_pair, ta.blocks, iters=4, reps=3,
                             u_lo=1, u_hi=3)
    else:
        pa, pb, oid = (jnp.asarray(pplan.pa), jnp.asarray(pplan.pb),
                       jnp.asarray(pplan.oid))

        def step_pair(blocks):
            out = _spgemm_tiled_pallas(blocks, blocks, pa, pb, oid,
                                       transpose_b=True, n_out=Tout,
                                       interpret=False)
            eps = (out[0, 0, 0] * jnp.float32(1e-30)).astype(blocks.dtype)
            return blocks.at[0, 0, 0].add(eps)

        t_pair = wide_slope(step_pair, ta.blocks, lambda bl: float(
            jnp.sum(bl.astype(jnp.float32))))

    # --- ESC path (general-purpose; the only option without block
    # structure) ---
    def step_esc(a):
        res = spgemm_aat(a, cap=out_cap, expand_cap=expand_cap)
        eps = jnp.sum(res.vals) * jnp.float32(1e-38)
        return dataclasses.replace(a, vals=a.vals + eps)

    t_esc = bench_slope(step_esc, A, iters=4, reps=3, u_lo=1, u_hi=3)
    stats = spgemm_esc_stats(r.size, r.size, expand_cap, out_cap)
    sol_esc = stats.sol_nnz_per_s(bw)

    # --- planned ESC (round 5, VERDICT r4 item 6): pattern-static plan
    # sorts at prepare time; the per-call product is 2 gathers + one
    # sorted segment_sum — the repeated-product case every solver hits.
    from spsparse_tpu.ops.spgemm_planned import (plan_esc,
                                                 spgemm_planned_vals)
    eplan, eacon, ebcon = plan_esc(A, A, transpose_b=True)

    def step_pe(va):
        out = spgemm_planned_vals(eplan, va, ebcon.vals)
        return va + jnp.sum(out) * jnp.float32(1e-38)

    t_esc_planned = bench_slope(step_pe, eacon.vals, iters=4, reps=3,
                                u_lo=2, u_hi=6)

    achieved = expand_cap / t
    return {"config": 4, "name": "spgemm_aat_regrid_irregular",
            "rows": n_dst, "nnz_a": int(r.size),
            "row_lengths": "zipf(2.0) capped 24 "
                           f"(mean {r.size / n_dst:.2f}, max {int(k.max())})",
            "products": expand_cap,
            "impl": ("window_band (xla-interpret)" if on_cpu
                     else "window_band (pallas, bf16 blocks/f32 accum)"),
            "band_W": plan.W, "n_dots": plan.n_dots, "tile_pairs": P,
            "out_tiles": Tout,
            "time_s": t, "products_per_s": achieved,
            "bytes_model": "window: operand rows once/super-group (read) "
                           "|| out band f32 (write, overlapped); "
                           "sol = max(read, write, mxu_dots)",
            "read_bytes": read_b, "write_bytes": write_b,
            "pct_of_roofline": 100.0 * sol_t / t,
            "f32_time_s": t_f32,
            "f32_pct_of_roofline": 100.0 * sol_f32 / t_f32,
            "pair_kernel_time_s": t_pair,
            "window_speedup_vs_pair": t_pair / t,
            "esc_time_s": t_esc,
            "esc_products_per_s": expand_cap / t_esc,
            "esc_pct_of_roofline": 100.0 * (expand_cap / t_esc) / sol_esc,
            "esc_planned_time_s": t_esc_planned,
            "esc_planned_products_per_s": eplan.n_products
            / max(t_esc_planned, 1e-12),
            "esc_planned_speedup": t_esc / max(t_esc_planned, 1e-12)}


def config5_distributed(on_cpu: bool) -> dict:
    """Config 5: row-partitioned SpMV/SpGEMM across devices. Real
    multi-chip hardware is not reachable from this rig (single chip via
    tunnel), so: on CPU a real 8-virtual-device mesh executes the
    collective graphs (validating them end to end), and the scaling
    figures come from the auditable analytical model in
    spsparse_tpu/dist/model.py (v5e book bandwidths)."""
    from spsparse_tpu.dist import (a2a_footprint_for_target,
                                   a2a_weak_scaling_efficiency,
                                   halo_weak_scaling_efficiency,
                                   ring_weak_scaling_efficiency,
                                   uniform_footprint)

    out = {"config": 5, "name": "distributed_row_partitioned",
           "per_chip_workload": "1M rows, 11 nnz/row (config-2 family)",
           "model": "dist/model.py (overlapped ring / halo exchange / "
                    "footprint a2a, v5e book HBM+ICI bandwidths)",
           "pct_of_roofline": None}
    nnz_l, rows_l = 11 * (1 << 20), 1 << 20
    # footprint-bounded scattered matrix: comm = the device's column
    # footprint, independent of P (round-5 dist_spmv_a2a); the bound
    # shown is the largest footprint that still meets the 80% target.
    f80 = a2a_footprint_for_target(nnz_l, rows_l, target=0.8)
    out["a2a_footprint_80pct_bound"] = f80
    for p in (2, 8, 64):
        out[f"halo_weak_scaling_eff_p{p}"] = halo_weak_scaling_efficiency(
            nnz_local=nnz_l, rows_local=rows_l, halo=8, n_devices=p)
        out[f"ring_weak_scaling_eff_p{p}"] = ring_weak_scaling_efficiency(
            nnz_local=nnz_l, rows_local=rows_l, n_devices=p)
        out[f"a2a_bounded_weak_scaling_eff_p{p}"] = \
            a2a_weak_scaling_efficiency(nnz_l, rows_l, f80, p)
        # uniform-scatter worst case: footprint ~ min(nnz, ncols_global)
        f_uni = uniform_footprint(nnz_l, p * rows_l)
        out[f"a2a_uniform_weak_scaling_eff_p{p}"] = \
            a2a_weak_scaling_efficiency(nnz_l, rows_l, f_uni, p)
    out["meets_baseline_80pct"] = bool(
        out["halo_weak_scaling_eff_p8"] >= 0.8
        and out["a2a_bounded_weak_scaling_eff_p8"] >= 0.8)
    out["honest_gap"] = (
        "uniform-random matrices have footprint ~min(nnz_local, ncols) "
        "per device; a2a still beats the ring ~5x at P=64 "
        f"({out['a2a_uniform_weak_scaling_eff_p64']:.2f} vs "
        f"{out['ring_weak_scaling_eff_p64']:.2f}) but cannot meet 80% — "
        "no exchange can: the values genuinely needed exceed the ICI "
        "budget (dist/model.py a2a_weak_scaling_efficiency docstring)")

    if on_cpu and len(jax.devices()) >= 8:
        import time

        from jax.sharding import Mesh
        from spsparse_tpu.dist import (dist_spmv_halo, partition_rows,
                                       partition_vector)
        from spsparse_tpu import CooBuilder
        n = 1 << 12
        rng = np.random.default_rng(0)
        bld = CooBuilder((n, n), dtype=np.float32)
        rows = np.repeat(np.arange(n), 3)
        cols = np.clip(rows + rng.integers(-2, 3, rows.size), 0, n - 1)
        bld.add_many(np.stack([rows, cols], 1),
                     rng.uniform(-1, 1, rows.size).astype(np.float32))
        A = bld.build()
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("x",))
        part = partition_rows(A, 8)
        xp = partition_vector(np.ones(n, np.float32), 8)
        t0 = time.perf_counter()
        jax.block_until_ready(dist_spmv_halo(part, xp, mesh, halo=8))
        out["virtual_mesh_exec"] = {
            "devices": 8, "halo_spmv_wall_s": time.perf_counter() - t0,
            "note": "virtual CPU mesh: validates the collective graph, "
                    "not ICI timing"}
    return out


def extra_configs(on_cpu: bool):
    """Yield each BASELINE config as it completes (generator — callers
    persist incrementally so a wedged config cannot lose earlier ones)."""
    import traceback

    # config 1 LAST: its 32-way-vmapped ESC chain is the largest compile
    # in the suite and the remote-compile service sometimes takes tens of
    # minutes on it — the perf configs must not be hostage to that.
    for name, fn in [("config2b", lambda: config2b_multirhs(on_cpu)),
                     ("config2c", lambda: config2c_unstructured(on_cpu)),
                     ("config3", lambda: config3_spmm(on_cpu)),
                     ("config3b", lambda: config3b_packed_general(on_cpu)),
                     ("config3c", lambda: config3c_large(on_cpu)),
                     ("config4", lambda: config4_spgemm(on_cpu)),
                     ("config5", lambda: config5_distributed(on_cpu)),
                     ("config1", config1_reference_check)]:
        # One config failing (e.g. a tunnel hiccup mid-compile) must not
        # take down the remaining configs or the headline line.
        try:
            cfg = fn()
        except Exception as e:  # pragma: no cover - defensive
            traceback.print_exc(file=sys.stderr)
            cfg = {"config": name, "error": f"{type(e).__name__}: {e}"}
        if cfg:
            yield cfg


def flag_suspect(cfg: dict) -> dict:
    """Mark physically impossible readings: a pct_of_roofline above ~105
    means the measurement (not the kernel) is wrong — this rig's tunnel
    sometimes enters a state where even wide-arm slopes read over the
    speed of light (observed 115-130% on kernels whose robust readings
    are 70-95%). Downstream consumers must not trust flagged entries."""
    for key in ("pct_of_roofline", "f32_pct_of_roofline",
                "esc_pct_of_roofline"):
        v = cfg.get(key)
        if v is not None and v > 105.0:
            cfg["tunnel_suspect"] = True
            cfg["tunnel_suspect_note"] = (
                f"{key}={v:.1f} exceeds the speed of light; re-measure "
                "(docs/PERFORMANCE.md round-4 measurement notes)")
    return cfg


def measure_headline(n: int, band: int, use_pallas: bool,
                     max_retries: int = 2) -> dict:
    """Self-policing headline measurement (VERDICT r4 weak #1): the
    headline config is subject to the same physical-possibility check as
    the ``--all`` configs. A ``pct_of_roofline`` above ~105 is over the
    speed of light — a tunnel/measurement artifact, not a kernel result —
    so re-measure (bounded retries) and publish the best *physically
    possible* reading; if every attempt is impossible, keep the lowest
    reading and carry ``tunnel_suspect`` into the headline JSON so the
    artifact is explicitly marked rather than silently wrong."""
    attempts = []
    for _ in range(1 + max_retries):
        res = bench_spmv(n, band, use_pallas)
        attempts.append(res)
        if res["detail"]["pct_of_roofline"] <= 105.0:
            if len(attempts) > 1:
                res["detail"]["headline_retries"] = len(attempts) - 1
            return res
    # No physically possible reading: report the slowest (least wrong)
    # attempt, flagged.
    res = min(attempts, key=lambda r: r["detail"]["pct_of_roofline"])
    res["tunnel_suspect"] = True
    res["detail"]["tunnel_suspect"] = True
    res["detail"]["tunnel_suspect_note"] = (
        f"all {len(attempts)} headline measurements exceeded 105% of the "
        "4B/nnz roofline (speed of light); tunnel measurement artifact — "
        "see docs/PERFORMANCE.md measurement notes")
    res["detail"]["headline_retries"] = len(attempts) - 1
    return res


def write_detail(configs: list[dict], path: str = "bench_detail.json", *,
                 headline_only: bool = False) -> None:
    """Persist the full bench matrix for round-over-round comparison
    (VERDICT r3 item 4): every computed config with its bytes model and
    ``pct_of_roofline``, plus platform metadata. The stdout contract
    (exactly one headline JSON line) is untouched — this goes to a file.

    Only a *headline-only* run defers to a richer existing artifact; an
    ``--all`` rerun always overwrites incrementally, so a wedged rerun
    leaves a partial-but-fresh artifact instead of silently retaining a
    stale one (ADVICE r4)."""
    import datetime
    import os

    target = os.environ.get("SPSPARSE_BENCH_DETAIL", path)
    if target.lower() in ("0", "none", "off"):
        return
    doc = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "written_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "configs": configs,
    }
    # bench.py may be exec'd without __file__ (the contract test does) —
    # fall back to the cwd
    fp = globals().get("__file__")
    base = os.path.dirname(os.path.abspath(fp)) if fp else os.getcwd()
    out = target if os.path.isabs(target) else os.path.join(base, target)
    # a headline-only run must not clobber a richer --all artifact
    if headline_only:
        try:
            with open(out) as f:
                existing = json.load(f)
            if len(existing.get("configs", [])) > len(configs):
                return
        except Exception:
            pass
    try:
        with open(out, "w") as f:
            json.dump(doc, f, indent=1)
            f.write("\n")
    except OSError as e:  # pragma: no cover - read-only checkouts
        print(f"bench_detail write failed: {e}", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    on_cpu = jax.devices()[0].platform == "cpu"
    n = args.n or (1 << 16 if on_cpu else 1 << 20)
    use_pallas = not args.no_pallas and not on_cpu
    res = measure_headline(n, band=5, use_pallas=use_pallas)

    detail = [res]
    write_detail(detail, headline_only=not args.all)
    if args.all:
        print(json.dumps(res, indent=1), file=sys.stderr)
        for cfg in extra_configs(on_cpu):
            cfg = flag_suspect(cfg)
            print(json.dumps(cfg, indent=1), file=sys.stderr)
            detail.append(cfg)
            # incremental: a wedged later config must not lose the
            # configs already measured
            write_detail(detail)

    headline = {
        "metric": res["metric"],
        "value": res["value"],
        "unit": res["unit"],
        "vs_baseline": res["vs_baseline"],
    }
    if res.get("tunnel_suspect"):
        headline["tunnel_suspect"] = True
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
