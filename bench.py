"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: SpMV throughput (nnz/s) on the BASELINE.md config-2 matrix — a
synthetic banded matrix, ~10 nnz/row, 1M rows on TPU (scaled down on CPU) —
via the Pallas DIA kernel (gather-free banded SpMV), timed with the
in-graph chained harness (``spsparse_tpu.utils.benchtime.bench_fori``; see
CLAUDE.md for why naive timing is invalid on this machine's remote TPU
tunnel). ``vs_baseline`` is achieved throughput relative to the
BASELINE.json target of 70% of the HBM speed-of-light roofline (>= 1.0
means the target is met). The roofline model charges ``4*nnz`` bytes for
the diagonal data plus ``8*nrows`` for x and y.

Run: ``python bench.py``  (``--all`` adds per-config detail on stderr;
the last stdout line is always the single headline JSON).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp


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
    from spsparse_tpu.ops.pallas_dia import spmv_dia_pallas, prepare_dia
    from spsparse_tpu.ops.pallas_dia_chain import spmv_dia_chain_pallas
    from spsparse_tpu.utils.benchtime import bench_slope
    from spsparse_tpu.utils.roofline import device_hbm_bandwidth

    dia, nnz = build_banded_dia(n, band)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, n)
                    .astype(np.float32))
    if use_pallas:
        # Steady-state kernel throughput: T device-resident SpMV iterations
        # per launch; per-iteration time = slope between two T values
        # (cancels this rig's large per-call tunnel latency — see
        # docs/PERFORMANCE.md "methodology").
        prep = prepare_dia(dia)

        def run(T):
            y = spmv_dia_chain_pallas(prep, x, iters=T, scale=0.3)
            return float(jnp.sum(y))

        t_lo_T, t_hi_T = 8, 88
        run(t_lo_T)
        run(t_hi_T)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(t_lo_T)
            lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(t_hi_T)
            hi = time.perf_counter() - t0
            samples.append((hi - lo) / (t_hi_T - t_lo_T))
        t = float(np.median(samples))
        impl = "pallas_dia_chain_steady_state"
    else:
        step = lambda v: spmv_dia(dia, v)
        t = bench_slope(step, x, iters=8, reps=3)
        impl = "xla_dia"

    kind, bw = device_hbm_bandwidth()
    bytes_moved = nnz * 4 + n * 8
    sol_nnz_s = bw / (bytes_moved / nnz)
    achieved = nnz / t
    return {
        "metric": "spmv_banded_nnz_per_s",
        "value": achieved,
        "unit": "nnz/s",
        "vs_baseline": achieved / (0.7 * sol_nnz_s),
        "detail": {
            "impl": impl, "n": n, "nnz": nnz, "time_s": t, "device": kind,
            "bytes_moved": bytes_moved,
            "pct_of_roofline": 100.0 * achieved / sol_nnz_s,
            "effective_gb_s": bytes_moved / t / 1e9,
        },
    }


def extra_configs(on_cpu: bool) -> list[dict]:
    """Smaller side benchmarks for --all (configs 1/3/4 scaled)."""
    import dataclasses

    from spsparse_tpu import CooBuilder
    from spsparse_tpu.core.tiled import to_tiled
    from spsparse_tpu.ops.pallas_tiled import (prepare_tiled_rows,
                                               spmm_tiled_pallas)
    from spsparse_tpu.ops.tiled_ops import spmm_tiled
    from spsparse_tpu.ops.spgemm import spgemm_aat, plan_spgemm_caps
    from spsparse_tpu.utils.benchtime import bench_fori

    rng = np.random.default_rng(0)
    out = []

    # Config 2b: multi-RHS banded SpMM (8 RHS amortize the diagonal
    # stream; per-RHS-equivalent throughput approaches the HBM roofline).
    if not on_cpu:
        from spsparse_tpu.ops.pallas_dia import prepare_dia
        from spsparse_tpu.ops.pallas_dia_mrhs import spmm_dia_mrhs_pallas
        from spsparse_tpu.utils.benchtime import bench_slope
        dia, nnz = build_banded_dia(1 << 20, 5)
        prep = prepare_dia(dia)
        X = jnp.asarray(rng.uniform(-1, 1, (8, 1 << 20)).astype(np.float32))
        t = bench_slope(lambda Xv: spmm_dia_mrhs_pallas(prep, Xv), X,
                        iters=6, reps=3, u_lo=1, u_hi=3)
        out.append({"config": "spmv_banded_8rhs", "nnz": nnz,
                    "time_s": t, "nnz_per_s_aggregate": 8 * nnz / t})

    # Config 3 (scaled): sparse (50 nnz/row) x dense 128 block via the
    # Pallas tiled one-hot kernel (the XLA-level path materializes the
    # one-hot tensors in HBM and OOMs at scale).
    m = 1 << 12 if on_cpu else 1 << 15
    K, N = 50, 128
    b = CooBuilder((m, m), dtype=np.float32)
    rr = np.repeat(np.arange(m), K)
    cc = rng.integers(0, m, rr.size)
    b.add_many(np.stack([rr, cc], 1),
               rng.uniform(-1, 1, rr.size).astype(np.float32))
    tl = to_tiled(b.build())
    X = jnp.asarray(rng.uniform(-1, 1, (m, N)).astype(np.float32))
    if on_cpu:
        t = bench_fori(lambda Y: spmm_tiled(tl, Y), X, iters=3, reps=2)
        impl = "xla_tiled"
    else:
        prep = prepare_tiled_rows(tl)
        t = bench_fori(lambda Y: spmm_tiled_pallas(prep, Y), X, iters=3,
                       reps=2)
        impl = "pallas_tiled"
    out.append({"config": "spmm_tiled_50nnz_128block", "impl": impl,
                "rows": m, "nnz": m * K, "n_tiles": int(tl.n_tiles),
                "tile_cap": tl.tile_cap, "time_s": t,
                "nnz_per_s": m * K / t})

    # Config 4 (scaled): SpGEMM A A^T on a regridding-style matrix. The
    # chain feeds a data-dependent (numerically negligible) epsilon back
    # into A's values so iterations cannot be elided or overlapped.
    n_dst = 1 << 12 if on_cpu else 1 << 15
    per = 4
    r = np.repeat(np.arange(n_dst), per)
    c = np.minimum(r * 2 + rng.integers(0, 3, r.size), n_dst * 2 - 1)
    b = CooBuilder((n_dst, n_dst * 2), dtype=np.float32)
    b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
    A = b.build()
    expand_cap, out_cap = plan_spgemm_caps(A, A, transpose_b=True)

    def step(a):
        res = spgemm_aat(a, cap=out_cap, expand_cap=expand_cap)
        eps = jnp.sum(res.vals) * jnp.float32(1e-38)
        return dataclasses.replace(a, vals=a.vals + eps)

    t = bench_fori(step, A, iters=5, reps=2)
    out.append({"config": "spgemm_aat_regrid", "nnz_a": r.size,
                "products": expand_cap, "time_s": t,
                "products_per_s": expand_cap / t})
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    on_cpu = jax.devices()[0].platform == "cpu"
    n = args.n or (1 << 16 if on_cpu else 1 << 20)
    use_pallas = not args.no_pallas and not on_cpu
    res = bench_spmv(n, band=5, use_pallas=use_pallas)

    if args.all:
        print(json.dumps(res, indent=1), file=sys.stderr)
        for cfg in extra_configs(on_cpu):
            print(json.dumps(cfg, indent=1), file=sys.stderr)

    headline = {
        "metric": res["metric"],
        "value": res["value"],
        "unit": res["unit"],
        "vs_baseline": res["vs_baseline"],
    }
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
