"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: SpMV throughput (nnz/s) on the BASELINE.md config-2 matrix — a
synthetic banded matrix, ~10 nnz/row, 1M rows on TPU (scaled down on CPU) —
against the speed-of-light HBM roofline. ``vs_baseline`` is achieved
throughput relative to the BASELINE.json target of 70% of roofline
(>= 1.0 means the target is met).

Run: ``python bench.py``  (add ``--all`` for the full per-config table on
stderr; the last stdout line is always the single headline JSON).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


# Speed-of-light HBM bandwidth per chip, bytes/s.
HBM_BW = {
    "TPU v4": 1.2e12,
    "TPU v5 lite": 8.19e11,
    "TPU v5": 8.19e11,
    "TPU v5p": 2.77e12,
    "TPU v6 lite": 1.64e12,
    "TPU v6e": 1.64e12,
    "cpu": 5.0e10,
}


def device_bandwidth() -> tuple[str, float]:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu")
    for k, bw in HBM_BW.items():
        if kind.startswith(k):
            return kind, bw
    return kind, HBM_BW["cpu"]


def build_banded_ell(n: int, band: int, dtype=np.float32):
    """Direct ELL construction of a banded matrix (rows x (2*band+1))."""
    from spsparse_tpu.core.structure import SparseELL

    k = 2 * band + 1
    rng = np.random.default_rng(0)
    offs = np.arange(-band, band + 1)
    cols = np.arange(n)[:, None] + offs[None, :]
    valid = (cols >= 0) & (cols < n)
    vals = rng.uniform(-1, 1, (n, k)).astype(dtype)
    cols = np.where(valid, cols, n).astype(np.int32)
    vals = np.where(valid, vals, 0)
    return SparseELL(cols=jnp.asarray(cols), vals=jnp.asarray(vals),
                     shape=(n, n)), int(valid.sum())


def bench_spmv(n: int, band: int) -> dict:
    from spsparse_tpu.ops.spmv_kernels import best_spmv
    from spsparse_tpu.utils.benchtime import bench_chained

    ell, nnz = build_banded_ell(n, band)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, n)
                    .astype(np.float32))
    fn = jax.jit(best_spmv)
    # y has the same shape as x, so iterations chain through a real data
    # dependency (see utils.benchtime for why that is required here).
    t = bench_chained(lambda v: fn(ell, v), x, iters=20)
    kind, bw = device_bandwidth()
    # Bytes model: cols(4)+vals(4) streamed once per nnz; x (4B/row) loaded
    # once (it fits in VMEM and XLA keeps it resident); y written once.
    bytes_moved = nnz * 8 + ell.nrows * 8
    sol_nnz_s = bw / (bytes_moved / nnz)
    achieved = nnz / t
    return {
        "metric": "spmv_banded_nnz_per_s",
        "value": achieved,
        "unit": "nnz/s",
        "vs_baseline": achieved / (0.7 * sol_nnz_s),
        "detail": {
            "n": n, "nnz": nnz, "time_s": t, "device": kind,
            "bytes_moved": bytes_moved,
            "pct_of_roofline": 100.0 * achieved / sol_nnz_s,
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="print extra per-config results to stderr")
    ap.add_argument("--n", type=int, default=None)
    args = ap.parse_args()

    on_cpu = jax.devices()[0].platform == "cpu"
    n = args.n or (1 << 16 if on_cpu else 1 << 20)
    res = bench_spmv(n, band=5)

    if args.all:
        print(json.dumps(res, indent=2), file=sys.stderr)

    headline = {
        "metric": res["metric"],
        "value": res["value"],
        "unit": res["unit"],
        "vs_baseline": res["vs_baseline"],
    }
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
