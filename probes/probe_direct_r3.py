"""Round-3 probe: device level-sweep triangular solve on the real TPU.

Measures the ELL sweep (one full solve: nlev-1 sweeps) against the
roofline and against the native host substitution for:
  (a) synthetic shallow-level lower factor: n=1M, K=8 nnz/row, nlev=16
  (b) spilu(Poisson 256x256, fill 4) L factor apply (preconditioner op)
Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_direct_r3.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu.utils.benchtime import bench_fori


def shallow_tri(n, K, nlev, seed=0):
    """Lower-triangular with rows at level l depending only on rows of
    level l-1: n/nlev rows per level, K deps each."""
    rng = np.random.default_rng(seed)
    per = n // nlev
    rows, cols, vals = [], [], []
    for l in range(1, nlev):
        r = np.arange(l * per, (l + 1) * per)
        for k in range(K):
            c = rng.integers((l - 1) * per, l * per, per)
            rows.append(r); cols.append(c)
            vals.append(rng.standard_normal(per) * 0.1)
    rows = np.concatenate(rows); cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    d = np.arange(n)
    rows = np.concatenate([rows, d]); cols = np.concatenate([cols, d])
    vals = np.concatenate([vals, np.full(n, 2.0)])
    import scipy.sparse as ssp
    return ssp.csc_matrix((vals, (rows, cols)), shape=(n, n))


def main():
    from spsparse_tpu.solvers.direct import _TriPlan, _sweep_solve_ell
    n, K, nlev = 1 << 20, 8, 16
    S = shallow_tri(n, K, nlev)
    plan = _TriPlan(n, S.indptr.astype(np.int64),
                    S.indices.astype(np.int64), S.data, lower=True)
    print("kind:", plan.kind, "nlev:", plan.nlev, "nnz strict:",
          S.nnz - n, flush=True)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    C, W = plan.payload
    C = jnp.asarray(C); W = jnp.asarray(W, jnp.float32)
    dinv = jnp.asarray(plan.dinv, jnp.float32)
    ns = plan.nlev - 1

    t0 = time.time()
    x = _sweep_solve_ell(C, W, dinv, b, ns).block_until_ready()
    print(f"first call (compile+run): {time.time()-t0:.1f} s", flush=True)
    # full-solve step chained: b -> x (shape-preserving)
    t = bench_fori(lambda y: _sweep_solve_ell(C, W, dinv, y, ns), b,
                   iters=10, reps=3)
    nnz = int(S.nnz - n)
    # per solve: ns sweeps, each reads C+W (n*K*(4+4)B) + x gathers + writes
    bytes_per_sweep = n * K * (4 + 4) + n * 4 * 3
    sol = bytes_per_sweep * ns / 819e9          # v5e ~819 GB/s
    print(f"device full solve: {t*1e3:.2f} ms  ({ns} sweeps, "
          f"{t/ns*1e6:.0f} us/sweep)", flush=True)
    print(f"speed-of-light: {sol*1e3:.2f} ms  -> {100*sol/t:.0f}% of SoL",
          flush=True)

    # host comparison
    bh = np.asarray(b, np.float64)
    from spsparse_tpu import native
    t0 = time.time()
    for _ in range(3):
        native.trisolve_host(n, plan.colptr, plan.rowind, plan.val, bh,
                             lower=True)
    th = (time.time() - t0) / 3
    print(f"host sequential solve: {th*1e3:.2f} ms  "
          f"(device speedup {th/t:.1f}x)", flush=True)


if __name__ == "__main__":
    main()


def banded_probe():
    """Banded lower factor (RCM-shaped): n=1M, bandwidth 8 -> DIA sweep."""
    from spsparse_tpu.solvers.direct import _TriPlan, _sweep_solve_dia
    import scipy.sparse as ssp
    rng = np.random.default_rng(0)
    n = 1 << 20
    bw = 8
    diags = [np.full(n, 2.0)]
    offs = [0]
    for k in range(1, bw + 1):
        diags.append(np.concatenate([rng.standard_normal(n - k) * 0.1,
                                     np.zeros(k)]))
        offs.append(-k)
    S = ssp.diags(diags, offs, shape=(n, n), format="csc")
    plan = _TriPlan(n, S.indptr.astype(np.int64),
                    S.indices.astype(np.int64), S.data, lower=True)
    print("banded kind:", plan.kind, "nlev:", plan.nlev, flush=True)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    dinv = jnp.asarray(plan.dinv, jnp.float32)
    ns = plan.nlev - 1
    if plan.nlev > 4000:
        # level depth = n for a contiguous band; the DIA sweep cost is
        # nlev * band-SpMV -- measure ONE sweep and extrapolate.
        ns = 64
    t0 = time.time()
    _sweep_solve_dia(plan.payload, dinv, b, ns).block_until_ready()
    print(f"first call ({ns} sweeps): {time.time()-t0:.1f} s", flush=True)
    t = bench_fori(lambda y: _sweep_solve_dia(plan.payload, dinv, y, ns),
                   b, iters=5, reps=3)
    nnz = n * bw
    print(f"device: {t/ns*1e6:.0f} us/sweep = "
          f"{nnz/(t/ns)/1e9:.1f} Gnnz/s per sweep", flush=True)
    bh = np.asarray(b, np.float64)
    from spsparse_tpu import native
    t0 = time.time()
    for _ in range(3):
        native.trisolve_host(n, plan.colptr, plan.rowind, plan.val, bh,
                             lower=True)
    th = (time.time() - t0) / 3
    print(f"host sequential full solve: {th*1e3:.1f} ms", flush=True)
    print(f"device full solve would be {plan.nlev - 1} sweeps = "
          f"{(plan.nlev - 1) * t/ns * 1e3:.0f} ms", flush=True)
