"""Probe: batched multi-RHS CG amortization on the real chip.

Compares per-solve CG iteration cost at k=8 right-hand sides:
  (a) composed single-RHS cg_solve over the packed DIA Pallas SpMV,
      run once per RHS (8x the known ~114 us/iter);
  (b) cg_solve_mrhs over the multi-RHS DIA kernel (one shared diagonal
      stream per iteration for all 8 solves; row-layout kernel wrapped
      with transposes).

Timing: slope method on the CG *step* (one iteration), wide unrolls.
Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 900 python probes/probe_mrhs_cg_r2.py
"""

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    from spsparse_tpu.core.dia import SparseDIA
    from spsparse_tpu.ops.pallas_dia import prepare_dia, spmv_dia_pallas
    from spsparse_tpu.ops.pallas_dia_mrhs import spmm_dia_mrhs_pallas
    from spsparse_tpu.solvers.iterative import CGState, cg_step
    from spsparse_tpu.utils.benchtime import bench_slope

    n = 1 << 20
    offsets = tuple(range(-5, 6))
    rng = np.random.default_rng(0)
    K = len(offsets)
    data = rng.uniform(-0.3, 0.3, (K, n)).astype(np.float32)
    # SPD-ish: dominant main diagonal (CG convergence irrelevant to timing,
    # but keep the iteration numerically sane).
    data[offsets.index(0)] = np.abs(data).sum(0) + 1.0
    dia = SparseDIA(data=jnp.asarray(data), offsets=offsets, shape=(n, n))
    prep = prepare_dia(dia)

    k = 8
    B = jnp.asarray(rng.uniform(-1, 1, (n, k)).astype(np.float32))
    b1 = B[:, 0]

    # (a) single-RHS CG step over the packed streaming kernel
    mv = lambda v: spmv_dia_pallas(prep, v)
    s0 = CGState(x=jnp.zeros_like(b1), r=b1, p=b1, rs=jnp.vdot(b1, b1))
    t_single = bench_slope(lambda s: cg_step(mv, s), s0, u_lo=2, u_hi=16,
                           iters=8, reps=5)
    print(f"single-RHS CG step: {t_single*1e6:8.1f} us/iter "
          f"-> {8*t_single*1e6:8.1f} us for 8 solves")

    # (b) batched CG step over the multi-RHS kernel (row layout wrapped)
    mm = lambda M: spmm_dia_mrhs_pallas(prep, M.T).T

    def col_dot(u, v):
        return jnp.sum(u * v, axis=0)

    def mstep(state):
        x, r, p, rz = state
        Ap = mm(p)
        denom = col_dot(p, Ap)
        alpha = rz / jnp.where(denom == 0, 1, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        rz_new = col_dot(r, r)
        beta = rz_new / jnp.where(rz == 0, 1, rz)
        p = r + beta * p
        return (x, r, p, rz_new)

    ms0 = (jnp.zeros_like(B), B, B, col_dot(B, B))
    t_mrhs = bench_slope(mstep, ms0, u_lo=2, u_hi=16, iters=8, reps=5)
    print(f"batched CG step (k=8): {t_mrhs*1e6:8.1f} us/iter "
          f"= {t_mrhs/8*1e6:8.1f} us per solve")
    print(f"amortization: {8*t_single/t_mrhs:5.2f}x vs 8 sequential solves")

    # row-layout variant (no transposes: state kept (k, n))
    def rstep(state):
        x, r, p, rz = state
        Ap = spmm_dia_mrhs_pallas(prep, p)
        denom = jnp.sum(p * Ap, axis=1)
        alpha = (rz / jnp.where(denom == 0, 1, denom))[:, None]
        x = x + alpha * p
        r = r - alpha * Ap
        rz_new = jnp.sum(r * r, axis=1)
        beta = (rz_new / jnp.where(rz == 0, 1, rz))[:, None]
        p = r + beta * p
        return (x, r, p, rz_new)

    Bt = B.T
    rs0 = (jnp.zeros_like(Bt), Bt, Bt, jnp.sum(Bt * Bt, axis=1))
    t_row = bench_slope(rstep, rs0, u_lo=2, u_hi=16, iters=8, reps=5)
    print(f"batched CG step, row layout (k=8): {t_row*1e6:8.1f} us/iter "
          f"= {t_row/8*1e6:8.1f} us per solve")


if __name__ == "__main__":
    main()
