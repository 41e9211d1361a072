"""TPU probe: CG iteration cost on the config-2 banded operator at 1M rows.

Decides roadmap item 3 (fused CG-step megakernel): measures the
XLA-composed cg_step with each available matvec (XLA DIA, Pallas DIA) via
the slope method, plus the bare matvec, to size the fusion headroom.
Floor model: data 44MB + ~10 vector passes x 4MB ~= 124 us/iter at 680GB/s.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from bench import build_banded_dia
    from spsparse_tpu.ops.pallas_dia import prepare_dia, spmv_dia_pallas
    from spsparse_tpu.ops.spmv_kernels import spmv_dia
    from spsparse_tpu.solvers.iterative import CGState, cg_step
    from spsparse_tpu.utils.benchtime import bench_slope

    print(jax.devices(), flush=True)
    n = 1 << 20
    dia, nnz = build_banded_dia(n, 5)
    prep = prepare_dia(dia)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    x0 = jnp.zeros_like(b)
    st0 = CGState(x=x0, r=b, p=b, rs=jnp.vdot(b, b))

    for name, mv in (("pallas", lambda v: spmv_dia_pallas(prep, v)),
                     ("xla_dia", lambda v: spmv_dia(dia, v))):
        t = bench_slope(lambda s: cg_step(mv, s), st0,
                        iters=8, reps=5, u_lo=2, u_hi=8)
        print(json.dumps({"probe": "cg_step", "mv": name, "n": n,
                          "t_iter": t, "nnz_s": nnz / t}), flush=True)

    # bare matvec for reference (loop-carried)
    def mv_step(v):
        y = spmv_dia_pallas(prep, v)
        return y * (1.0 / jnp.float32(11.0))  # keep magnitude bounded

    t = bench_slope(mv_step, b, iters=8, reps=5, u_lo=2, u_hi=8)
    print(json.dumps({"probe": "bare_spmv", "t": t, "nnz_s": nnz / t}),
          flush=True)

    # vector-op-only step (no matvec): isolates the non-SpMV cost
    def vec_step(s):
        alpha = s.rs / jnp.vdot(s.p, s.p)
        x = s.x + alpha * s.p
        r = s.r - alpha * s.p
        rs = jnp.vdot(r, r)
        p = r + (rs / s.rs) * s.p
        return CGState(x=x, r=r, p=p, rs=rs)

    t = bench_slope(vec_step, st0, iters=8, reps=5, u_lo=2, u_hi=8)
    print(json.dumps({"probe": "vec_ops_only", "t": t}), flush=True)

    # v2 fused megakernel: slope between two iteration counts of the
    # single-launch solve cancels the launch + b-staging cost.
    import time
    from spsparse_tpu.ops.pallas_cg import CG_BLOCK, cg_solve_dia_pallas
    prep_cg = prepare_dia(dia, block=CG_BLOCK)

    def run_T(T):
        x, rs = cg_solve_dia_pallas(prep_cg, b, iters=T, shift=4.0)
        return float(rs)

    # Wide arm: DeltaT=32 once read 410 us/iter off tunnel spikes where
    # DeltaT=64 at 7 reps reads a stable 89 us.
    for T in (8, 72):
        run_T(T)  # compile
    times = {}
    for T in (8, 72):
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            run_T(T)  # rs fetch forces completion
            ts.append(time.perf_counter() - t0)
        times[T] = sorted(ts)[len(ts) // 2]
    t_iter = (times[72] - times[8]) / 64
    print(json.dumps({"probe": "cg_megakernel_v2", "t_iter": t_iter,
                      "nnz_s": nnz / t_iter,
                      "t_T8": times[8], "t_T72": times[72]}), flush=True)

    # correctness on chip: agreement with the composed loop
    from spsparse_tpu.solvers.iterative import cg_solve
    x2, rs2 = cg_solve_dia_pallas(prep_cg, b, iters=30, shift=4.0)
    xc, _ = cg_solve(lambda v: spmv_dia_pallas(prep, v) + 4.0 * v,
                     b, iters=30)
    d = float(jnp.max(jnp.abs(x2 - xc)))
    print(json.dumps({"probe": "cg_v2_vs_composed", "maxdiff": d,
                      "rs": float(rs2)}), flush=True)


if __name__ == "__main__":
    main()
