"""Round 5: where does the config-3b gather path's time actually go?

probe_r5_prims measured the raw XLA row-take at this exact shape at
1.95 ns/row f32 (263 GB/s) and 0.78 ns/row bf16 — nowhere near the
10.5 ns/row the round-4 notes assumed. The 3b gather path measures
~9 ns/entry end to end, so ~4.5x is lost to the COMPOSITION
(materialized intermediates + segment_sum). Decompose it and try leaner
formulations:

  (a) current: segment_sum(vals[:,None] * take(X, cols), rows)
  (b) bf16 X stream, f32 accumulate
  (c) ELL reduce: K is fixed per row (or padded to Kmax) ->
      (vals.reshape(m,K,1) * take(X, cols).reshape(m,K,N)).sum(1)
      — no segment machinery at all
  (d) ELL + bf16 X

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 1800 python probes/probe_cfg3b_fix_r5.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from spsparse_tpu.utils.compilecache import enable_persistent_cache

enable_persistent_cache()


def wide_slope(step, init, fetch, u_lo=2, u_hi=10, reps=5):
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


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    m, K, N = 1 << 14, 8, 128
    ncols = 8 * m
    nnz = m * K
    cols = rng.integers(0, ncols, nnz).astype(np.int32)
    # row-major sorted entries (the PreparedGather layout)
    rows = np.repeat(np.arange(m), K).astype(np.int32)
    vals = rng.uniform(-1, 1, nnz).astype(np.float32)
    Xh = rng.uniform(-1, 1, (ncols, N)).astype(np.float32)
    X = jnp.asarray(Xh)
    Xb = X.astype(jnp.bfloat16)
    colsj = jnp.asarray(cols)
    rowsj = jnp.asarray(rows)
    valsj = jnp.asarray(vals)

    want = np.zeros((m, N), np.float32)
    np.add.at(want, rows, vals[:, None] * Xh[cols])

    def run(name, f, Xv, tol=1e-3):
        y = np.asarray(jax.block_until_ready(f(Xv)))
        rel = np.abs(y - want).max() / np.abs(want).max()
        assert rel < tol, (name, rel)

        def step(Xc):
            o = f(Xc)
            return Xc.at[0, 0].add((jnp.sum(o) * 1e-38).astype(Xc.dtype))

        t = wide_slope(step, Xv, lambda Xc: float(Xc[0, 0]))
        print(f"{name}: {t*1e3:.3f} ms = {nnz/t/1e6:.0f} Mnnz/s "
              f"({t/nnz*1e9:.2f} ns/entry)")
        return t

    @jax.jit
    def f_current(Xv):
        g = jnp.take(Xv.astype(jnp.float32), colsj, axis=0)
        prod = valsj[:, None] * g
        return jax.ops.segment_sum(prod, rowsj, num_segments=m + 1,
                                   indices_are_sorted=True)[:m]

    @jax.jit
    def f_ell(Xv):
        g = jnp.take(Xv, colsj, axis=0).astype(jnp.float32)
        prod = valsj.reshape(m, K, 1) * g.reshape(m, K, N)
        return prod.sum(axis=1)

    run("(a) current segment_sum f32", f_current, X)
    run("(b) segment_sum, bf16 X", f_current, Xb, tol=2e-2)
    run("(c) ELL reduce f32", f_ell, X)
    run("(d) ELL reduce, bf16 X", f_ell, Xb, tol=2e-2)


if __name__ == "__main__":
    main()
