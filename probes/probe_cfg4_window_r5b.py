"""Cross-check the 46 us window-SpGEMM reading with independent harnesses.

probe_cfg4_window_r5.py measured 46 us for ~82 MB of modeled traffic =
1.7 TB/s aggregate — past any plausible HBM rate, so verify with:
  (a) the same wide_slope but the dependency consuming the WHOLE band
      (sum rides the chain; its own pass is measured separately and
      subtracted);
  (b) bench_fori (in-jit fori_loop chain, the rig's most trusted timer);
  (c) a direct K-call wall-clock (upper bound sanity).

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 1800 python probes/probe_cfg4_window_r5b.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from spsparse_tpu.utils.compilecache import enable_persistent_cache

enable_persistent_cache()

from spsparse_tpu import CooBuilder                                 # noqa: E402
from spsparse_tpu.core.tiled import to_tiled, TILE                  # noqa: E402
from spsparse_tpu.ops.pallas_tiled import prepare_tiled_dense       # noqa: E402
from spsparse_tpu.ops.spgemm_window import (plan_window_spgemm,     # noqa: E402
                                            spgemm_window_pallas)
from spsparse_tpu.utils.benchtime import bench_fori                 # noqa: E402


def wide_slope(step, init, fetch, u_lo=16, u_hi=144, reps=7):
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
    n_dst = 1 << 15
    per = 4
    r = np.repeat(np.arange(n_dst), per)
    c = np.minimum(r * 2 + rng.integers(0, 3, r.size), n_dst * 2 - 1)
    b = CooBuilder((n_dst, n_dst * 2), dtype=np.float32)
    b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
    A = b.build()
    tl = to_tiled(A)
    dt = jnp.bfloat16
    prep = prepare_tiled_dense(tl, dtype=dt)
    plan = plan_window_spgemm(prep.tcols, prep.tcols, nbc=prep.nbc,
                              out_shape=(n_dst, n_dst), group=8, dtype=dt)
    print(f"W={plan.W} wrows={plan.wrows} nsuper={plan.nsuper}")

    # (a) wide_slope, dependency = sum of the whole band
    def step_full(st):
        blocks, _ = st
        band = spgemm_window_pallas(plan, blocks)
        s = jnp.sum(band)                       # consumes EVERY tile
        return (blocks.at[0, 0, 0, 0].add((s * 1e-38).astype(dt)), s)

    t_full = wide_slope(step_full, (prep.blocks, jnp.zeros(())),
                        lambda st: float(st[1]))
    # the cost of the sum pass alone (band is loop-invariant input here)
    band0 = jax.block_until_ready(spgemm_window_pallas(plan, prep.blocks))

    def step_sum(st):
        x, acc = st
        return (x.at[0, 0, 0, 0].add(jnp.sum(x) * 1e-38), acc)

    t_sum = wide_slope(step_sum, (band0, jnp.zeros(())),
                       lambda st: float(jnp.sum(st[0])))
    print(f"(a) wide_slope kernel+sum: {t_full*1e6:.1f} us; "
          f"sum pass alone: {t_sum*1e6:.1f} us; "
          f"kernel ~= {(t_full - t_sum)*1e6:.1f} us")

    # (b) bench_fori: chain inside ONE jitted fori_loop
    def body(carry):
        blocks = carry
        band = spgemm_window_pallas(plan, blocks)
        eps = (band[0, 0, 0, 0] * jnp.float32(1e-38)).astype(dt)
        return blocks.at[0, 0, 0, 0].add(eps)

    t_fori = bench_fori(body, prep.blocks, iters=64, reps=5)
    print(f"(b) bench_fori: {t_fori*1e6:.1f} us per call")

    # (c) direct wall clock: K sequential calls, one final fetch
    K = 64
    f = jax.jit(lambda bl: spgemm_window_pallas(plan, bl))
    jax.block_until_ready(f(prep.blocks))
    t0 = time.perf_counter()
    out = None
    for _ in range(K):
        out = f(prep.blocks)
    float(jnp.sum(out))
    wall = (time.perf_counter() - t0) / K
    print(f"(c) direct wall (incl tunnel dispatch): {wall*1e6:.1f} us/call")


if __name__ == "__main__":
    main()
