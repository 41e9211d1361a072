"""Wide-arm (spike-proof) re-measurement of config-4 tiled SpGEMM.
Narrow-arm slope readings on this tunnel swing 69% .. 132%-of-model
(IMPOSSIBLE >100% readings prove the instability); arms of ~20 ms of
device time settle it. Same methodology as probes/probe_cfg3_r4c.py."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.tiled import to_tiled, TILE
from spsparse_tpu.ops.spgemm_tiled import (densify_tiled, plan_tiled_spgemm,
                                           _spgemm_tiled_pallas)
from spsparse_tpu.utils.roofline import device_hbm_bandwidth


def main():
    rng = np.random.default_rng(0)
    n_dst = 1 << 15
    per = 4
    r = np.repeat(np.arange(n_dst), per)
    c = np.minimum(r * 2 + rng.integers(0, 3, r.size), n_dst * 2 - 1)
    b = CooBuilder((n_dst, n_dst * 2), dtype=np.float32)
    b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
    A = b.build()
    ta = densify_tiled(to_tiled(A))
    plan = plan_tiled_spgemm(ta, ta, transpose_b=True)
    P, Tout = plan.n_pairs, plan.n_out_tiles
    pa, pb, oid = (jnp.asarray(plan.pa), jnp.asarray(plan.pb),
                   jnp.asarray(plan.oid))
    kind, bw = device_hbm_bandwidth()

    for dtype in (jnp.bfloat16, jnp.float32):
        blocks = ta.blocks.astype(dtype)
        es = 2 if dtype == jnp.bfloat16 else 4
        model = P * 2 * TILE * TILE * es + Tout * TILE * TILE * 4

        def step(bl):
            out = _spgemm_tiled_pallas(bl, bl, pa, pb, oid,
                                       transpose_b=True, n_out=Tout,
                                       interpret=False)
            eps = (out[0, 0, 0] * jnp.float32(1e-30)).astype(bl.dtype)
            return bl.at[0, 0, 0].add(eps)

        def chain(bl, n):
            for _ in range(n):
                bl = step(bl)
            return bl

        u_lo, u_hi = 16, 144
        f_lo = jax.jit(lambda s: chain(s, u_lo))
        f_hi = jax.jit(lambda s: chain(s, u_hi))
        for f in (f_lo, f_hi):
            float(jnp.sum(f(blocks).astype(jnp.float32)))
        los, his = [], []
        for _ in range(7):
            t0 = time.perf_counter()
            float(jnp.sum(f_lo(blocks).astype(jnp.float32)))
            los.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(jnp.sum(f_hi(blocks).astype(jnp.float32)))
            his.append(time.perf_counter() - t0)
        t = (np.median(his) - np.median(los)) / (u_hi - u_lo)
        print(json.dumps({
            "dtype": str(np.dtype(dtype).name),
            "los_ms": [round(x * 1e3, 1) for x in los],
            "his_ms": [round(x * 1e3, 1) for x in his],
            "time_us": t * 1e6,
            "pct_of_model": 100.0 * (model / bw) / t,
        }), flush=True)


if __name__ == "__main__":
    main()
