"""Round-4 config-4 tiled SpGEMM: v1 (grid per pair, revisited output
blocks) vs v2 (grid per output tile, manual scalar-indexed operand DMA,
output written once). Model: 2 operand tiles per pair + each output tile
once. Round-3 status: v1 at 69% (f32) / 68% (bf16) — just under the 70%
BASELINE target."""
import json

import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.tiled import to_tiled, TILE
from spsparse_tpu.ops.spgemm_tiled import (
    densify_tiled, plan_tiled_spgemm, plan_pstart,
    _spgemm_tiled_pallas, _spgemm_tiled_pallas_v2)
from spsparse_tpu.utils.benchtime import bench_slope
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
    pstart = jnp.asarray(plan_pstart(plan))
    kind, bw = device_hbm_bandwidth()
    print(json.dumps({"P": P, "Tout": Tout, "device": kind}), flush=True)

    for dtype in (jnp.float32, jnp.bfloat16):
        blocks = ta.blocks.astype(dtype)
        es = 2 if dtype == jnp.bfloat16 else 4
        bytes_model = P * 2 * TILE * TILE * es + Tout * TILE * TILE * 4
        sol_t = bytes_model / bw

        def step_v1(bl):
            out = _spgemm_tiled_pallas(bl, bl, pa, pb, oid,
                                       transpose_b=True, n_out=Tout,
                                       interpret=False)
            eps = (out[0, 0, 0] * jnp.float32(1e-30)).astype(bl.dtype)
            return bl.at[0, 0, 0].add(eps)

        def step_v2(bl):
            out = _spgemm_tiled_pallas_v2(bl, bl, pstart, pa, pb,
                                          transpose_b=True, n_out=Tout,
                                          interpret=False)
            eps = (out[0, 0, 0] * jnp.float32(1e-30)).astype(bl.dtype)
            return bl.at[0, 0, 0].add(eps)

        # correctness cross-check first
        o1 = _spgemm_tiled_pallas(blocks, blocks, pa, pb, oid,
                                  transpose_b=True, n_out=Tout,
                                  interpret=False)
        o2 = _spgemm_tiled_pallas_v2(blocks, blocks, pstart, pa, pb,
                                     transpose_b=True, n_out=Tout,
                                     interpret=False)
        err = float(jnp.max(jnp.abs(o1 - o2)))
        for name, step in (("v1", step_v1), ("v2", step_v2)):
            t = bench_slope(step, blocks, iters=8, reps=5, u_lo=2, u_hi=10)
            print(json.dumps({
                "dtype": str(dtype.__name__), "kernel": name,
                "time_s": t, "pct_of_model": 100.0 * sol_t / t,
                "gb_model_per_s": bytes_model / t / 1e9,
                "max_abs_diff_v1_v2": err,
            }), flush=True)


if __name__ == "__main__":
    main()
