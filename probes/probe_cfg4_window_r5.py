"""Round 5: rolling-window SpGEMM vs pair-stream kernel on config 4.

The pair kernel fetches 2 scattered 32 KB tiles per pair (74 MB at ~45%
streaming efficiency — 202 us vs a 90 us read SOL); the window kernel
streams operand block rows once per super-group as multi-MB contiguous
transfers. MXU floor measured 76.6 ns/128^3 bf16 matmul
(probe_r5_prims.py) -> 1130 pairs have an ~87 us compute floor.

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 1800 python probes/probe_cfg4_window_r5.py
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
from spsparse_tpu.ops.spgemm_tiled import (densify_tiled,           # noqa: E402
                                           plan_tiled_spgemm,
                                           _spgemm_tiled_pallas)
from spsparse_tpu.ops.spgemm_window import (band_to_tiled_blocks,   # noqa: E402
                                            plan_window_spgemm,
                                            spgemm_window_pallas)


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


def main(n_dst=1 << 15, check=True):
    print("devices:", jax.devices(), "n_dst:", n_dst)
    rng = np.random.default_rng(0)
    per = 4
    r = np.repeat(np.arange(n_dst), per)
    c = np.minimum(r * 2 + rng.integers(0, 3, r.size), n_dst * 2 - 1)
    b = CooBuilder((n_dst, n_dst * 2), dtype=np.float32)
    b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
    A = b.build()
    tl = to_tiled(A)

    for dt, name in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        prep = prepare_tiled_dense(tl, dtype=dt)
        # pair-kernel reference
        ta = densify_tiled(tl, dtype=dt)
        pplan = plan_tiled_spgemm(ta, ta, transpose_b=True)
        P, Tout = pplan.n_pairs, pplan.n_out_tiles
        pa, pb, oid = (jnp.asarray(pplan.pa), jnp.asarray(pplan.pb),
                       jnp.asarray(pplan.oid))

        for group in ([8, 16] if dt == jnp.bfloat16 else [8]):
            plan = plan_window_spgemm(
                prep.tcols, prep.tcols, nbc=prep.nbc,
                out_shape=(n_dst, n_dst), group=group, dtype=dt)
            band = jax.block_until_ready(
                spgemm_window_pallas(plan, prep.blocks))
            # numeric check vs pair kernel — block-wise on host (a dense
            # compare at 32768^2 f32 exhausts HBM)
            if not check:
                print(f"[{name} g={group}] W={plan.W} wrows={plan.wrows} "
                      f"(check skipped)")
            else:
                ref = np.asarray(_spgemm_tiled_pallas(
                    ta.blocks, ta.blocks, pa, pb, oid, transpose_b=True,
                    n_out=Tout, interpret=False))
                bandh = np.asarray(band)
                NB = plan.nband
                err = 0.0
                for k in range(Tout):
                    i = int(pplan.out_tile_row[k])
                    j = int(pplan.out_tile_col[k])
                    bslot = j - i + plan.W
                    assert 0 <= bslot < NB, (i, j)
                    err = max(err,
                              float(np.abs(bandh[i, bslot] - ref[k]).max()))
                scale = float(np.abs(ref).max())
                print(f"[{name} g={group}] W={plan.W} wrows={plan.wrows} "
                      f"pmax_band={plan.pmax_band} "
                      f"rel_err_vs_pair={err/scale:.2e}")

            import dataclasses as dc

            def step(blocks):
                band = spgemm_window_pallas(plan, blocks)
                eps = (band[0, 0, 0, 0] * jnp.float32(1e-30)).astype(
                    blocks.dtype)
                return blocks.at[0, 0, 0, 0].add(eps)

            t = wide_slope(step, prep.blocks,
                           lambda bl: float(jnp.sum(bl.astype(jnp.float32))))
            esize = np.dtype(dt).itemsize
            a_rows_fetched = plan.nsuper * plan.wrows
            bytes_moved = (a_rows_fetched * prep.tcols.shape[1]
                           * TILE * TILE * esize
                           + plan.nbr_pad * plan.nband * TILE * TILE * 4)
            kind_bw = 8.19e11
            sol = bytes_moved / kind_bw
            nd = plan.n_dots
            mxu_meas = nd * (27.6e-9 if dt == jnp.bfloat16 else 54e-9)
            mxu_peak = nd * (21.3e-9 if dt == jnp.bfloat16 else 42.6e-9)
            print(f"    window: {t*1e6:.1f} us | dots {nd} (live {P}) | "
                  f"bytes {bytes_moved/1e6:.1f} MB sol {sol*1e6:.1f} us | "
                  f"mxu meas/peak {mxu_meas*1e6:.1f}/{mxu_peak*1e6:.1f} us "
                  f"| pct max(sol,mxu_meas) {100*max(sol, mxu_meas)/t:.1f}%")

        # pair kernel timing (same harness)
        def step_pair(blocks):
            out = _spgemm_tiled_pallas(blocks, blocks, pa, pb, oid,
                                       transpose_b=True, n_out=Tout,
                                       interpret=False)
            eps = (out[0, 0, 0] * jnp.float32(1e-30)).astype(blocks.dtype)
            return blocks.at[0, 0, 0].add(eps)

        t_pair = wide_slope(step_pair, ta.blocks,
                            lambda bl: float(jnp.sum(bl.astype(jnp.float32))))
        print(f"[{name}] pair kernel: {t_pair*1e6:.1f} us "
              f"(P={P}, Tout={Tout})")


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "big":
        main(n_dst=1 << 17, check=False)
    else:
        main()
