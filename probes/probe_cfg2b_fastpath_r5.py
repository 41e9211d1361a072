"""Config-2b probe: zero-copy mrhs entry vs the padded-Xp entry (round 5).

The padded path materializes Xp + halos every call (~70 MB round trip at
n=1M on top of the 84 MB model traffic — measured 68.6/68.8% of model on
two separate days). The fast path passes X straight through as xmain.
Run on the real chip: PYTHONPATH=/root/.axon_site:/root/repo python
probes/probe_cfg2b_fastpath_r5.py
"""
import json
import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu.utils import compilecache
compilecache.enable()

from bench import build_banded_dia
from spsparse_tpu.ops.pallas_dia import prepare_dia
from spsparse_tpu.ops.pallas_dia_mrhs import (spmm_dia_mrhs_pallas,
                                              _spmm_mrhs_ad, RHS_BLOCK)
from spsparse_tpu.utils.benchtime import bench_slope
from spsparse_tpu.utils.roofline import device_hbm_bandwidth

rng = np.random.default_rng(0)
n = 1 << 20
dia, nnz = build_banded_dia(n, 5)
prep = prepare_dia(dia)
X = jnp.asarray(rng.uniform(-1, 1, (8, n)).astype(np.float32))

# correctness cross-check fast vs padded (padded forced via 7 RHS)
Yf = np.asarray(spmm_dia_mrhs_pallas(prep, X))
Yp = np.asarray(spmm_dia_mrhs_pallas(prep, X[:7]))
err = float(np.abs(Yf[:7] - Yp).max())
assert err < 1e-5, err

kind, bw = device_hbm_bandwidth()
bytes_moved = nnz * 4 + 8 * 2 * n * 4
sol = bw / (bytes_moved / (8 * nnz))
out = {"n": n, "nnz": int(nnz), "max_abs_err_vs_padded": err}
for label in ("fast", "padded"):
    if label == "fast":
        fn = lambda Xv: spmm_dia_mrhs_pallas(prep, Xv)
    else:
        block = prep.block
        pad = -(-max(max(abs(o) for o in prep.offsets), 1) // 128) * 128
        npad = prep.data3.shape[0] * block

        def fn(Xv, _b=block, _p=pad, _np=npad):
            Xp = jnp.zeros((RHS_BLOCK, _np + 2 * _p + _b), jnp.float32)
            Xp = Xp.at[:, _p:_p + n].set(Xv)
            return _spmm_mrhs_ad(prep.data3, Xp, prep.offsets, n, _b, False)
    t = bench_slope(fn, X, iters=8, reps=7, u_lo=16, u_hi=96)
    out[label] = {"time_s": t, "agg_nnz_per_s": 8 * nnz / t,
                  "pct_of_roofline": 100.0 * (8 * nnz / t) / sol}
print(json.dumps(out, indent=1))
