"""Round-3 part 2: config-4 ESC SpGEMM + 8M consolidate after the fused
packed-word merge. Round-2 numbers: config-4 ESC end-to-end 9.1 ms;
consolidate 8M 46 ms. Config-4 first (smaller transfers), verbose stage
prints, and modest unrolls — the big-unroll variant stalled >50 min in
the tunnel's remote-compile."""
import sys
import time
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from spsparse_tpu.utils.benchtime import bench_slope  # noqa
from spsparse_tpu import SparseCOO, CooBuilder  # noqa
from spsparse_tpu.core.consolidate import consolidate  # noqa

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

# ---- config-4 ESC ----
from spsparse_tpu.ops.spgemm import spgemm_aat, plan_spgemm_caps  # noqa
n_dst = 1 << 15
per = 4
r = np.repeat(np.arange(n_dst), per)
c = np.minimum(r * 2 + rng.integers(0, 3, r.size), n_dst * 2 - 1)
b = CooBuilder((n_dst, n_dst * 2), dtype=np.float32)
b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
A4 = b.build()
expand_cap, out_cap = plan_spgemm_caps(A4, A4, transpose_b=True)
print("config-4 built:", expand_cap, "products", flush=True)


def step4(a):
    res = spgemm_aat(a, cap=out_cap, expand_cap=expand_cap)
    eps = jnp.sum(res.vals) * jnp.float32(1e-38)
    return dataclasses.replace(a, vals=a.vals + eps)


t0 = time.time()
t = bench_slope(jax.jit(step4), A4, iters=4, reps=3, u_lo=2, u_hi=6)
print(f"spgemm_aat config4 ({expand_cap} products): {t*1e3:.2f} ms "
      f"({expand_cap/t/1e6:.0f} Mprod/s)  [wall {time.time()-t0:.0f}s]",
      flush=True)

# ---- 8M consolidate ----
n = 1 << 23
idx = np.stack([rng.integers(0, 1 << 15, n), rng.integers(0, 1 << 15, n)],
               1).astype(np.int32)
vals = rng.uniform(-1, 1, n).astype(np.float32)
A = SparseCOO.from_arrays(jnp.asarray(idx), jnp.asarray(vals),
                          (1 << 15, 1 << 15), check=False)
A = jax.block_until_ready(jax.tree_util.tree_map(jnp.asarray, A))
print("8M operand on device", flush=True)


def step(a):
    cc = consolidate(a, (0, 1))
    eps = cc.vals[0] * jnp.float32(1e-38)
    return dataclasses.replace(a, vals=a.vals + eps)


t0 = time.time()
t = bench_slope(jax.jit(step), A, iters=3, reps=3, u_lo=1, u_hi=3)
print(f"consolidate 8M ADD: {t*1e3:.2f} ms ({n/t/1e6:.0f} Melem/s)  "
      f"[wall {time.time()-t0:.0f}s]", flush=True)
