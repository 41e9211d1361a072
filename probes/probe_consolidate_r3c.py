"""Round-3 part 3: 8M consolidate via bench_fori (single-body compile —
the bench_slope unrolled chain takes >45 min to remote-compile on a slow
tunnel day). consolidate is pure XLA (no pallas_call), so the ~0.7 ms
per-iteration fixed cost is ~2% of the ~40 ms op. Round-2: 46 ms."""
import sys
import time
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from spsparse_tpu.utils.benchtime import bench_fori  # noqa
from spsparse_tpu import SparseCOO  # noqa
from spsparse_tpu.core.consolidate import consolidate  # noqa

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
n = 1 << 23
idx = np.stack([rng.integers(0, 1 << 15, n), rng.integers(0, 1 << 15, n)],
               1).astype(np.int32)
vals = rng.uniform(-1, 1, n).astype(np.float32)
A = SparseCOO.from_arrays(jnp.asarray(idx), jnp.asarray(vals),
                          (1 << 15, 1 << 15), check=False)
A = jax.block_until_ready(jax.tree_util.tree_map(jnp.asarray, A))
print("operand on device", flush=True)

def step(a):
    c = consolidate(a, (0, 1))
    eps = c.vals[0] * jnp.float32(1e-38)
    return dataclasses.replace(a, vals=a.vals + eps)

t0 = time.time()
t = bench_fori(step, A, iters=12, reps=3)
print(f"consolidate 8M ADD (fori): {t*1e3:.2f} ms ({n/t/1e6:.0f} Melem/s)"
      f"  [wall {time.time()-t0:.0f}s]", flush=True)

# 1M for a same-method comparison point against this morning's slope
# numbers (5.25 ms) and round-2 (5.5 ms).
n1 = 1 << 20
A1 = SparseCOO.from_arrays(jnp.asarray(idx[:n1]), jnp.asarray(vals[:n1]),
                           (1 << 15, 1 << 15), check=False)
A1 = jax.block_until_ready(jax.tree_util.tree_map(jnp.asarray, A1))
t = bench_fori(step, A1, iters=12, reps=3)
print(f"consolidate 1M ADD (fori): {t*1e3:.2f} ms ({n1/t/1e6:.0f} Melem/s)",
      flush=True)
