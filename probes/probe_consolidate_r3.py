"""Round-3: measure the fused packed-word consolidate (words kept packed
sort->merge, one unpack; nonfinite cumsums moved inside the cond).
Round-2 reference numbers: 1M 5.5 ms (190 Melem/s), 8M 46 ms (182)."""
import sys
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from spsparse_tpu.utils.benchtime import bench_slope  # noqa
from spsparse_tpu import SparseCOO  # noqa
from spsparse_tpu.core.consolidate import consolidate  # noqa
from spsparse_tpu.core.errors import DuplicatePolicy  # noqa

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

for n in (1 << 20, 1 << 23):
    idx = np.stack([rng.integers(0, 1 << 15, n), rng.integers(0, 1 << 15, n)],
                   1).astype(np.int32)
    vals = rng.uniform(-1, 1, n).astype(np.float32)
    A = SparseCOO.from_arrays(jnp.asarray(idx), jnp.asarray(vals),
                              (1 << 15, 1 << 15), check=False)

    for policy in (DuplicatePolicy.ADD, DuplicatePolicy.REPLACE):
        def step(a):
            c = consolidate(a, (0, 1), policy)
            eps = c.vals[0] * jnp.float32(1e-38)
            return dataclasses.replace(a, vals=a.vals + eps)

        t = bench_slope(jax.jit(step), A, iters=4, reps=3)
        print(f"consolidate {n>>20}M {policy.name}: {t*1e3:.2f} ms "
              f"({n/t/1e6:.0f} Melem/s)", flush=True)
