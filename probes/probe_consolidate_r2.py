"""Measure the packed-key consolidate speedup on TPU (old vs new operand
shapes) + end-to-end consolidate/SpGEMM timings for PERFORMANCE.md."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from spsparse_tpu.utils.benchtime import bench_slope  # noqa: E402

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

for n in (1 << 20, 1 << 23):
    i = jnp.asarray(rng.integers(0, 1 << 15, n, dtype=np.int32))
    j = jnp.asarray(rng.integers(0, 1 << 15, n, dtype=np.int32))
    v = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    live = jnp.ones((n,), jnp.int32)

    def old_shape(ii):
        out = jax.lax.sort((ii, j, live, v), num_keys=2, is_stable=True)
        return out[0] + out[1]

    def new_shape(ii):
        packed = ii * jnp.int32((1 << 15) + 1) + j
        out = jax.lax.sort((packed, v), num_keys=1, is_stable=True)
        return out[0]

    for name, f in (("r1-style 4arr 2key", old_shape),
                    ("packed 2arr 1key", new_shape)):
        t = bench_slope(jax.jit(f), i, iters=4, reps=2)
        print(f"n={n>>20}M {name}: {t*1e3:.2f} ms ({n/t/1e6:.0f} Melem/s)",
              flush=True)

# End-to-end consolidate on the device container
from spsparse_tpu import SparseCOO  # noqa: E402
from spsparse_tpu.core.consolidate import consolidate  # noqa: E402
import dataclasses  # noqa: E402

for n in (1 << 20, 1 << 23):
    idx = np.stack([rng.integers(0, 1 << 15, n), rng.integers(0, 1 << 15, n)],
                   1).astype(np.int32)
    vals = rng.uniform(-1, 1, n).astype(np.float32)
    A = SparseCOO.from_arrays(jnp.asarray(idx), jnp.asarray(vals),
                              (1 << 15, 1 << 15), check=False)

    def step(a):
        c = consolidate(a, (0, 1))
        eps = c.vals[0] * jnp.float32(1e-38)
        return dataclasses.replace(a, vals=a.vals + eps)

    t = bench_slope(jax.jit(step), A, iters=4, reps=2)
    print(f"consolidate {n>>20}M end-to-end: {t*1e3:.2f} ms "
          f"({n/t/1e6:.0f} Melem/s)", flush=True)
