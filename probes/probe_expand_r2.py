"""Calibrate expansion-phase primitives on TPU: searchsorted vs scatter
vs gather vs cumsum at the config-4 scale."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from spsparse_tpu.utils.benchtime import bench_slope  # noqa

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
E = 1 << 17
cap = 1 << 17

cum = jnp.asarray(np.sort(rng.integers(0, E, cap)).astype(np.int32))
t_idx = jnp.arange(E, dtype=jnp.int32)
vals = jnp.asarray(rng.uniform(-1, 1, cap).astype(np.float32))
pos = jnp.asarray(np.sort(rng.choice(E, cap, replace=False)).astype(np.int32))

def f_ss(c):
    return jnp.searchsorted(c, t_idx, side="right").astype(jnp.int32) + c[0]

def f_scatter(c):
    return jnp.zeros((E,), jnp.int32).at[pos].set(c[:cap], mode="drop") + c[0]

def f_gather(c):
    idx = jnp.clip(t_idx % cap, 0, cap - 1)
    return jnp.take(c, idx) + c[0]

def f_cumsum(c):
    return jnp.cumsum(c) + c[0]

def f_cummax(c):
    return jax.lax.cummax(c) + c[0]

for name, f in (("searchsorted 128K into 128K", f_ss),
                ("scatter-set 128K", f_scatter),
                ("gather 128K", f_gather),
                ("cumsum 128K", f_cumsum),
                ("cummax 128K", f_cummax)):
    t = bench_slope(jax.jit(f), cum, iters=8, reps=2)
    print(f"{name}: {t*1e3:.3f} ms", flush=True)
