"""Diagnose: does consolidate's TPU compile time scale with n through
the axon remote-compile? (8M bench_fori probes hung >35 min while 1M
compiled in ~8; suspicion: compile, not execution.) AOT-compile the
plain jitted consolidate step at ascending sizes and time lower/compile
separately. COMPILE times are the deliverable; no execution benchmark is
attempted here (per CLAUDE.md, only chained-fori/slope timings are
trustworthy on this tunnel)."""
import sys
import time
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from spsparse_tpu import SparseCOO  # noqa
from spsparse_tpu.core.consolidate import consolidate  # noqa

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def step(a):
    c = consolidate(a, (0, 1))
    eps = c.vals[0] * jnp.float32(1e-38)
    return dataclasses.replace(a, vals=a.vals + eps)


for logn in (20, 21, 22, 23):
    n = 1 << logn
    idx = np.stack([rng.integers(0, 1 << 15, n),
                    rng.integers(0, 1 << 15, n)], 1).astype(np.int32)
    vals = rng.uniform(-1, 1, n).astype(np.float32)
    A = SparseCOO.from_arrays(jnp.asarray(idx), jnp.asarray(vals),
                              (1 << 15, 1 << 15), check=False)
    t0 = time.time()
    lowered = jax.jit(step).lower(A)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    print(f"n=2^{logn}: lower {t1-t0:.1f}s  compile {t2-t1:.1f}s",
          flush=True)
    # Sanity-run the compiled program once (correct shapes, no timing:
    # dispatch timing is untrustworthy here - see module docstring).
    r = compiled(A)
    float(jnp.sum(r.vals))
