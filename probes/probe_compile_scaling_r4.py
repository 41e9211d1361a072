"""Round 4: re-run the consolidate compile-scaling probe with the
compile-bounded chunked pipeline (core.chunksort) in place. Round-3
numbers for the DIRECT path (probe_compile_scaling_r3.py): 60 s @1M,
209 s @2M, 1867 s @4M, hours @8M. Target (VERDICT r3 item 3): <5 min
cold end-to-end at 8M, and the 8M execution number re-validated.

Also demonstrates the persistent compilation cache: run this probe a
second time and compiles should be near-instant (cache dir printed).
"""
import sys
import time
import dataclasses

import numpy as np
import jax
# x64 REQUIRED: the chunked primary sort packs (key, position) into one
# int64 word; without x64 the library falls back to the direct big sort.
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from spsparse_tpu import SparseCOO  # noqa
from spsparse_tpu.core.consolidate import consolidate  # noqa
from spsparse_tpu.utils.compilecache import enable_persistent_cache  # noqa

cache = enable_persistent_cache()
print("devices:", jax.devices(), "cache:", cache, flush=True)
rng = np.random.default_rng(0)


def step(a):
    c = consolidate(a, (0, 1))
    eps = c.vals[0] * jnp.float32(1e-38)
    return dataclasses.replace(a, vals=a.vals + eps)


def chain(a, iters):
    return jax.lax.fori_loop(0, iters, lambda i, x: step(x), a)


for logn in (21, 22, 23):
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
    r = compiled(A)
    float(jnp.sum(r.vals))
    # correctness spot check vs numpy (the chunked route must not only
    # compile fast, it must be RIGHT)
    c = consolidate(A, (0, 1))
    got_nnz = int(c.nnz)
    import numpy as _np
    key = idx[:, 0].astype(_np.int64) * (1 << 15) + idx[:, 1]
    want_nnz = len(_np.unique(key))
    want_sum = float(vals.sum())
    got_sum = float(jnp.sum(c.vals))
    print(f"n=2^{logn}: nnz {got_nnz} (want {want_nnz}) "
          f"sum {got_sum:.4f} (want {want_sum:.4f})", flush=True)
    assert got_nnz == want_nnz
    # Execution: chained fori (pure-XLA body >10 ms — bench_fori regime;
    # CLAUDE.md). Two arm sizes, difference cancels dispatch.
    f = jax.jit(chain, static_argnums=1)
    lo_T, hi_T = 2, 6
    f(A, lo_T).vals.block_until_ready()
    f(A, hi_T).vals.block_until_ready()
    los, his = [], []
    for _ in range(3):
        t0 = time.time()
        f(A, lo_T).vals.block_until_ready()
        los.append(time.time() - t0)
        t0 = time.time()
        f(A, hi_T).vals.block_until_ready()
        his.append(time.time() - t0)
    per = (np.median(his) - np.median(los)) / (hi_T - lo_T)
    print(f"n=2^{logn}: consolidate exec {per*1e3:.1f} ms "
          f"({n/per/1e6:.0f} Melem/s)", flush=True)
