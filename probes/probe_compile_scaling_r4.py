"""Round 4: re-run the consolidate compile-scaling probe with the
compile-bounded chunked pipeline (core.chunksort) in place. Round-3
numbers for the DIRECT path (probe_compile_scaling_r3.py): 60 s @1M,
209 s @2M, 1867 s @4M, hours @8M. The chunked pipeline holds ~3 batched
1M-row sorts, so its compile cost is ~flat in n (~6 min cold measured at
2^21 — where the direct path is still cheaper, hence ENGAGE_ELEMS = 2^21).
Target (VERDICT r3 item 3): <5 min cold at 8M after the once-per-machine
persistent cache warms the shared sort programs, and the 8M execution
number re-validated.

ONE jitted program per size (a fori chain that also returns the last
consolidated result for correctness) — compile timed via AOT, execution
via the two-arm chain difference (bench_fori regime; CLAUDE.md).
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


def chain(a, iters):
    def body(i, carry):
        ac, _ = carry
        c = consolidate(ac, (0, 1))
        eps = c.vals[0].astype(ac.vals.dtype) * 1e-38
        return dataclasses.replace(ac, vals=ac.vals + eps), c

    c0 = consolidate(a, (0, 1))
    return jax.lax.fori_loop(0, iters, body, (a, c0))


for logn in (22, 23):
    n = 1 << logn
    idx = np.stack([rng.integers(0, 1 << 15, n),
                    rng.integers(0, 1 << 15, n)], 1).astype(np.int32)
    vals = rng.uniform(-1, 1, n).astype(np.float32)
    A = SparseCOO.from_arrays(jnp.asarray(idx), jnp.asarray(vals),
                              (1 << 15, 1 << 15), check=False)
    f = jax.jit(chain, static_argnums=1)
    t0 = time.time()
    lowered = f.lower(A, 2)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    print(f"n=2^{logn}: lower {t1-t0:.1f}s  compile {t2-t1:.1f}s",
          flush=True)
    _, c = compiled(A)
    got_nnz = int(c.nnz)
    key = idx[:, 0].astype(np.int64) * (1 << 15) + idx[:, 1]
    want_nnz = len(np.unique(key))
    got_sum = float(jnp.sum(c.vals))
    want_sum = float(vals.sum())
    print(f"n=2^{logn}: nnz {got_nnz} (want {want_nnz}) "
          f"sum {got_sum:.3f} (want {want_sum:.3f})", flush=True)
    assert got_nnz == want_nnz
    # second arm size reuses the SAME compiled cache entry? (static
    # iters changes the program; compile the hi arm too — small delta
    # via the persistent cache backend sharing inner sort programs)
    t0 = time.time()
    hi = f.lower(A, 6).compile()
    print(f"n=2^{logn}: hi-arm compile {time.time()-t0:.1f}s", flush=True)
    # force a SCALAR to the host — block_until_ready on a large array
    # can return before device execution completes on this rig
    for fn in (compiled, hi):
        float(jnp.sum(fn(A)[1].vals))
    los, his = [], []
    for _ in range(3):
        t0 = time.time()
        float(jnp.sum(compiled(A)[1].vals))
        los.append(time.time() - t0)
        t0 = time.time()
        float(jnp.sum(hi(A)[1].vals))
        his.append(time.time() - t0)
    per = (np.median(his) - np.median(los)) / 4
    print(f"n=2^{logn}: consolidate exec {per*1e3:.1f} ms "
          f"({n/per/1e6:.0f} Melem/s)", flush=True)
