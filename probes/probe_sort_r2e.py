"""TPU probe: fori+switch bitonic block sort — compile time + throughput."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from spsparse_tpu.ops.pallas_sort import sort_blocks  # noqa: E402
from spsparse_tpu.utils.benchtime import bench_slope  # noqa: E402

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

for R, nblk in ((64, 16), (64, 1024), (256, 256)):
    n = R * 128 * nblk
    k = jnp.asarray(rng.integers(0, 1 << 30, (nblk, R, 128)).astype(np.int32))
    v = jnp.asarray(rng.uniform(-1, 1, (nblk, R, 128)).astype(np.float32))
    t0 = time.time()
    try:
        ks, vs = jax.block_until_ready(sort_blocks((k, v), num_keys=1))
        tc = time.time() - t0
        ks_h = np.asarray(ks)
        ok = all((np.diff(ks_h[b].ravel()) >= 0).all() for b in range(min(nblk, 4)))
        perm = np.array_equal(np.sort(np.asarray(k)[0].ravel()), ks_h[0].ravel())
        print(f"R={R} nblk={nblk} ({n/1e6:.1f}M): compile+run {tc:.0f}s "
              f"sorted={ok} perm={perm}", flush=True)
        t = bench_slope(lambda kk: sort_blocks((kk, v), num_keys=1)[0], k,
                        iters=4, reps=2)
        print(f"  {t*1e3:.2f} ms ({n/t/1e6:.0f} Melem/s)", flush=True)
    except Exception as e:
        print(f"R={R} nblk={nblk} FAIL: {type(e).__name__} {str(e)[:300]}",
              flush=True)

# 3-array variant (khi, klo, val) — the consolidate shape
R, nblk = 64, 1024
n = R * 128 * nblk
k1 = jnp.asarray(rng.integers(0, 1 << 30, (nblk, R, 128)).astype(np.int32))
k2 = jnp.asarray(rng.integers(0, 1 << 30, (nblk, R, 128)).astype(np.int32))
v = jnp.asarray(rng.uniform(-1, 1, (nblk, R, 128)).astype(np.float32))
try:
    t0 = time.time()
    out = jax.block_until_ready(sort_blocks((k1, k2, v), num_keys=2))
    print(f"lex2+payload compile+run {time.time()-t0:.0f}s", flush=True)
    t = bench_slope(lambda kk: sort_blocks((kk, k2, v), num_keys=2)[0], k1,
                    iters=4, reps=2)
    print(f"  {t*1e3:.2f} ms ({n/t/1e6:.0f} Melem/s)", flush=True)
except Exception as e:
    print(f"lex2 FAIL: {type(e).__name__} {str(e)[:300]}", flush=True)
