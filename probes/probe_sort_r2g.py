"""Bisect pallas_sort compile crash with the real kernel, small sizes."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from spsparse_tpu.ops.pallas_sort import sort_blocks  # noqa: E402

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
for R, nblk, nkeys, npay in ((8, 2, 1, 0), (8, 2, 1, 1), (64, 2, 1, 1),
                             (8, 2, 2, 1)):
    arrs = [jnp.asarray(rng.integers(0, 1 << 30, (nblk, R, 128)).astype(np.int32))
            for _ in range(nkeys)]
    arrs += [jnp.asarray(rng.uniform(-1, 1, (nblk, R, 128)).astype(np.float32))
             for _ in range(npay)]
    t0 = time.time()
    try:
        out = jax.block_until_ready(sort_blocks(tuple(arrs), num_keys=nkeys))
        k0 = np.asarray(out[0])
        ok = (np.diff(k0[0].ravel()) >= 0).all() if nkeys == 1 else None
        print(f"R={R} nblk={nblk} keys={nkeys} pay={npay}: OK "
              f"({time.time()-t0:.0f}s) sorted={ok}", flush=True)
    except Exception as e:
        print(f"R={R} nblk={nblk} keys={nkeys} pay={npay}: FAIL "
              f"{type(e).__name__} {str(e)[:200]}", flush=True)
