"""Round-3 probe: semiring-relaxation round throughput on the real TPU.

One Bellman-Ford round = gather d[tails] + add w + segment_min into
heads. Measures edges/s for a random graph at a few scales, with the
trustworthy chained-iteration timing (bench_fori). Also times a full
BFS-to-fixpoint on a bounded-diameter graph.

Run (one process on the TPU):
  PYTHONPATH=/root/.axon_site:/root/repo timeout 900 python probes/probe_graph_r3.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from spsparse_tpu.utils.benchtime import bench_fori

def make_graph(n, deg, seed=0):
    rng = np.random.default_rng(seed)
    m = n * deg
    t = rng.integers(0, n, m).astype(np.int32)
    # mostly-local heads: bounded diameter, still scattered gathers
    h = ((t + rng.integers(1, 64, m)) % n).astype(np.int32)
    w = rng.uniform(0.1, 1.0, m).astype(np.float32)
    return jnp.asarray(t), jnp.asarray(h), jnp.asarray(w)


def main():
    print("devices:", jax.devices())
    # NB: remote-compile cost of segment_min explodes with nnz (same
    # cliff as the sort scaling note in CLAUDE.md): 4M-edge relax did
    # not finish compiling in 900 s. Stay <= ~1M edges per program.
    import time
    for n, deg in [(1 << 14, 8), (1 << 16, 8), (1 << 17, 8)]:
        t, h, w = make_graph(n, deg)
        m = int(t.shape[0])
        d0 = jnp.full((n,), jnp.inf, jnp.float32).at[0].set(0.0)

        def round_(d):
            c = d[t] + w
            y = jax.ops.segment_min(c, h, num_segments=n)
            return jnp.minimum(d, y)

        t0 = time.time()
        sec = bench_fori(round_, d0, iters=8)
        compile_s = time.time() - t0
        # bytes per edge: d gather 4 + w 4 + segment write traffic ~4
        gbs = m * 12 / sec / 1e9
        print(f"n={n:>8} m={m:>9}  relax round: {sec*1e3:8.3f} ms  "
              f"{m/sec/1e9:6.2f} Gedge/s  (~{gbs:5.1f} GB/s est; "
              f"compile+first {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
