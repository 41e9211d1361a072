"""Stability check: run bench config3 + config4 + 2b measurement 3x each
in one process, printing raw slope samples to diagnose tunnel noise."""
import numpy as np
import jax
import jax.numpy as jnp

import bench


for rep in range(3):
    r = bench.config3_spmm(False)
    print(f"config3 rep{rep}: t={r['time_s']*1e3:.3f} ms "
          f"pct={r['pct_of_roofline']:.1f}%")
for rep in range(2):
    r = bench.config4_spgemm(False)
    print(f"config4 rep{rep}: t={r['time_s']*1e3:.3f} ms "
          f"pct={r['pct_of_roofline']:.2f}%")
for rep in range(2):
    r = bench.config2b_multirhs(False)
    print(f"config2b rep{rep}: t={r['time_s']*1e3:.3f} ms "
          f"pct={r['pct_of_roofline']:.1f}%")
