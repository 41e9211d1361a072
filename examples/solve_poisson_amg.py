"""Solve a 2D Poisson system with AMG-preconditioned CG — the scalable
solver path (mesh-independent iteration counts).

Run: python examples/solve_poisson_amg.py
"""
import numpy as np
import jax
import jax.numpy as jnp

import spsparse_tpu as sp
from spsparse_tpu.ops.spmm import spmv
from spsparse_tpu.solvers import amg_setup, pcg_solve

m = 48                       # 48x48 grid -> n = 2304
n = m * m
b = sp.CooBuilder((n, n), dtype=np.float64)
for y in range(m):
    for x in range(m):
        i = y * m + x
        b.add((i, i), 4.0)
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            xx, yy = x + dx, y + dy
            if 0 <= xx < m and 0 <= yy < m:
                b.add((i, yy * m + xx), -1.0)
A = b.build()

hierarchy = amg_setup(A)     # aggregation + P^T A P via the SpGEMM chain
print("AMG levels:", [lvl.a.shape[0] for lvl in hierarchy.levels])

csr = sp.to_csr(A.consolidate((0, 1)))
rhs = jnp.asarray(np.random.default_rng(0).standard_normal(n))
x, rs = jax.jit(lambda v: pcg_solve(lambda u: spmv(csr, u), v,
                                    iters=25, minv=hierarchy))(rhs)
rel = float(jnp.linalg.norm(rhs - spmv(csr, x)) / jnp.linalg.norm(rhs))
print(f"25 CG+AMG iterations -> relative residual {rel:.2e}")
