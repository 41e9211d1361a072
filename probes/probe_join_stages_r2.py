"""Time the join-expansion internals on TPU with DYNAMIC inputs (chained
through the bench carry so XLA cannot constant-fold the index math):
sort cost at the real operand counts, associative_scan cost, compact cost.
"""
import numpy as np
import jax
import jax.numpy as jnp

from spsparse_tpu import CooBuilder
from spsparse_tpu.core.joinfill import forward_fill_marked
from spsparse_tpu.core.consolidate import compact_select
from spsparse_tpu.core.structure import to_csr
from spsparse_tpu.utils.benchtime import bench_slope

rng = np.random.default_rng(0)
n_dst = 1 << 15
per = 4
r = np.repeat(np.arange(n_dst), per)
c = np.minimum(r * 2 + rng.integers(0, 3, r.size), n_dst * 2 - 1)
b = CooBuilder((n_dst, n_dst * 2), dtype=np.float32)
b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
A = b.build().consolidate((0, 1))
Bc = A.transposed((1, 0)).consolidate((0, 1))
bcsr = to_csr(Bc)
nrows_b = bcsr.nrows
cap_a = A.cap
expand_cap = 131072

SL = dict(iters=8, reps=5, u_lo=2, u_hi=10)


def chainout(x, val):
    return x.at[0].add(jnp.sum(val).astype(x.dtype) * 0)


# dynamic perturbation source: carry a float vector, add eps*0 to inputs
carry0 = jnp.zeros((8,), jnp.float32)

# 1. single stable sort, 9 operands, n = nrows_b + cap_a
n1 = nrows_b + cap_a
k1 = jnp.asarray(rng.integers(0, 2 * n1, n1).astype(np.int32))
ops9 = tuple(jnp.asarray(rng.integers(0, 1000, n1).astype(np.int32))
             for _ in range(4)) + tuple(
    jnp.asarray(rng.uniform(-1, 1, n1).astype(np.float32))
    for _ in range(4))


def s9(x):
    key = k1 + (x[0] * 0).astype(jnp.int32)
    out = jax.lax.sort((key,) + ops9, num_keys=1, is_stable=True)
    return chainout(x, out[1])


t = bench_slope(s9, carry0, **SL)
print(f"sort 9-operand n={n1}: {t*1e3:.3f} ms")


def s3(x):
    key = k1 + (x[0] * 0).astype(jnp.int32)
    out = jax.lax.sort((key, ops9[0], ops9[4]), num_keys=1, is_stable=True)
    return chainout(x, out[1])


t = bench_slope(s3, carry0, **SL)
print(f"sort 3-operand n={n1}: {t*1e3:.3f} ms")

# 2. associative_scan fill: n = cap_a + expand_cap, 4 payloads
n2 = cap_a + expand_cap
mk = jnp.asarray(rng.integers(0, 2, n2).astype(bool))
pl4 = tuple(jnp.asarray(rng.integers(0, 1000, n2).astype(np.int32))
            for _ in range(3)) + (
    jnp.asarray(rng.uniform(-1, 1, n2).astype(np.float32)),)


def scan4(x):
    p0 = pl4[0] + (x[0] * 0).astype(jnp.int32)
    out = forward_fill_marked(mk, (p0,) + pl4[1:])
    return chainout(x, out[0])


t = bench_slope(scan4, carry0, **SL)
print(f"assoc_scan fill 4-payload n={n2}: {t*1e3:.3f} ms")

# cummax for comparison
def cm(x):
    p0 = pl4[0] + (x[0] * 0).astype(jnp.int32)
    return chainout(x, jax.lax.cummax(p0))


t = bench_slope(cm, carry0, **SL)
print(f"single cummax n={n2}: {t*1e3:.3f} ms")

# 3. compact_select: n2 elements, 5 carried
def comp(x):
    p0 = pl4[0] + (x[0] * 0).astype(jnp.int32)
    out, _ = compact_select(mk, (p0,) + pl4[1:] + (pl4[3],),
                            cap_out=expand_cap)
    return chainout(x, out[0])


t = bench_slope(comp, carry0, **SL)
print(f"compact_select 5-carried n={n2}: {t*1e3:.3f} ms")

# 4. cumsum at cap_a
cs_in = jnp.asarray(rng.integers(0, 3, cap_a).astype(np.int32))


def cs(x):
    p = cs_in + (x[0] * 0).astype(jnp.int32)
    return chainout(x, jnp.cumsum(p))


t = bench_slope(cs, carry0, **SL)
print(f"cumsum n={cap_a}: {t*1e3:.3f} ms")
