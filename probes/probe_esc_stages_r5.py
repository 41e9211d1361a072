"""Round 5 (VERDICT r4 item 6): where do the ESC SpGEMM's 9.66 ms go?

The general (no-block-structure) SpGEMM path is 46x slower than the
tiled kernel on the config-4 matrix. Before optimizing, measure the
stages separately on the SAME workload bench config 4 (round-4 form,
2^15 rows, 4/row) used to record the 9.66 ms:

  1. expand (join-based product enumeration)
  2. sort+merge (fused_sort_merge of the product stream)
  3. final consolidate/compaction inside spgemm()
  4. the full spgemm_aat for reference

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 1800 python probes/probe_esc_stages_r5.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from spsparse_tpu.utils.compilecache import enable_persistent_cache

enable_persistent_cache()

from spsparse_tpu import CooBuilder                                # noqa: E402
from spsparse_tpu.ops.spgemm import spgemm_aat, plan_spgemm_caps   # noqa: E402
import importlib                                              # noqa: E402
mul = importlib.import_module('spsparse_tpu.ops.multiply')
from spsparse_tpu.core.structure import to_csr                     # noqa: E402


def slope(step, init, fetch, u_lo=2, u_hi=8, reps=5):
    def chain(state, n):
        for _ in range(n):
            state = step(state)
        return state

    f_lo = jax.jit(lambda s: chain(s, u_lo))
    f_hi = jax.jit(lambda s: chain(s, u_hi))
    for f in (f_lo, f_hi):
        fetch(f(init))
    los, his = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); fetch(f_lo(init)); los.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fetch(f_hi(init)); his.append(time.perf_counter() - t0)
    return float(np.median(his) - np.median(los)) / (u_hi - u_lo)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    n_dst = 1 << 15
    per = 4
    r = np.repeat(np.arange(n_dst), per)
    c = np.minimum(r * 2 + rng.integers(0, 3, r.size), n_dst * 2 - 1)
    b = CooBuilder((n_dst, n_dst * 2), dtype=np.float32)
    b.add_many(np.stack([r, c], 1), rng.uniform(0, 1, r.size))
    A = b.build()
    expand_cap, out_cap = plan_spgemm_caps(A, A, transpose_b=True)
    print(f"nnz {r.size}, expand_cap {expand_cap}, out_cap {out_cap}")

    # full path
    import dataclasses

    def step_full(a):
        res = spgemm_aat(a, cap=out_cap, expand_cap=expand_cap)
        eps = jnp.sum(res.vals) * jnp.float32(1e-38)
        return dataclasses.replace(a, vals=a.vals + eps)

    t_full = slope(step_full, A, lambda a: float(jnp.sum(a.vals)))
    print(f"full spgemm_aat: {t_full*1e3:.2f} ms", flush=True)

    # stage 1: expansion only (against A^T's CSR)
    At = A.transposed((1, 0)).consolidate((0, 1))
    csr_b = to_csr(At)       # B = A^T
    ca = A.consolidate((0, 1))
    i_a = ca.indices[:, 0]
    k_a = ca.indices[:, 1]
    live = ca.valid_mask()

    def step_expand(v):
        i_t, j_t, v_t, valid = mul.expand_products_raw(
            i_a, k_a, v, live, csr_b.row_ptr[:-1],
            csr_b.row_ptr[1:] - csr_b.row_ptr[:-1], csr_b.cols,
            csr_b.vals, At.shape[1], At.shape[0], None, None, expand_cap)
        return v + jnp.sum(v_t) * jnp.float32(1e-38)

    t_exp = slope(step_expand, ca.vals, lambda v: float(jnp.sum(v)))
    print(f"expand (join): {t_exp*1e3:.2f} ms")

    # stage 2: sort+merge of a precomputed product stream
    i_t, j_t, v_t, valid = mul.expand_products_raw(
        i_a, k_a, ca.vals, live, csr_b.row_ptr[:-1],
        csr_b.row_ptr[1:] - csr_b.row_ptr[:-1], csr_b.cols,
        csr_b.vals, At.shape[1], At.shape[0], None, None, expand_cap)
    i_t, j_t, v_t, valid = map(jax.block_until_ready,
                               (i_t, j_t, v_t, valid))

    def step_merge(v):
        merged = mul.sort_and_merge_products(
            i_t, j_t, v, valid, (A.shape[0], A.shape[0]),
            merge_cap=out_cap)
        return v + jnp.sum(merged.vals) * jnp.float32(1e-38)

    t_merge = slope(step_merge, v_t, lambda v: float(jnp.sum(v)))
    print(f"sort+merge: {t_merge*1e3:.2f} ms")

    # the A/A^T consolidates (prep) — eager in spgemm() per call? check
    # by timing spgemm with pre-consolidated operand
    print(f"unaccounted (prep/consolidate/compaction): "
          f"{(t_full - t_exp - t_merge)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
