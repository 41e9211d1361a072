"""Compiled-kernel correctness on the real TPU chip (``-m tpu`` lane).

These pin the Mosaic lowering of the bench-headline path: the streaming
DIA kernel, the chain kernel, and the ``best_spmv`` dispatch route. Small
shapes keep compile times tolerable; each kernel is compared against the
XLA reference lowering on the same device.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def _banded_dia(rng, n, offsets):
    from spsparse_tpu.core.dia import SparseDIA
    offs = np.asarray(offsets)
    cols = np.arange(n)[:, None] + offs[None, :]
    valid = (cols >= 0) & (cols < n)
    vals = np.where(valid, rng.uniform(-1, 1, (n, offs.size)),
                    0).astype(np.float32)
    return SparseDIA(data=jnp.asarray(vals.T.copy()),
                     offsets=tuple(int(o) for o in offs), shape=(n, n))


class TestCompiledDia:
    def test_streaming_kernel_matches_xla(self, rng):
        from spsparse_tpu.ops.pallas_dia import spmv_dia_pallas
        from spsparse_tpu.ops.spmv_kernels import spmv_dia
        n = 1 << 15
        dia = _banded_dia(rng, n, [-5, -1, 0, 2, 7])
        x = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
        y_k = np.asarray(jax.block_until_ready(spmv_dia_pallas(dia, x)))
        y_r = np.asarray(jax.block_until_ready(spmv_dia(dia, x)))
        np.testing.assert_allclose(y_k, y_r, rtol=1e-5, atol=1e-5)

    def test_chain_kernel_matches_repeated(self, rng):
        from spsparse_tpu.ops.pallas_dia import prepare_dia, spmv_dia_pallas
        from spsparse_tpu.ops.pallas_dia_chain import spmv_dia_chain_pallas
        n = 1 << 14
        dia = _banded_dia(rng, n, [-1, 0, 1])
        prep = prepare_dia(dia)
        x = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
        scale = 0.5
        y_chain = spmv_dia_chain_pallas(prep, x, iters=3, scale=scale)
        y = x
        for _ in range(3):
            y = scale * spmv_dia_pallas(prep, y)
        np.testing.assert_allclose(np.asarray(y_chain), np.asarray(y),
                                   rtol=1e-4, atol=1e-4)

    def test_best_spmv_routes_to_pallas_on_tpu(self, rng):
        from spsparse_tpu.ops.spmv_kernels import best_spmv, spmv_dia
        n = 1 << 13
        dia = _banded_dia(rng, n, [-2, 0, 3])
        x = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
        y = np.asarray(jax.block_until_ready(best_spmv(dia, x)))
        y_ref = np.asarray(jax.block_until_ready(spmv_dia(dia, x)))
        np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


class TestCompiledBlockSort:
    def test_sort_blocks_compiled(self, rng):
        from spsparse_tpu.ops.pallas_sort import sort_blocks
        nblk, R = 4, 64
        k = rng.integers(0, 1 << 30, (nblk, R, 128)).astype(np.int32)
        v = (k % 997).astype(np.float32)
        ks, vs = jax.block_until_ready(
            sort_blocks((jnp.asarray(k), jnp.asarray(v)), num_keys=1))
        for b in range(nblk):
            flat = np.asarray(ks)[b].ravel()
            assert (np.diff(flat) >= 0).all()
            assert np.array_equal(np.sort(k[b].ravel()), flat)
            np.testing.assert_array_equal(np.asarray(vs)[b].ravel(),
                                          flat % 997)


class TestCompiledTiledDense:
    def test_spmm_dense_blocks_compiled(self, rng):
        from spsparse_tpu import CooBuilder
        from spsparse_tpu.core.tiled import to_tiled
        from spsparse_tpu.ops.pallas_tiled import spmm_tiled_dense_pallas
        m, k, K, N = 1024, 2048, 20, 128
        rr = np.repeat(np.arange(m), K)
        cc = np.clip(rr * 2 + rng.integers(-100, 101, rr.size), 0, k - 1)
        b = CooBuilder((m, k), dtype=np.float32)
        b.add_many(np.stack([rr, cc], 1),
                   rng.uniform(-1, 1, rr.size).astype(np.float32))
        A = b.build()
        X = rng.uniform(-1, 1, (k, N)).astype(np.float32)
        Y = np.asarray(jax.block_until_ready(
            spmm_tiled_dense_pallas(to_tiled(A), jnp.asarray(X))))
        ref = np.asarray(A.to_dense()) @ X
        np.testing.assert_allclose(Y, ref, rtol=2e-5, atol=2e-4)


class TestCompiledTiledDenseBf16:
    def test_spmm_bf16_blocks_compiled(self, rng):
        from spsparse_tpu import CooBuilder
        from spsparse_tpu.core.tiled import to_tiled
        from spsparse_tpu.ops.pallas_tiled import (prepare_tiled_dense,
                                                   spmm_tiled_dense_pallas)
        m, k, K, N = 1024, 2048, 20, 128
        rr = np.repeat(np.arange(m), K)
        cc = np.clip(rr * 2 + rng.integers(-100, 101, rr.size), 0, k - 1)
        b = CooBuilder((m, k), dtype=np.float32)
        b.add_many(np.stack([rr, cc], 1),
                   rng.uniform(-1, 1, rr.size).astype(np.float32))
        A = b.build()
        prep = prepare_tiled_dense(to_tiled(A), dtype=jnp.bfloat16)
        X = rng.uniform(-1, 1, (k, N)).astype(np.float32)
        Y = np.asarray(jax.block_until_ready(
            spmm_tiled_dense_pallas(prep, jnp.asarray(X))))
        ref = np.asarray(A.to_dense()) @ X
        np.testing.assert_allclose(Y, ref, rtol=0.03, atol=0.05)


class TestCompiledTiledGemm:
    def test_pairs_kernel_compiled(self, rng):
        from spsparse_tpu import CooBuilder
        from spsparse_tpu.core.tiled import to_tiled
        from spsparse_tpu.ops.spgemm_tiled import (densify_tiled,
                                                   plan_tiled_spgemm,
                                                   spgemm_tiled_pallas)
        n = 2048
        r = np.repeat(np.arange(n), 4)
        c = np.minimum(r * 2 + rng.integers(0, 3, r.size), 2 * n - 1)
        b = CooBuilder((n, 2 * n), dtype=np.float32)
        b.add_many(np.stack([r, c], 1),
                   rng.uniform(0, 1, r.size).astype(np.float32))
        A = b.build().consolidate((0, 1))
        ta = densify_tiled(to_tiled(A))
        plan = plan_tiled_spgemm(ta, ta, transpose_b=True)
        out = spgemm_tiled_pallas(ta, ta, plan)
        got = np.asarray(jax.block_until_ready(out.to_dense()))
        dA = np.asarray(A.to_dense())
        np.testing.assert_allclose(got, dA @ dA.T, rtol=1e-5, atol=1e-5)


class TestCompiledMrhsV2:
    def test_mrhs_compiled_matches_single(self, rng):
        from spsparse_tpu.ops.pallas_dia import prepare_dia
        from spsparse_tpu.ops.pallas_dia_mrhs import spmm_dia_mrhs_pallas
        from spsparse_tpu.ops.spmv_kernels import spmv_dia
        n = 1 << 14
        dia = _banded_dia(rng, n, [-3, -1, 0, 1, 5])
        prep = prepare_dia(dia)
        X = rng.uniform(-1, 1, (8, n)).astype(np.float32)
        Y = np.asarray(jax.block_until_ready(
            spmm_dia_mrhs_pallas(prep, jnp.asarray(X))))
        for i in range(8):
            y_ref = np.asarray(jax.block_until_ready(
                spmv_dia(dia, jnp.asarray(X[i]))))
            np.testing.assert_allclose(Y[i], y_ref, rtol=1e-5, atol=1e-5)


class TestCompiledPackedGeneral:
    def _scattered(self, rng, m=1024, K=8):
        from spsparse_tpu import CooBuilder
        ncols = 8 * m
        rr = np.repeat(np.arange(m), K)
        cc = rng.integers(0, ncols, rr.size)
        b = CooBuilder((m, ncols), dtype=np.float32)
        b.add_many(np.stack([rr, cc], 1),
                   rng.uniform(-1, 1, rr.size).astype(np.float32))
        return b.build()

    def test_spmm_general_compiled_both_kernels(self, rng):
        from spsparse_tpu.ops import prepare_general
        from spsparse_tpu.ops.general import spmm_general
        A = self._scattered(rng)                       # -> one_hot
        X = rng.uniform(-1, 1, (A.shape[1], 128)).astype(np.float32)
        for pg in (prepare_general(A), prepare_general(A, pack=False)):
            Y = np.asarray(jax.block_until_ready(
                spmm_general(pg, jnp.asarray(X))))
            np.testing.assert_allclose(Y, np.asarray(A.to_dense()) @ X,
                                       rtol=2e-5, atol=2e-4)

    def test_best_spmv_routes_prepared_general(self, rng):
        from spsparse_tpu.ops import best_spmv, prepare_general
        A = self._scattered(rng, m=512)
        pg = prepare_general(A)
        x = rng.uniform(-1, 1, A.shape[1]).astype(np.float32)
        y = np.asarray(jax.block_until_ready(best_spmv(pg, jnp.asarray(x))))
        np.testing.assert_allclose(y, np.asarray(A.to_dense()) @ x,
                                   rtol=2e-5, atol=2e-4)


class TestCompiledCgV2:
    def test_cg_megakernel_solves_on_chip(self, rng):
        from spsparse_tpu.core.dia import SparseDIA
        from spsparse_tpu.ops.pallas_cg import cg_solve_dia_pallas
        n = 1 << 14
        offs = (-2, -1, 0, 1, 2)
        cols = np.arange(n)[:, None] + np.array(offs)[None, :]
        valid = (cols >= 0) & (cols < n)
        data = np.where(valid, rng.uniform(-0.2, 0.2, (n, 5)), 0)
        data = data.astype(np.float32).T.copy()
        data[2] = 3.0  # diagonally dominant SPD
        dia = SparseDIA(data=jnp.asarray(data), offsets=offs, shape=(n, n))
        b = rng.uniform(-1, 1, n).astype(np.float32)
        x, rs = jax.block_until_ready(
            cg_solve_dia_pallas(dia, jnp.asarray(b), iters=50))
        res = np.asarray(dia.to_dense()) @ np.asarray(x) - b
        assert np.abs(res).max() < 1e-3
        assert float(rs) < 1e-6


class TestCompiledKernelGrads:
    def test_dia_grad_compiles_and_matches(self, rng):
        from spsparse_tpu.ops.pallas_dia import prepare_dia, spmv_dia_pallas
        from spsparse_tpu.core.dia import SparseDIA
        n = 1 << 13
        offs = (-1, 0, 1)
        cols = np.arange(n)[:, None] + np.array(offs)[None, :]
        valid = (cols >= 0) & (cols < n)
        data = np.where(valid, rng.uniform(-1, 1, (n, 3)), 0)
        dia = SparseDIA(data=jnp.asarray(data.astype(np.float32).T.copy()),
                        offsets=offs, shape=(n, n))
        prep = prepare_dia(dia)
        x = rng.uniform(-1, 1, n).astype(np.float32)
        g = np.asarray(jax.block_until_ready(jax.grad(
            lambda v: jnp.sum(spmv_dia_pallas(prep, v) ** 2))(
                jnp.asarray(x))))
        Dd = np.asarray(dia.to_dense())
        ref = 2.0 * Dd.T @ (Dd @ x)
        np.testing.assert_allclose(g, ref, rtol=2e-4, atol=2e-3)


class TestCompiledGatherLayout:
    def test_gather_spmm_on_chip(self, rng):
        from spsparse_tpu.ops import prepare_general
        from spsparse_tpu.ops.general import spmm_general
        m, K = 1 << 12, 8
        ncols = 8 * m
        rr = np.repeat(np.arange(m), K)
        cc = rng.integers(0, ncols, rr.size)
        from spsparse_tpu import CooBuilder
        b = CooBuilder((m, ncols), dtype=np.float32)
        b.add_many(np.stack([rr, cc], 1),
                   rng.uniform(-1, 1, rr.size).astype(np.float32))
        A = b.build()
        pg = prepare_general(A)
        assert pg.kernel == "gather"
        X = rng.uniform(-1, 1, (ncols, 16)).astype(np.float32)
        Y = np.asarray(jax.block_until_ready(
            spmm_general(pg, jnp.asarray(X))))
        np.testing.assert_allclose(Y, np.asarray(A.to_dense()) @ X,
                                   rtol=2e-5, atol=2e-4)


class TestReorderToDia:
    def test_rcm_routes_scattered_matrix_onto_dia_kernel(self, rng):
        """Round-3 integration: a scrambled banded matrix RCM-reorders
        onto the streaming DIA Pallas kernel and matches the permuted
        dense oracle on the real chip."""
        import spsparse_tpu as sp
        from spsparse_tpu.core.dia import to_dia
        from spsparse_tpu.ops.pallas_dia import spmv_dia_pallas

        n, band = 1 << 12, 2
        A = np.zeros((n, n), np.float32)
        for off in range(band + 1):
            v = rng.uniform(0.5, 1.5, n - off).astype(np.float32)
            A[np.arange(n - off), np.arange(off, n)] = v
            A[np.arange(off, n), np.arange(n - off)] = v
        p = rng.permutation(n)
        S = A[np.ix_(p, p)]
        ii, jj = np.nonzero(S)
        b = sp.CooBuilder((n, n), dtype=np.float32)
        b.add_many(np.stack([ii, jj], 1), S[ii, jj])
        Ac = b.build()
        perm = sp.rcm_permutation(Ac)
        B = sp.coo_permute(Ac, jnp.asarray(perm)).consolidate((0, 1))
        assert sp.bandwidth(B) <= 3 * band
        dia = to_dia(B)
        x = rng.uniform(-1, 1, n).astype(np.float32)
        y = np.asarray(jax.block_until_ready(
            spmv_dia_pallas(dia, jnp.asarray(x[perm]))))
        np.testing.assert_allclose(y, (S @ x)[perm], rtol=2e-4, atol=2e-4)


class TestCompiledWindowGemm:
    def test_window_gemm_compiled(self, rng):
        """Round-5 rolling-window band SpGEMM: Mosaic lowering + results
        vs dense on chip (small shapes; the perf claim lives in
        probes/probe_cfg4_window_r5.py)."""
        from spsparse_tpu import CooBuilder
        from spsparse_tpu.core.tiled import to_tiled
        from spsparse_tpu.ops.pallas_tiled import prepare_tiled_dense
        from spsparse_tpu.ops.spgemm_window import (band_to_tiled_blocks,
                                                    plan_window_spgemm,
                                                    spgemm_window_pallas)
        import jax.numpy as jnp
        n = 2048
        r = np.repeat(np.arange(n), 4)
        c = np.minimum(r * 2 + rng.integers(0, 3, r.size), 2 * n - 1)
        b = CooBuilder((n, 2 * n), dtype=np.float32)
        b.add_many(np.stack([r, c], 1),
                   rng.uniform(0, 1, r.size).astype(np.float32))
        A = b.build()
        prep = prepare_tiled_dense(to_tiled(A), dtype=jnp.float32)
        plan = plan_window_spgemm(prep.tcols, prep.tcols, nbc=prep.nbc,
                                  out_shape=(n, n), group=4,
                                  dtype=jnp.float32)
        band = jax.block_until_ready(spgemm_window_pallas(plan, prep.blocks))
        got = np.asarray(band_to_tiled_blocks(band, plan).to_dense())
        dA = np.asarray(A.to_dense())
        np.testing.assert_allclose(got, dA @ dA.T, rtol=1e-5, atol=1e-5)


class TestCompiledGatherEll:
    def test_gather_ell_on_chip(self, rng):
        """Round-5 ELL reshape-reduce for scattered matrices: compiled
        path + bf16-RHS arm vs dense (the 10.6x config-3b fix)."""
        from spsparse_tpu import CooBuilder
        from spsparse_tpu.ops import prepare_general
        from spsparse_tpu.ops.general import spmm_general
        m, K = 2048, 8
        ncols = 8 * m
        rr = np.repeat(np.arange(m), K)
        cc = rng.integers(0, ncols, rr.size)
        b = CooBuilder((m, ncols), dtype=np.float32)
        b.add_many(np.stack([rr, cc], 1),
                   rng.uniform(-1, 1, rr.size).astype(np.float32))
        A = b.build()
        pg = prepare_general(A)
        assert pg.kernel == "gather_ell"
        X = rng.uniform(-1, 1, (ncols, 64)).astype(np.float32)
        ref = np.asarray(A.to_dense()) @ X
        Y = np.asarray(jax.block_until_ready(
            spmm_general(pg, jnp.asarray(X))))
        np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4)
        Yb = np.asarray(jax.block_until_ready(
            spmm_general(pg, jnp.asarray(X).astype(jnp.bfloat16))))
        rel = np.abs(Yb - ref).max() / np.abs(ref).max()
        assert rel < 2e-2
