"""Distributed graph relaxations (dist.graph) on the 8-device virtual
mesh, vs scipy.sparse.csgraph and the single-chip graph tier."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import scipy.sparse as sps
import scipy.sparse.csgraph as cs

from spsparse_tpu import SparseCOO
from spsparse_tpu.dist import (partition_rows, dist_bellman_ford,
                               dist_bfs_levels, dist_connected_components)
from spsparse_tpu.graph import bellman_ford, connected_components


@pytest.fixture
def mesh():
    return Mesh(np.array(jax.devices()), ("x",))


def random_graph(seed, n=61, m=150):
    rng = np.random.default_rng(seed)
    dense = np.zeros((n, n))
    r, c = rng.integers(0, n, m), rng.integers(0, n, m)
    w = rng.uniform(0.2, 4.0, m)
    for i, j, v in zip(r, c, w):
        if i != j:
            dense[i, j] = v
    rr, cc = dense.nonzero()
    A = SparseCOO.from_arrays(np.stack([rr, cc], 1), dense[rr, cc], (n, n))
    return A, dense


class TestDistBellmanFord:
    @pytest.mark.parametrize("seed", range(3))
    def test_vs_scipy(self, mesh, seed):
        A, dense = random_graph(seed)
        n = dense.shape[0]
        part = partition_rows(A, 8)
        src = [0, 5, 17]
        out = dist_bellman_ford(part, src, mesh)
        d = np.asarray(out).reshape(-1, len(src))[:n].T
        ref = cs.bellman_ford(sps.csr_matrix(dense), indices=src)
        np.testing.assert_allclose(d, ref)

    def test_matches_single_chip(self, mesh):
        A, dense = random_graph(5)
        n = dense.shape[0]
        part = partition_rows(A, 8)
        out = dist_bellman_ford(part, [3], mesh)
        d = np.asarray(out).reshape(-1, 1)[:n, 0]
        local = np.asarray(bellman_ford(A, [3]))[0]
        np.testing.assert_allclose(d, local)

    def test_bfs_levels(self, mesh):
        A, dense = random_graph(1)
        n = dense.shape[0]
        part = partition_rows(A, 8)
        lv = np.asarray(dist_bfs_levels(part, [2], mesh)).reshape(-1)[:n]
        ref = cs.shortest_path(sps.csr_matrix(dense), method="BF",
                               unweighted=True, indices=[2])[0]
        np.testing.assert_allclose(lv, ref)

    def test_disconnected_inf(self, mesh):
        # two components: nodes >= 32 unreachable from 0
        n = 48
        dense = np.zeros((n, n))
        for i in range(31):
            dense[i, i + 1] = 1.0
        for i in range(32, n - 1):
            dense[i, i + 1] = 1.0
        rr, cc = dense.nonzero()
        A = SparseCOO.from_arrays(np.stack([rr, cc], 1), dense[rr, cc],
                                  (n, n))
        part = partition_rows(A, 8)
        d = np.asarray(dist_bellman_ford(part, [0], mesh)).reshape(-1)[:n]
        assert np.isfinite(d[:32]).all() and np.isinf(d[32:]).all()


class TestDistConnectedComponents:
    @pytest.mark.parametrize("seed", range(3))
    def test_vs_scipy_and_local(self, mesh, seed):
        A, dense = random_graph(seed, m=70)
        n = dense.shape[0]
        lab = np.asarray(dist_connected_components(partition_rows(A, 8),
                                                   mesh))[:n]
        _, lab_ref = cs.connected_components(sps.csr_matrix(dense),
                                             connection="weak")
        np.testing.assert_array_equal(lab, lab_ref)
        _, lab_local = connected_components(A)
        np.testing.assert_array_equal(lab, np.asarray(lab_local))

    def test_no_edges(self, mesh):
        A = SparseCOO.empty((40, 40), cap=4)
        lab = np.asarray(dist_connected_components(partition_rows(A, 8),
                                                   mesh))[:40]
        np.testing.assert_array_equal(lab, np.arange(40))
