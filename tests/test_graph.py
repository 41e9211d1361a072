"""Graph tier (spsparse_tpu.graph) vs scipy.sparse.csgraph oracles.

Same differential-testing pattern as the reference's randomized
multiply tests (/root/reference/tests/test_multiply_sparse.cpp:84-136):
seeded random graphs, scipy as the dense/CSR oracle. No reference
counterpart exists for this tier (SURVEY.md §2 — the reference has no
graph layer); scipy.sparse.csgraph defines the contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import scipy.sparse as sp
import scipy.sparse.csgraph as cs

from spsparse_tpu import SparseCOO
from spsparse_tpu.core.errors import SpSparseError
from spsparse_tpu.graph import (
    MIN_PLUS, MAX_MIN, OR_AND, NEG_SENTINEL,
    spmv_semiring, bellman_ford, shortest_path, floyd_warshall,
    bfs_levels, breadth_first_order, connected_components,
    minimum_spanning_tree, laplacian,
)


def random_graph(seed, n=24, m=60, symmetric=False, negative=False):
    """(SparseCOO, scipy.csr, dense) of a random weighted digraph."""
    rng = np.random.default_rng(seed)
    dense = np.zeros((n, n))
    r = rng.integers(0, n, m)
    c = rng.integers(0, n, m)
    lo = -1.0 if negative else 0.1
    w = rng.uniform(lo, 5.0, m)
    for i, j, v in zip(r, c, w):
        if i != j:
            dense[i, j] = v
    if symmetric:
        dense = np.maximum(dense, dense.T)
    rr, cc = dense.nonzero()
    A = SparseCOO.from_arrays(np.stack([rr, cc], 1), dense[rr, cc], (n, n))
    return A, sp.csr_matrix(dense), dense


def check_tree(dist, pred, dense, sources):
    """Any valid shortest-path tree: pred edges must achieve the dist."""
    dist, pred = np.asarray(dist), np.asarray(pred)
    for k, s in enumerate(np.atleast_1d(sources)):
        for j in range(dense.shape[0]):
            if j == s or not np.isfinite(dist[k, j]):
                assert pred[k, j] == NEG_SENTINEL
            else:
                i = pred[k, j]
                assert i >= 0 and dense[i, j] != 0
                assert np.isclose(dist[k, i] + dense[i, j], dist[k, j])


class TestShortestPaths:
    @pytest.mark.parametrize("seed", range(5))
    @pytest.mark.parametrize("directed", [True, False])
    def test_bellman_ford_vs_scipy(self, seed, directed):
        A, G, dense = random_graph(seed)
        src = [0, 5, 11]
        d = bellman_ford(A, src, directed=directed)
        ref = cs.bellman_ford(G, directed=directed, indices=src)
        np.testing.assert_allclose(np.asarray(d), ref)

    def test_predecessors_form_valid_tree(self):
        A, G, dense = random_graph(3)
        src = [0, 7]
        d, p = bellman_ford(A, src, return_predecessors=True)
        check_tree(d, p, dense, src)

    def test_negative_weights_match_scipy(self):
        # a DAG-ish graph (upper triangular) cannot have cycles
        rng = np.random.default_rng(0)
        n = 12
        dense = np.triu(rng.uniform(-1, 2, (n, n)), 1)
        dense[rng.uniform(size=(n, n)) < 0.6] = 0
        rr, cc = dense.nonzero()
        A = SparseCOO.from_arrays(np.stack([rr, cc], 1), dense[rr, cc],
                                  (n, n))
        d = bellman_ford(A, [0])
        ref = cs.bellman_ford(sp.csr_matrix(dense), indices=[0])
        np.testing.assert_allclose(np.asarray(d), ref)

    def test_negative_cycle_raises(self):
        A = SparseCOO.from_arrays(np.array([[0, 1], [1, 0]]),
                                  np.array([1.0, -2.0]), (3, 3))
        with pytest.raises(SpSparseError, match="negative"):
            bellman_ford(A, [0])

    def test_floyd_warshall_vs_scipy(self):
        A, G, dense = random_graph(4)
        for directed in (True, False):
            D = floyd_warshall(A, directed=directed)
            np.testing.assert_allclose(
                np.asarray(D), cs.floyd_warshall(G, directed=directed))

    def test_floyd_warshall_predecessors(self):
        A, G, dense = random_graph(6)
        D, P = floyd_warshall(A, return_predecessors=True)
        check_tree(D, P, dense, np.arange(dense.shape[0]))

    def test_shortest_path_all_sources(self):
        A, G, _ = random_graph(7)
        for method in ("auto", "BF", "D", "FW"):
            SP = shortest_path(A, method=method)
            np.testing.assert_allclose(np.asarray(SP),
                                       cs.shortest_path(G, method="BF"))

    def test_shortest_path_unweighted(self):
        A, G, _ = random_graph(8)
        d = shortest_path(A, indices=[2], unweighted=True)
        ref = cs.shortest_path(G, method="BF", unweighted=True, indices=[2])
        np.testing.assert_allclose(np.asarray(d), ref)

    def test_jit_and_fixed_iteration(self):
        A, G, _ = random_graph(9)
        f = jax.jit(lambda a: bellman_ford(a, jnp.array([0, 1]),
                                           maxiter=int(a.shape[0])))
        np.testing.assert_allclose(np.asarray(f(A)),
                                   cs.bellman_ford(G, indices=[0, 1]))

    def test_explicit_zero_weight_edge_is_an_edge(self):
        # scipy sparse-input convention: stored zeros are edges
        A = SparseCOO.from_arrays(np.array([[0, 1], [1, 2]]),
                                  np.array([0.0, 3.0]), (3, 3))
        d = np.asarray(bellman_ford(A, [0]))
        np.testing.assert_allclose(d[0], [0.0, 0.0, 3.0])


class TestBFS:
    def test_levels_vs_scipy(self):
        A, G, _ = random_graph(1, symmetric=True)
        lv = np.asarray(bfs_levels(A, 0, directed=False))
        ref = cs.shortest_path(G, method="BF", unweighted=True,
                               directed=False, indices=[0])[0]
        np.testing.assert_allclose(lv, ref)

    def test_breadth_first_order(self):
        A, G, dense = random_graph(2, symmetric=True)
        order, pred = breadth_first_order(A, 0, directed=False)
        ref_order, _ = cs.breadth_first_order(G, 0, directed=False)
        # same reachable set, source first, levels non-decreasing
        assert set(order.tolist()) == set(ref_order.tolist())
        assert order[0] == 0
        lv = np.asarray(bfs_levels(A, 0, directed=False))
        assert (np.diff(lv[order]) >= 0).all()
        # predecessor of every non-source reachable node is one level up
        for j in order[1:]:
            assert lv[pred[j]] == lv[j] - 1 and dense[pred[j], j] != 0


class TestConnectedComponents:
    @pytest.mark.parametrize("seed", range(5))
    def test_weak_matches_scipy_exactly(self, seed):
        A, G, _ = random_graph(seed, n=40, m=45)
        nc, lab = connected_components(A)
        nc_ref, lab_ref = cs.connected_components(G, connection="weak")
        assert nc == nc_ref
        np.testing.assert_array_equal(np.asarray(lab), lab_ref)

    def test_strong_partition_matches_scipy(self):
        A, G, _ = random_graph(11, n=20, m=50)
        nc, lab = connected_components(A, connection="strong")
        nc_ref, lab_ref = cs.connected_components(G, connection="strong")
        assert nc == nc_ref
        part = lambda l: sorted(
            sorted(np.where(l == x)[0].tolist()) for x in np.unique(l))
        assert part(np.asarray(lab)) == part(lab_ref)

    def test_no_edges(self):
        A = SparseCOO.empty((5, 5), cap=4)
        nc, lab = connected_components(A)
        assert nc == 5
        np.testing.assert_array_equal(np.asarray(lab), np.arange(5))

    def test_jit(self):
        A, G, _ = random_graph(12)
        f = jax.jit(lambda a: connected_components(a))
        nc, lab = f(A)
        nc_ref, lab_ref = cs.connected_components(G, connection="weak")
        assert int(nc) == nc_ref
        np.testing.assert_array_equal(np.asarray(lab), lab_ref)


class TestMST:
    @pytest.mark.parametrize("seed", range(8))
    def test_vs_scipy(self, seed):
        A, G, dense = random_graph(seed, n=24, m=70, symmetric=True)
        T = minimum_spanning_tree(A)
        T_ref = cs.minimum_spanning_tree(G)
        td = np.asarray(T.to_dense())
        assert np.isclose(td.sum(), T_ref.sum())
        # edge count: n - n_components
        nc = cs.connected_components(G, connection="weak",
                                     return_labels=False)
        assert int(T.nnz) == dense.shape[0] - nc

    def test_distinct_weights_exact_pattern(self):
        # with all-distinct weights the MST is unique -> exact match
        rng = np.random.default_rng(5)
        n = 16
        iu = np.triu_indices(n, 1)
        w = rng.permutation(len(iu[0])).astype(float) + 1
        keep = rng.uniform(size=len(w)) < 0.4
        dense = np.zeros((n, n))
        dense[iu[0][keep], iu[1][keep]] = w[keep]
        dense = dense + dense.T
        rr, cc = dense.nonzero()
        A = SparseCOO.from_arrays(np.stack([rr, cc], 1), dense[rr, cc],
                                  (n, n))
        T = np.asarray(minimum_spanning_tree(A).to_dense())
        T_ref = cs.minimum_spanning_tree(sp.csr_matrix(dense)).toarray()
        np.testing.assert_allclose(T + T.T, T_ref + T_ref.T)

    def test_jit(self):
        A, G, _ = random_graph(2, symmetric=True)
        T = jax.jit(minimum_spanning_tree)(A)
        assert np.isclose(np.asarray(T.to_dense()).sum(),
                          cs.minimum_spanning_tree(G).sum())


class TestLaplacian:
    def test_vs_scipy(self):
        A, G, _ = random_graph(3, symmetric=True)
        np.testing.assert_allclose(np.asarray(laplacian(A).to_dense()),
                                   cs.laplacian(G, normed=False).toarray())

    def test_normed_vs_scipy(self):
        A, G, _ = random_graph(4, symmetric=True)
        np.testing.assert_allclose(
            np.asarray(laplacian(A, normed=True).to_dense()),
            cs.laplacian(G, normed=True).toarray(), atol=1e-12)

    def test_input_diagonal_ignored(self):
        dense = np.array([[7.0, 2.0], [2.0, 9.0]])
        rr, cc = dense.nonzero()
        A = SparseCOO.from_arrays(np.stack([rr, cc], 1), dense[rr, cc],
                                  (2, 2))
        np.testing.assert_allclose(
            np.asarray(laplacian(A).to_dense()),
            cs.laplacian(sp.csr_matrix(dense)).toarray())

    def test_return_diag(self):
        A, G, _ = random_graph(5, symmetric=True)
        L, d = laplacian(A, return_diag=True)
        ref_L, ref_d = cs.laplacian(G, return_diag=True)
        np.testing.assert_allclose(np.asarray(d), ref_d)


class TestSemiring:
    def test_or_and_reachability(self):
        A, G, dense = random_graph(6)
        n = dense.shape[0]
        x = jnp.zeros(n).at[0].set(1.0)
        # iterate to fixpoint -> reachable set of node 0
        for _ in range(n):
            x = jnp.maximum(x, spmv_semiring(A, x, OR_AND))
        ref = np.isfinite(cs.bellman_ford(G, indices=[0])[0])
        np.testing.assert_array_equal(np.asarray(x) > 0, ref)

    def test_max_min_bottleneck(self):
        # widest-path: maximize the minimum edge capacity along the path
        A, G, dense = random_graph(7)
        n = dense.shape[0]
        x = jnp.full(n, -jnp.inf).at[0].set(jnp.inf)
        for _ in range(n):
            x = jnp.maximum(x, spmv_semiring(A, x, MAX_MIN))
        # brute-force oracle on the small graph
        cap = np.where(dense > 0, dense, -np.inf)
        ref = np.full(n, -np.inf)
        ref[0] = np.inf
        for _ in range(n):
            ref = np.maximum(ref, np.max(
                np.minimum(ref[:, None], cap), axis=0))
        np.testing.assert_allclose(np.asarray(x), ref)

    def test_min_plus_is_one_relaxation(self):
        A, _, dense = random_graph(8)
        n = dense.shape[0]
        x = jnp.where(jnp.arange(n) == 0, 0.0, jnp.inf)
        y = spmv_semiring(A, x, MIN_PLUS)
        ref = np.where(dense[0] != 0, dense[0], np.inf)
        np.testing.assert_allclose(np.asarray(y), ref)

    def test_batched_frontier(self):
        A, G, _ = random_graph(9)
        n = int(A.shape[0])
        X = jnp.full((n, 2), jnp.inf).at[0, 0].set(0.0).at[3, 1].set(0.0)
        Y = spmv_semiring(A, X, MIN_PLUS)
        y0 = spmv_semiring(A, X[:, 0], MIN_PLUS)
        np.testing.assert_allclose(np.asarray(Y[:, 0]), np.asarray(y0))

    def test_duplicates_absorbed(self):
        # duplicate entries: min-plus takes the lighter parallel edge
        A = SparseCOO.from_arrays(np.array([[0, 1], [0, 1]]),
                                  np.array([5.0, 2.0]), (2, 2))
        x = jnp.array([0.0, jnp.inf])
        np.testing.assert_allclose(
            np.asarray(spmv_semiring(A, x, MIN_PLUS)), [np.inf, 2.0])


class TestBipartiteMatching:
    @pytest.mark.parametrize("seed", range(6))
    def test_cardinality_vs_scipy(self, seed):
        from spsparse_tpu.graph import maximum_bipartite_matching
        rng = np.random.default_rng(seed)
        nr, nc_ = 15, 12
        dense = (rng.uniform(size=(nr, nc_)) < 0.18).astype(float)
        rr, cc = dense.nonzero()
        if len(rr) == 0:
            return
        A = SparseCOO.from_arrays(np.stack([rr, cc], 1), dense[rr, cc],
                                  (nr, nc_))
        m = maximum_bipartite_matching(A, perm_type="row")
        ref = cs.maximum_bipartite_matching(
            sp.csr_matrix(dense), perm_type="column")
        # same cardinality; our matching must be valid
        assert (m >= 0).sum() == (ref >= 0).sum()
        used = set()
        for u, v in enumerate(m):
            if v >= 0:
                assert dense[u, v] != 0 and v not in used
                used.add(v)

    def test_column_perm_type(self):
        from spsparse_tpu.graph import maximum_bipartite_matching
        dense = np.array([[1.0, 1.0], [0.0, 1.0]])
        rr, cc = dense.nonzero()
        A = SparseCOO.from_arrays(np.stack([rr, cc], 1), dense[rr, cc],
                                  (2, 2))
        mc = maximum_bipartite_matching(A, perm_type="column")
        np.testing.assert_array_equal(mc, [0, 1])

    def test_structural_rank_vs_scipy(self):
        from spsparse_tpu.graph import structural_rank
        rng = np.random.default_rng(3)
        dense = (rng.uniform(size=(20, 20)) < 0.12).astype(float)
        rr, cc = dense.nonzero()
        A = SparseCOO.from_arrays(np.stack([rr, cc], 1), dense[rr, cc],
                                  (20, 20))
        assert structural_rank(A) == cs.structural_rank(
            sp.csr_matrix(dense))

    def test_perfect_matching(self):
        from spsparse_tpu.graph import structural_rank
        from spsparse_tpu import coo_eye
        assert structural_rank(coo_eye(7)) == 7


class TestMaximumFlow:
    @pytest.mark.parametrize("seed", range(8))
    def test_value_vs_scipy_and_validity(self, seed):
        from spsparse_tpu.graph import maximum_flow
        rng = np.random.default_rng(seed)
        n = int(rng.integers(6, 25))
        dense = np.where(rng.uniform(size=(n, n)) < 0.25,
                         rng.integers(1, 10, (n, n)), 0)
        np.fill_diagonal(dense, 0)
        rr, cc = dense.nonzero()
        if len(rr) == 0:
            return
        A = SparseCOO.from_arrays(np.stack([rr, cc], 1),
                                  dense[rr, cc].astype(np.float64), (n, n))
        res = maximum_flow(A, 0, n - 1)
        ref = cs.maximum_flow(sp.csr_matrix(dense.astype(np.int32)),
                              0, n - 1)
        assert res.flow_value == ref.flow_value
        # flow validity: capacity bounds + conservation
        F = np.zeros((n, n))
        iv, vv = res.flow.to_lists()
        for (i, j), v in zip(np.asarray(iv).reshape(-1, 2), vv):
            F[i, j] += v
        assert (F <= dense + 1e-9).all()
        net = (F - F.T).sum(axis=1)
        np.testing.assert_allclose(net[1:n - 1], 0, atol=1e-9)
        assert np.isclose(net[0], res.flow_value)

    def test_non_integer_rejected(self):
        from spsparse_tpu.graph import maximum_flow
        A = SparseCOO.from_arrays(np.array([[0, 1]]), np.array([1.5]),
                                  (2, 2))
        with pytest.raises(SpSparseError, match="integer"):
            maximum_flow(A, 0, 1)

    def test_disconnected_zero_flow(self):
        from spsparse_tpu.graph import maximum_flow
        A = SparseCOO.from_arrays(np.array([[0, 1]]), np.array([3.0]),
                                  (4, 4))
        assert maximum_flow(A, 2, 3).flow_value == 0

    def test_self_loops_kept_in_output_with_zero_flow(self):
        # stored self-loop entries stay in the output sparsity (flow 0);
        # they are only filtered from the internal residual network
        from spsparse_tpu.graph import maximum_flow
        idx = np.array([[0, 1], [1, 1], [1, 2], [0, 0]])
        A = SparseCOO.from_arrays(idx, np.array([2.0, 5.0, 3.0, 7.0]),
                                  (3, 3))
        res = maximum_flow(A, 0, 2)
        assert res.flow_value == 2
        iv, vv = res.flow.to_lists()
        got = {tuple(i): float(v)
               for i, v in zip(np.asarray(iv).reshape(-1, 2), vv)}
        assert got == {(0, 1): 2.0, (1, 1): 0.0, (1, 2): 2.0,
                       (0, 0): 0.0}


class TestRelaxPlan:
    """Scatter-free ELL-by-head relaxation plan (semiring.prepare_relax)."""

    def test_relax_matches_spmv_semiring(self):
        from spsparse_tpu.graph import prepare_relax, relax
        A, S, dense = random_graph(7)
        plan = prepare_relax(A)
        x = np.random.default_rng(1).uniform(0.0, 9.0, A.shape[0])
        for sr in (MIN_PLUS, MAX_MIN, OR_AND):
            xs = (x > 4.5) if sr is OR_AND else x
            got = np.asarray(relax(plan, jnp.asarray(xs), sr))
            want = np.asarray(spmv_semiring(A, jnp.asarray(xs), sr))
            np.testing.assert_allclose(got, want)

    def test_relax_multi_column(self):
        from spsparse_tpu.graph import prepare_relax, relax
        A, S, dense = random_graph(8)
        plan = prepare_relax(A)
        X = np.random.default_rng(2).uniform(0.0, 9.0, (A.shape[0], 3))
        got = np.asarray(relax(plan, jnp.asarray(X), MIN_PLUS))
        want = np.stack([np.asarray(spmv_semiring(A, jnp.asarray(X[:, j]),
                                                  MIN_PLUS))
                         for j in range(3)], axis=1)
        np.testing.assert_allclose(got, want)

    @pytest.mark.parametrize("directed", [True, False])
    def test_bellman_ford_plan_vs_scipy(self, directed):
        from spsparse_tpu.graph import prepare_relax
        A, S, dense = random_graph(11)
        plan = prepare_relax(A, directed=directed)
        dist, pred = bellman_ford(plan, [0, 5], return_predecessors=True)
        ref = cs.bellman_ford(S, directed=directed, indices=[0, 5])
        np.testing.assert_allclose(np.asarray(dist), ref)
        if directed:
            d = dense
        else:
            # undirected: edge exists in either direction, weight = min
            both = (dense != 0) & (dense.T != 0)
            d = np.where(both, np.minimum(dense, dense.T), dense + dense.T)
        check_tree(dist, pred, d, [0, 5])

    def test_bellman_ford_plan_unweighted(self):
        from spsparse_tpu.graph import prepare_relax
        A, S, dense = random_graph(12)
        plan = prepare_relax(A, unweighted=True)
        dist = bellman_ford(plan, 0)
        ref = cs.bellman_ford(S, indices=0, unweighted=True)
        np.testing.assert_allclose(np.asarray(dist)[0], ref)

    def test_bellman_ford_plan_negative_cycle_raises(self):
        from spsparse_tpu.graph import prepare_relax
        dn = np.zeros((4, 4))
        dn[0, 1] = 1.0
        dn[1, 2] = -3.0
        dn[2, 1] = 1.0
        A = SparseCOO.from_dense(dn)
        with pytest.raises(SpSparseError, match="negative-weight cycle"):
            bellman_ford(prepare_relax(A), 0)

    def test_plan_flag_conflict_raises(self):
        from spsparse_tpu.graph import prepare_relax
        A, _, _ = random_graph(3)
        plan = prepare_relax(A, directed=False)
        with pytest.raises(SpSparseError, match="baked into"):
            bellman_ford(plan, 0, directed=False)

    def test_plan_jit_fixed_iteration(self):
        from spsparse_tpu.graph import prepare_relax
        A, S, dense = random_graph(13)
        plan = prepare_relax(A)

        @jax.jit
        def solve(p):
            return bellman_ford(p, 0, maxiter=A.shape[0])

        dist = solve(plan)
        ref = cs.bellman_ford(S, indices=0)
        np.testing.assert_allclose(np.asarray(dist)[0], ref)


class TestDijkstraJohnson:
    """dijkstra/johnson entry points (scipy _shortest_path.pyx parity;
    no reference counterpart — SURVEY.md §2 graph tier)."""

    @pytest.mark.parametrize("seed", [3, 11, 47])
    @pytest.mark.parametrize("directed", [True, False])
    def test_dijkstra_vs_scipy(self, seed, directed):
        from spsparse_tpu.graph import dijkstra
        A, S, dense = random_graph(seed)
        ref = cs.dijkstra(S, directed=directed, indices=[0, 5])
        got = dijkstra(A, directed=directed, indices=np.array([0, 5]))
        np.testing.assert_allclose(np.asarray(got), ref)

    def test_dijkstra_limit_and_predecessors(self):
        from spsparse_tpu.graph import dijkstra
        A, S, dense = random_graph(7)
        ref_d, _ = cs.dijkstra(S, indices=[2], limit=4.0,
                               return_predecessors=True)
        got_d, got_p = dijkstra(A, indices=np.array([2]), limit=4.0,
                                return_predecessors=True)
        np.testing.assert_allclose(np.asarray(got_d), ref_d)
        check_tree(got_d, got_p, dense, [2])

    def test_dijkstra_min_only(self):
        from spsparse_tpu.graph import dijkstra
        A, S, dense = random_graph(9)
        idx = [1, 4, 8]
        ref_d, _, ref_s = cs.dijkstra(S, indices=idx, min_only=True,
                                      return_predecessors=True)
        got_d, got_p, got_s = dijkstra(A, indices=np.array(idx),
                                       min_only=True,
                                       return_predecessors=True)
        np.testing.assert_allclose(np.asarray(got_d), ref_d)
        np.testing.assert_array_equal(np.asarray(got_s), ref_s)

    def test_dijkstra_negative_warns_but_exact(self):
        from spsparse_tpu.graph import dijkstra
        dense = np.array([[0, 2.0, 0], [0, 0, -1.0], [0, 0, 0]])
        A = SparseCOO.from_dense(dense)
        with pytest.warns(UserWarning, match="negative"):
            d = dijkstra(A, indices=np.array([0]))
        # exact (Bellman-Ford engine), unlike scipy's heap dijkstra
        np.testing.assert_allclose(np.asarray(d)[0], [0.0, 2.0, 1.0])

    @pytest.mark.parametrize("seed", [5, 21])
    def test_johnson_negative_weights_vs_scipy(self, seed):
        from spsparse_tpu.graph import johnson
        rng = np.random.default_rng(seed)
        # negative edges on a DAG-ish graph: guaranteed no negative cycle
        n = 12
        dense = np.zeros((n, n))
        for _ in range(30):
            i, j = sorted(rng.integers(0, n, 2))
            if i != j:
                dense[i, j] = rng.uniform(-1.0, 4.0)
        A = SparseCOO.from_dense(dense)
        ref = cs.johnson(sp.csr_matrix(dense))
        np.testing.assert_allclose(np.asarray(johnson(A)), ref)

    def test_johnson_negative_cycle_raises(self):
        from spsparse_tpu.graph import johnson, NegativeCycleError
        dense = np.array([[0, 1.0, 0], [0, 0, -3.0], [1.0, 0, 0]])
        A = SparseCOO.from_dense(dense)
        with pytest.raises(NegativeCycleError):
            johnson(A)


class TestTraversalTrees:
    """breadth/depth_first_order + *_tree: exact scipy parity for
    canonical (sorted, deduplicated) input, both directions."""

    @pytest.mark.parametrize("seed", [0, 13, 29])
    @pytest.mark.parametrize("directed", [True, False])
    def test_orders_and_trees_vs_scipy(self, seed, directed):
        from spsparse_tpu.graph import (breadth_first_order,
                                        depth_first_order,
                                        breadth_first_tree,
                                        depth_first_tree)
        A, S, dense = random_graph(seed)
        o_ref, p_ref = cs.breadth_first_order(S, 0, directed=directed)
        o_got, p_got = breadth_first_order(A, 0, directed=directed)
        np.testing.assert_array_equal(o_got, o_ref)
        np.testing.assert_array_equal(p_got, p_ref)
        o_ref, p_ref = cs.depth_first_order(S, 0, directed=directed)
        o_got, p_got = depth_first_order(A, 0, directed=directed)
        np.testing.assert_array_equal(o_got, o_ref)
        np.testing.assert_array_equal(p_got, p_ref)
        t_ref = cs.breadth_first_tree(S, 0, directed=directed).toarray()
        t_got = np.asarray(
            breadth_first_tree(A, 0, directed=directed).to_dense())
        np.testing.assert_allclose(t_got, t_ref)
        t_ref = cs.depth_first_tree(S, 0, directed=directed).toarray()
        t_got = np.asarray(
            depth_first_tree(A, 0, directed=directed).to_dense())
        np.testing.assert_allclose(t_got, t_ref)


class TestMinWeightMatching:
    """min_weight_full_bipartite_matching (scipy LAPJVsp parity on the
    optimal cost; the assignment itself may differ on cost ties)."""

    @pytest.mark.parametrize("seed", [1, 17, 33])
    def test_cost_vs_scipy(self, seed):
        from spsparse_tpu.graph import min_weight_full_bipartite_matching
        rng = np.random.default_rng(seed)
        n, m = 7, 9
        dense = np.where(rng.random((n, m)) < 0.7,
                         rng.uniform(1.0, 9.0, (n, m)), 0.0)
        # guarantee feasibility: a diagonal of stored entries
        for i in range(n):
            if dense[i, i] == 0:
                dense[i, i] = rng.uniform(1.0, 9.0)
        S = sp.csr_matrix(dense)
        r_ref, c_ref = cs.min_weight_full_bipartite_matching(S)
        A = SparseCOO.from_dense(dense)
        r_got, c_got = min_weight_full_bipartite_matching(A)
        r_got, c_got = np.asarray(r_got), np.asarray(c_got)
        # valid assignment over stored entries, optimal cost
        assert len(set(c_got.tolist())) == n
        assert all(dense[i, j] != 0 for i, j in zip(r_got, c_got))
        assert np.isclose(dense[r_got, c_got].sum(),
                          dense[r_ref, c_ref].sum())

    def test_infeasible_raises(self):
        from spsparse_tpu.graph import min_weight_full_bipartite_matching
        dense = np.array([[1.0, 0.0], [2.0, 0.0]])   # col 1 unmatched
        with pytest.raises(SpSparseError):
            min_weight_full_bipartite_matching(SparseCOO.from_dense(dense))

    def test_maximize(self):
        from spsparse_tpu.graph import min_weight_full_bipartite_matching
        dense = np.array([[1.0, 5.0], [2.0, 1.0]])
        S = sp.csr_matrix(dense)
        r_ref, c_ref = cs.min_weight_full_bipartite_matching(
            S, maximize=True)
        A = SparseCOO.from_dense(dense)
        r_got, c_got = min_weight_full_bipartite_matching(A, maximize=True)
        assert np.isclose(dense[np.asarray(r_got), np.asarray(c_got)].sum(),
                          dense[r_ref, c_ref].sum())


class TestPathTools:
    """yen / reconstruct_path / construct_dist_matrix
    (scipy.sparse.csgraph._tools + _shortest_path.yen parity)."""

    @pytest.mark.parametrize("seed", [2, 19, 41])
    @pytest.mark.parametrize("directed", [True, False])
    def test_yen_vs_scipy(self, seed, directed):
        from spsparse_tpu.graph import yen
        A, S, dense = random_graph(seed)
        n = dense.shape[0]
        for K in (1, 4):
            ref = cs.yen(S, 0, n - 1, K, directed=directed)
            got = np.asarray(yen(A, 0, n - 1, K, directed=directed))
            assert got.shape == ref.shape
            np.testing.assert_allclose(got, ref)

    def test_yen_predecessors_trace_valid_paths(self):
        from spsparse_tpu.graph import yen
        A, S, dense = random_graph(23)
        n = dense.shape[0]
        d, p = yen(A, 0, n - 1, 3, return_predecessors=True)
        for r in range(d.size):
            cost, v = 0.0, n - 1
            while v != 0:
                u = p[r, v]
                assert u >= 0 and dense[u, v] != 0
                cost += dense[u, v]
                v = u
            assert np.isclose(cost, d[r])

    def test_yen_unweighted_and_unreachable(self):
        from spsparse_tpu.graph import yen
        dense = np.array([[0, 2.0, 0], [0, 0, 5.0], [0, 0, 0]])
        A = SparseCOO.from_dense(dense)
        np.testing.assert_allclose(
            np.asarray(yen(A, 0, 2, 3, unweighted=True)), [2.0])
        assert np.asarray(yen(A, 2, 0, 3)).size == 0

    @pytest.mark.parametrize("directed", [True, False])
    def test_reconstruct_path_vs_scipy(self, directed):
        from spsparse_tpu.graph import reconstruct_path
        A, S, dense = random_graph(31)
        _, pp = cs.shortest_path(S, directed=directed, indices=[0],
                                 return_predecessors=True)
        ref = cs.reconstruct_path(S, pp[0], directed=directed).toarray()
        got = np.asarray(
            reconstruct_path(A, pp[0], directed=directed).to_dense())
        np.testing.assert_allclose(got, ref)

    @pytest.mark.parametrize("directed", [True, False])
    def test_construct_dist_matrix_vs_scipy(self, directed):
        from spsparse_tpu.graph import construct_dist_matrix
        A, S, dense = random_graph(37)
        _, pp = cs.shortest_path(S, directed=directed,
                                 return_predecessors=True)
        ref = cs.construct_dist_matrix(dense, pp, directed=directed)
        got = construct_dist_matrix(A, pp, directed=directed)
        np.testing.assert_allclose(got, ref)

    def test_shape_errors(self):
        from spsparse_tpu.graph import (reconstruct_path,
                                        construct_dist_matrix)
        A, S, dense = random_graph(2)
        with pytest.raises(SpSparseError):
            reconstruct_path(A, np.zeros(3, np.int32))
        with pytest.raises(SpSparseError):
            construct_dist_matrix(A, np.zeros((2, 2), np.int32))

    def test_predecessor_cycle_raises(self):
        # malformed pred matrix with a 2-cycle must raise, not hang
        from spsparse_tpu.graph import construct_dist_matrix
        idx = np.array([[0, 1], [1, 2], [2, 1]])
        A = SparseCOO.from_arrays(idx, np.ones(3), (3, 3))
        pred = np.full((3, 3), NEG_SENTINEL, np.int32)
        pred[0, 1], pred[0, 2] = 2, 1          # 1 <- 2 <- 1 cycle
        with pytest.raises(SpSparseError, match="cycle"):
            construct_dist_matrix(A, pred)


class TestConversions:
    """csgraph_{from,to}_{dense,masked} (scipy _tools parity)."""

    def test_from_to_dense_vs_scipy(self):
        from spsparse_tpu.graph import csgraph_from_dense, csgraph_to_dense
        rng = np.random.default_rng(0)
        n = 8
        D = rng.random((n, n)) * 5
        D[rng.random((n, n)) < 0.5] = 0
        D[rng.random((n, n)) < 0.1] = np.inf     # inf is a non-edge too
        ref = cs.csgraph_from_dense(D, null_value=0)
        got = csgraph_from_dense(D)
        assert ref.nnz == int(np.asarray(got.valid_mask()).sum())
        np.testing.assert_allclose(csgraph_to_dense(got), ref.toarray())
        np.testing.assert_allclose(
            csgraph_to_dense(got, null_value=-7),
            cs.csgraph_to_dense(ref, null_value=-7))

    def test_nonzero_null_value_keeps_explicit_zeros(self):
        from spsparse_tpu.graph import csgraph_from_dense, csgraph_to_dense
        D = np.array([[-1.0, 0.0], [2.0, -1.0]])
        g = csgraph_from_dense(D, null_value=-1)
        assert int(np.asarray(g.valid_mask()).sum()) == 2  # the 0 edge too
        np.testing.assert_allclose(csgraph_to_dense(g, null_value=-1), D)

    def test_masked_roundtrip_vs_scipy(self):
        from spsparse_tpu.graph import (csgraph_from_masked,
                                        csgraph_to_masked)
        rng = np.random.default_rng(1)
        M = np.ma.masked_invalid(
            np.where(rng.random((6, 6)) < 0.4, rng.random((6, 6)), np.nan))
        got = csgraph_from_masked(M)
        ref = cs.csgraph_from_masked(M)
        assert ref.nnz == int(np.asarray(got.valid_mask()).sum())
        back = csgraph_to_masked(got)
        refb = cs.csgraph_to_masked(ref)
        assert (np.ma.getmaskarray(back) == np.ma.getmaskarray(refb)).all()
        assert np.ma.allclose(back, refb)
