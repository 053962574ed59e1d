"""Graph classics: SCC, components, topo sort, MST, Euler, cliques, TSP."""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.sparse.csgraph import (
    connected_components as scipy_cc,
    minimum_spanning_tree as scipy_mst,
)

from ortools_tpu.graph.components import (
    TopologicalSorter,
    bron_kerbosch_cliques,
    connected_components,
    eulerian_path,
    minimum_spanning_tree,
    strongly_connected_components,
)
from ortools_tpu.graph.tsp_paths import (
    christofides_tsp,
    held_karp_tsp,
    one_tree_lower_bound,
)


def test_scc():
    # 0->1->2->0 cycle, 3->4, 2->3
    arcs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    comps = strongly_connected_components(5, arcs)
    sets = [frozenset(c) for c in comps]
    assert frozenset({0, 1, 2}) in sets
    assert frozenset({3}) in sets and frozenset({4}) in sets
    # reverse topological order: {4} before {3} before the cycle
    assert sets.index(frozenset({4})) < sets.index(frozenset({0, 1, 2}))


def test_scc_vs_scipy():
    rng = np.random.default_rng(2)
    n = 40
    arcs = [(int(a), int(b)) for a, b in
            rng.integers(0, n, size=(120, 2))]
    ours = strongly_connected_components(n, arcs)
    mat = sp.csr_matrix(
        (np.ones(len(arcs)), tuple(zip(*arcs))), shape=(n, n)
    )
    ncomp, labels = scipy_cc(mat, connection="strong")
    assert len(ours) == ncomp
    # same partition
    ours_label = {}
    for ci, comp in enumerate(ours):
        for v in comp:
            ours_label[v] = ci
    for a in range(n):
        for b in range(n):
            assert (ours_label[a] == ours_label[b]) == (
                labels[a] == labels[b]
            )


def test_connected_components():
    cc = connected_components(6, [(0, 1), (1, 2), (3, 4)])
    assert cc[0] == cc[1] == cc[2]
    assert cc[3] == cc[4] != cc[0]
    assert cc[5] not in (cc[0], cc[3])


def test_topological_sorter():
    ts = TopologicalSorter()
    ts.add_edge("a", "b")
    ts.add_edge("b", "c")
    ts.add_edge("a", "c")
    order = ts.sort()
    assert order.index("a") < order.index("b") < order.index("c")
    ts.add_edge("c", "a")  # cycle
    assert ts.sort() is None


def test_mst_vs_scipy():
    rng = np.random.default_rng(4)
    n = 25
    pts = rng.uniform(0, 10, (n, 2))
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    edges = [(i, j, float(d[i, j]))
             for i in range(n) for j in range(i + 1, n)]
    chosen = minimum_spanning_tree(n, edges)
    total = sum(edges[k][2] for k in chosen)
    ref = scipy_mst(sp.csr_matrix(np.triu(d))).sum()
    assert abs(total - ref) < 1e-9
    assert len(chosen) == n - 1


def test_eulerian():
    # square with a diagonal doubled: all even degrees -> circuit
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    path = eulerian_path(4, edges)
    assert path is not None and len(path) == 5
    assert path[0] == path[-1]
    # path (2 odd nodes)
    edges2 = [(0, 1), (1, 2)]
    p2 = eulerian_path(3, edges2)
    assert p2 in ([0, 1, 2], [2, 1, 0])
    # impossible (4 odd nodes)
    assert eulerian_path(4, [(0, 1), (2, 3)]) is None


def test_bron_kerbosch():
    # triangle 0-1-2 plus edge 2-3
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    cliques = bron_kerbosch_cliques(4, edges)
    assert sorted(map(tuple, cliques)) == [(0, 1, 2), (2, 3)]


def test_held_karp_exact():
    rng = np.random.default_rng(1)
    n = 9
    pts = rng.uniform(0, 100, (n, 2))
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    cost, tour = held_karp_tsp(d)
    assert sorted(tour) == list(range(n))
    # verify via brute force
    import itertools
    best = min(
        sum(d[a, b] for a, b in zip((0,) + p, p + (0,)))
        for p in itertools.permutations(range(1, n))
    )
    assert abs(cost - best) < 1e-9


def test_christofides_quality_and_one_tree_bound():
    rng = np.random.default_rng(8)
    n = 12
    pts = rng.uniform(0, 100, (n, 2))
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    opt, _ = held_karp_tsp(d)
    cost, tour = christofides_tsp(d)
    assert sorted(tour) == list(range(n))
    assert cost <= 1.5 * opt + 1e-9
    lb = one_tree_lower_bound(d)
    assert lb <= opt + 1e-6
    assert lb >= 0.5 * opt  # sane bound quality


def test_blossom_max_cardinality():
    """Edmonds blossom handles odd cycles (where greedy/bipartite fail)."""
    from ortools_tpu.graph.matching import max_cardinality_matching
    # triangle + pendant: perfect matching of size 2
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    mate = max_cardinality_matching(4, edges)
    assert sum(1 for v in mate if v >= 0) == 4
    # Petersen graph has a perfect matching
    outer = [(i, (i + 1) % 5) for i in range(5)]
    inner = [(5 + i, 5 + (i + 2) % 5) for i in range(5)]
    spokes = [(i, 5 + i) for i in range(5)]
    mate = max_cardinality_matching(10, outer + inner + spokes)
    assert all(v >= 0 for v in mate)
    # odd component: one vertex stays unmatched
    mate = max_cardinality_matching(3, [(0, 1), (1, 2), (2, 0)])
    assert sum(1 for v in mate if v >= 0) == 2


def test_min_weight_perfect_matching_exact():
    from ortools_tpu.graph.matching import min_weight_perfect_matching
    import itertools
    rng = np.random.default_rng(5)
    pts = rng.random((8, 2))
    dist = np.linalg.norm(pts[:, None] - pts[None, :], axis=2)
    pairs = min_weight_perfect_matching(dist)
    assert len(pairs) == 4
    cost = sum(dist[a, b] for a, b in pairs)
    # brute force all perfect matchings of 8 nodes
    def all_matchings(nodes):
        if not nodes:
            yield []
            return
        a = nodes[0]
        for i in range(1, len(nodes)):
            b = nodes[i]
            rest = nodes[1:i] + nodes[i+1:]
            for m in all_matchings(rest):
                yield [(a, b)] + m
    best = min(sum(dist[a, b] for a, b in m)
               for m in all_matchings(list(range(8))))
    assert abs(cost - best) <= 1e-6
