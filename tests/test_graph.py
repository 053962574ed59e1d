"""Graph algorithms (native C++ core) vs scipy oracles."""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import linear_sum_assignment
from scipy.sparse.csgraph import dijkstra as scipy_dijkstra, maximum_flow

from ortools_tpu.graph import (
    LinearSumAssignment,
    SimpleMaxFlow,
    SimpleMinCostFlow,
    dijkstra_shortest_path,
)
from ortools_tpu.graph.shortest_paths import bellman_ford


def test_max_flow_small():
    # classic example: value 60
    mf = SimpleMaxFlow()
    start = [0, 0, 0, 1, 1, 2, 2, 3, 3]
    end = [1, 2, 3, 2, 4, 3, 4, 2, 4]
    caps = [20, 30, 10, 40, 30, 10, 20, 5, 20]
    for s, e, c in zip(start, end, caps):
        mf.add_arc_with_capacity(s, e, c)
    assert mf.solve(0, 4) == SimpleMaxFlow.OPTIMAL
    assert mf.optimal_flow() == 60
    # flow conservation at interior nodes
    for node in (1, 2, 3):
        inflow = sum(mf.flow(a) for a in range(mf.num_arcs)
                     if mf.head(a) == node)
        outflow = sum(mf.flow(a) for a in range(mf.num_arcs)
                      if mf.tail(a) == node)
        assert inflow == outflow


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_max_flow_random_vs_scipy(seed):
    rng = np.random.default_rng(seed)
    n = 30
    density = 0.15
    a = (sp.random(n, n, density=density,
                   random_state=np.random.RandomState(seed)) * 50)
    a = sp.csr_matrix(a.astype(np.int64))
    a.setdiag(0)
    a.eliminate_zeros()
    ref = maximum_flow(a, 0, n - 1).flow_value
    mf = SimpleMaxFlow()
    coo = a.tocoo()
    for t, h, c in zip(coo.row, coo.col, coo.data):
        mf.add_arc_with_capacity(int(t), int(h), int(c))
    mf.solve(0, n - 1)
    assert mf.optimal_flow() == ref


def test_min_cost_flow_example():
    # transportation example with known optimum
    mcf = SimpleMinCostFlow()
    start = [0, 0, 1, 1, 1, 2, 2, 3, 4]
    end = [1, 2, 2, 3, 4, 3, 4, 4, 2]
    caps = [15, 8, 20, 4, 10, 15, 4, 20, 5]
    costs = [4, 4, 2, 2, 6, 1, 3, 2, 3]
    for s, e, c, w in zip(start, end, caps, costs):
        mcf.add_arc_with_capacity_and_unit_cost(s, e, c, w)
    mcf.set_node_supply(0, 20)
    mcf.set_node_supply(3, -5)
    mcf.set_node_supply(4, -15)
    assert mcf.solve() == SimpleMinCostFlow.OPTIMAL
    assert mcf.optimal_cost() == 150
    # supplies balanced by flows
    for node, sup in ((0, 20), (3, -5), (4, -15), (1, 0), (2, 0)):
        out = sum(mcf.flow(a) for a in range(mcf.num_arcs)
                  if mcf.tail(a) == node)
        inn = sum(mcf.flow(a) for a in range(mcf.num_arcs)
                  if mcf.head(a) == node)
        assert out - inn == sup


def test_min_cost_flow_infeasible_and_unbalanced():
    mcf = SimpleMinCostFlow()
    mcf.add_arc_with_capacity_and_unit_cost(0, 1, 1, 1)
    mcf.set_node_supply(0, 5)
    mcf.set_node_supply(1, -5)
    assert mcf.solve() == SimpleMinCostFlow.INFEASIBLE  # capacity too small
    mcf2 = SimpleMinCostFlow()
    mcf2.add_arc_with_capacity_and_unit_cost(0, 1, 10, 1)
    mcf2.set_node_supply(0, 5)
    assert mcf2.solve() == SimpleMinCostFlow.UNBALANCED


def test_min_cost_flow_vs_lp():
    # random MCF checked against our own LP solver (glop)
    rng = np.random.default_rng(5)
    n, m = 8, 20
    tails = rng.integers(0, n, m)
    heads = (tails + 1 + rng.integers(0, n - 1, m)) % n
    caps = rng.integers(1, 20, m)
    costs = rng.integers(1, 10, m)
    mcf = SimpleMinCostFlow()
    for t, h, c, w in zip(tails, heads, caps, costs):
        mcf.add_arc_with_capacity_and_unit_cost(int(t), int(h), int(c), int(w))
    mcf.set_node_supply(0, 5)
    mcf.set_node_supply(n - 1, -5)
    status = mcf.solve()
    # LP formulation
    from ortools_tpu.glop import solve as glop_solve
    from ortools_tpu.models.lp import QuadraticProgram
    inc = np.zeros((n, m))
    for a, (t, h) in enumerate(zip(tails, heads)):
        inc[t, a] += 1.0
        inc[h, a] -= 1.0
    supply = np.zeros(n)
    supply[0] = 5
    supply[n - 1] = -5
    qp = QuadraticProgram(
        objective_vector=costs.astype(float),
        constraint_matrix=sp.csr_matrix(inc),
        constraint_lower=supply, constraint_upper=supply,
        variable_lower=np.zeros(m), variable_upper=caps.astype(float),
    )
    lp = glop_solve(qp)
    from ortools_tpu.utils.status import MPSolverStatus
    if lp.status == MPSolverStatus.OPTIMAL:
        assert status == SimpleMinCostFlow.OPTIMAL
        assert mcf.optimal_cost() == round(lp.objective_value)
    else:
        assert status == SimpleMinCostFlow.INFEASIBLE


def test_dijkstra():
    #     0 -1- 1 -1- 2
    #      \----5----/
    tails = [0, 1, 0]
    heads = [1, 2, 2]
    lens = [1.0, 1.0, 5.0]
    dist, parent, path = dijkstra_shortest_path(3, tails, heads, lens, 0, 2)
    assert dist[2] == 2.0
    assert path == [0, 1, 2]


def test_dijkstra_vs_scipy():
    rng = np.random.default_rng(9)
    n = 50
    g = sp.random(n, n, density=0.1, random_state=np.random.RandomState(4))
    g = sp.csr_matrix(g)
    coo = g.tocoo()
    dist, _, _ = dijkstra_shortest_path(
        n, coo.row.tolist(), coo.col.tolist(), coo.data.tolist(), 0
    )
    ref = scipy_dijkstra(g, indices=0)
    np.testing.assert_allclose(dist, ref, rtol=1e-12)


def test_bellman_ford_negative():
    tails = [0, 1, 0]
    heads = [1, 2, 2]
    lens = [2.0, -1.0, 3.0]
    dist, neg = bellman_ford(3, tails, heads, lens, 0)
    assert not neg
    assert dist[2] == 1.0
    # negative cycle
    dist, neg = bellman_ford(2, [0, 1], [1, 0], [1.0, -2.0], 0)
    assert neg


@pytest.mark.parametrize("seed,nr,nc", [(0, 10, 10), (1, 8, 12), (2, 20, 20)])
def test_hungarian_vs_scipy(seed, nr, nc):
    rng = np.random.default_rng(seed)
    c = rng.uniform(0, 100, size=(nr, nc))
    from ortools_tpu.graph.assignment import hungarian
    assign, total = hungarian(c)
    r, col = linear_sum_assignment(c)
    assert len(set(assign.tolist())) == nr  # distinct columns
    np.testing.assert_allclose(total, c[r, col].sum(), rtol=1e-12)


def test_linear_sum_assignment_api():
    lsa = LinearSumAssignment()
    costs = [[90, 76, 75, 70], [35, 85, 55, 65],
             [125, 95, 90, 105], [45, 110, 95, 115]]
    for w in range(4):
        for t in range(4):
            lsa.add_arc_with_cost(w, t, costs[w][t])
    assert lsa.solve() == LinearSumAssignment.OPTIMAL
    assert lsa.optimal_cost() == 265
    mates = [lsa.right_mate(w) for w in range(4)]
    assert sorted(mates) == [0, 1, 2, 3]


def test_assignment_infeasible():
    lsa = LinearSumAssignment()
    lsa.add_arc_with_cost(0, 0, 1)
    lsa.add_arc_with_cost(1, 0, 2)  # two lefts, one right
    assert lsa.solve() == LinearSumAssignment.INFEASIBLE


def test_blossom_matches_bruteforce_random():
    import itertools

    import numpy as np

    from ortools_tpu.graph.blossom import (
        max_weight_matching, min_weight_perfect_matching_blossom)

    rng = np.random.default_rng(11)
    for _ in range(40):
        k = int(rng.choice([4, 6, 8]))
        d = rng.integers(1, 40, (k, k)).astype(float)
        d = (d + d.T) / 2
        np.fill_diagonal(d, 0.0)
        pairs = min_weight_perfect_matching_blossom(d, list(range(k)))
        cost = sum(d[a, b] for a, b in pairs)

        def brute(avail):
            if not avail:
                return 0.0
            v = avail[0]
            return min(d[v, u] + brute([x for x in avail[1:] if x != u])
                       for u in avail[1:])

        assert abs(cost - brute(list(range(k)))) < 1e-9

    # sparse max-weight (non-perfect) mode — weights include negatives
    # (all-negative graphs must return the empty matching, weight 0)
    import random
    random.seed(3)
    for _ in range(60):
        n = random.randint(2, 7)
        edges = [(i, j, random.randint(-10, 15))
                 for i in range(n) for j in range(i + 1, n)
                 if random.random() < 0.6]
        if not edges:
            continue
        mate = max_weight_matching(n, edges)
        ws = {(i, j): w for i, j, w in edges}
        got = sum(ws[(v, u)] for v in range(n)
                  for u in [mate[v]] if u > v and (v, u) in ws)
        best = 0
        ed = list(ws.items())
        for r in range(len(ed) + 1):
            for comb in itertools.combinations(ed, r):
                vs = [v for (e, _) in comb for v in e]
                if len(vs) == len(set(vs)):
                    best = max(best, sum(w for _, w in comb))
        assert got == best, (n, edges, mate)


def test_christofides_uses_exact_matching():
    import numpy as np

    from ortools_tpu.graph.matching import min_weight_perfect_matching

    rng = np.random.default_rng(5)
    pts = rng.standard_normal((40, 2))
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=2)
    pairs = min_weight_perfect_matching(d)
    used = [v for p in pairs for v in p]
    assert sorted(used) == list(range(40))
