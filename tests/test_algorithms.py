"""Knapsack + set cover tests (DP vs B&B vs brute force vs MIP oracles)."""

import numpy as np
import pytest

from ortools_tpu.algorithms import KnapsackSolver, SetCoverModel, greedy_set_cover
from ortools_tpu.algorithms.knapsack import dp_knapsack_jax
from ortools_tpu.algorithms.set_cover import solve_set_cover_mip


def classic_instance():
    values = [360, 83, 59, 130, 431, 67, 230, 52, 93, 125, 670, 892, 600,
              38, 48, 147, 78, 256, 63, 17]
    weights = [[7, 0, 30, 22, 80, 94, 11, 81, 70, 64, 59, 18, 0, 36, 3, 8,
                15, 42, 9, 0]]
    capacities = [257]
    return values, weights, capacities


def test_branch_and_bound_classic():
    v, w, c = classic_instance()
    s = KnapsackSolver(
        KnapsackSolver.KNAPSACK_MULTIDIMENSION_BRANCH_AND_BOUND_SOLVER
    )
    s.init(v, w, c)
    value = s.solve()
    total_w = sum(w[0][i] for i in range(len(v))
                  if s.best_solution_contains(i))
    assert total_w <= c[0]
    # oracle: scipy milp
    from scipy.optimize import Bounds, LinearConstraint as SciLin, milp
    ref = milp(-np.asarray(v, dtype=float),
               constraints=SciLin(np.asarray(w, dtype=float), -np.inf, c),
               bounds=Bounds(0, 1), integrality=np.ones(len(v)))
    assert value == int(round(-ref.fun))
    # DP agrees
    dp = KnapsackSolver(KnapsackSolver.KNAPSACK_DYNAMIC_PROGRAMMING_SOLVER)
    dp.init(v, w, c)
    assert dp.solve() == value


def test_dp_matches_bb():
    rng = np.random.default_rng(3)
    for seed in range(4):
        rng = np.random.default_rng(seed)
        n = 14
        v = rng.integers(1, 100, n).tolist()
        w = [rng.integers(1, 30, n).tolist()]
        c = [int(sum(w[0]) * 0.4)]
        dp = KnapsackSolver(KnapsackSolver.KNAPSACK_DYNAMIC_PROGRAMMING_SOLVER)
        dp.init(v, w, c)
        bb = KnapsackSolver(
            KnapsackSolver.KNAPSACK_MULTIDIMENSION_BRANCH_AND_BOUND_SOLVER
        )
        bb.init(v, w, c)
        bf = KnapsackSolver(KnapsackSolver.KNAPSACK_BRUTE_FORCE_SOLVER)
        bf.init(v, w, c)
        assert dp.solve() == bb.solve() == bf.solve(), seed
        # DP solution must be consistent with its claimed value
        val = sum(v[i] for i in range(n) if dp.best_solution_contains(i))
        wt = sum(w[0][i] for i in range(n) if dp.best_solution_contains(i))
        assert val == dp.solve() and wt <= c[0]


def test_dp_jax_value():
    v = [10, 40, 30, 50]
    w = [5, 4, 6, 3]
    assert dp_knapsack_jax(v, w, 10) == 90  # items 1 and 3


def test_multidimensional_mip():
    v = [10, 40, 30, 50, 35, 25]
    w = [[5, 4, 6, 3, 2, 4], [1, 3, 2, 4, 3, 1]]
    c = [10, 6]
    s = KnapsackSolver(
        KnapsackSolver.KNAPSACK_MULTIDIMENSION_CBC_MIP_SOLVER
    )
    s.init(v, w, c)
    value = s.solve()
    sel = [i for i in range(6) if s.best_solution_contains(i)]
    assert sum(w[0][i] for i in sel) <= c[0]
    assert sum(w[1][i] for i in sel) <= c[1]
    assert value == sum(v[i] for i in sel)
    # brute force oracle
    best = 0
    for mask in range(64):
        pick = [i for i in range(6) if mask >> i & 1]
        if sum(w[0][i] for i in pick) <= c[0] and \
           sum(w[1][i] for i in pick) <= c[1]:
            best = max(best, sum(v[i] for i in pick))
    assert value == best


def test_set_cover_greedy_and_exact():
    m = SetCoverModel()
    # universe {0..4}
    m.add_empty_subset(1.0)
    for e in (0, 1):
        m.add_element_to_last_subset(e)
    m.add_empty_subset(1.0)
    for e in (1, 2, 3):
        m.add_element_to_last_subset(e)
    m.add_empty_subset(1.0)
    for e in (3, 4):
        m.add_element_to_last_subset(e)
    m.add_empty_subset(2.5)
    for e in (0, 1, 2, 3, 4):
        m.add_element_to_last_subset(e)
    g = greedy_set_cover(m)
    assert g is not None
    covered = set()
    for j in g:
        covered |= set(m.subsets[j])
    assert covered == {0, 1, 2, 3, 4}
    exact = solve_set_cover_mip(m)
    cost = sum(m.costs[j] for j in exact)
    assert cost <= sum(m.costs[j] for j in g) + 1e-9
    assert cost == 2.5 or cost == 3.0  # subsets {0,1,2} cost 3 vs big 2.5


def test_set_cover_uncoverable():
    m = SetCoverModel()
    m.add_empty_subset(1.0)
    m.add_element_to_last_subset(0)
    # element 1 appears in no subset but is in the universe via subset 2
    m.add_empty_subset(1.0)
    m.add_element_to_last_subset(3)
    # universe = {0,..,3}; elements 1,2 uncoverable
    assert greedy_set_cover(m) is None
