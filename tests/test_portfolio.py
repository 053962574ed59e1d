"""Interleaved portfolio tests (num_workers > 1, determinism contract)."""

import numpy as np
import pytest

from ortools_tpu.sat import CpModel, CpSolver, INFEASIBLE, OPTIMAL


def knapsack_model(n=14, seed=0):
    rng = np.random.default_rng(seed)
    m = CpModel()
    xs = [m.new_bool_var(f"x{i}") for i in range(n)]
    w = rng.integers(1, 20, n)
    v = rng.integers(1, 30, n)
    cap = int(w.sum() * 0.4)
    m.add(sum(int(wi) * x for wi, x in zip(w, xs)) <= cap)
    m.maximize(sum(int(vi) * x for vi, x in zip(v, xs)))
    return m, xs


def test_portfolio_optimization_matches_single_worker():
    m, _ = knapsack_model()
    s1 = CpSolver()
    assert s1.solve(m) == OPTIMAL
    m2, _ = knapsack_model()
    s8 = CpSolver()
    s8.parameters.num_workers = 8
    assert s8.solve(m2) == OPTIMAL
    assert s8.objective_value == s1.objective_value


def test_portfolio_deterministic():
    objs = []
    branches = []
    for _ in range(2):
        m, _ = knapsack_model(seed=5)
        s = CpSolver()
        s.parameters.num_workers = 4
        assert s.solve(m) == OPTIMAL
        objs.append(s.objective_value)
        branches.append(s.num_branches)
    assert objs[0] == objs[1]
    assert branches[0] == branches[1]  # deterministic interleave


def test_portfolio_satisfaction():
    m = CpModel()
    q = [m.new_int_var(0, 7, f"q{i}") for i in range(8)]
    m.add_all_different(q)
    m.add_all_different([q[i] + i for i in range(8)])
    m.add_all_different([q[i] - i for i in range(8)])
    s = CpSolver()
    s.parameters.num_workers = 4
    assert s.solve(m) == OPTIMAL
    vals = [s.value(x) for x in q]
    assert sorted(vals) == list(range(8))


def test_portfolio_infeasible():
    m = CpModel()
    x = m.new_int_var(0, 3, "x")
    m.add(x >= 2)
    m.add(x <= 1)
    s = CpSolver()
    s.parameters.num_workers = 4
    assert s.solve(m) == INFEASIBLE


def test_portfolio_with_optimization_and_hint():
    m, xs = knapsack_model(seed=7)
    # hint: empty knapsack (feasible)
    for x in xs:
        m.add_hint(x, 0)
    s = CpSolver()
    s.parameters.num_workers = 3
    assert s.solve(m) == OPTIMAL


def test_parallel_portfolio_optimizes():
    """Process-parallel portfolio (interleave_search=False) reaches the
    same optimum as the deterministic one."""
    m, _ = knapsack_model(seed=5)
    s1 = CpSolver()
    s1.parameters.num_workers = 4
    assert s1.solve(m) == OPTIMAL
    m2, _ = knapsack_model(seed=5)
    s2 = CpSolver()
    s2.parameters.num_workers = 4
    s2.parameters.interleave_search = False
    assert s2.solve(m2) == OPTIMAL
    assert s1.objective_value == s2.objective_value


def test_parallel_portfolio_infeasible():
    m = CpModel()
    x = m.new_int_var(0, 5, "x")
    y = m.new_int_var(0, 5, "y")
    m.add(x + y >= 20)
    s = CpSolver()
    s.parameters.num_workers = 3
    s.parameters.interleave_search = False
    assert s.solve(m) == INFEASIBLE


def test_lns_generators_cover_model():
    from ortools_tpu.sat.portfolio import (
        _lns_random_constraints, _lns_time_window, _lns_variable_graph)
    import random
    m, _ = knapsack_model(seed=7)
    from ortools_tpu.sat import expand
    work = expand.expand_model(m.ir)
    rng = random.Random(0)
    nvars = len(work.variables)
    best = [v.domain.min() for v in work.variables]
    for gen in (_lns_random_constraints, _lns_variable_graph):
        relax = gen(work, rng, 0.3)
        assert 0 < len(relax) <= nvars
        assert all(0 <= v < nvars for v in relax)
    relax = _lns_time_window(work, rng, 0.3, best)
    assert 0 < len(relax) <= nvars
