"""Root LP-relaxation propagator (sat/lp_propagator.py).

Verifies: extraction is a valid relaxation (bound vs scipy HiGHS on the
same rows), infeasibility proofs, reduced-cost strengthening soundness,
and the solve-path integration (optimal values unchanged with the
propagator on, LP bound early-stops the descent).
"""

import math

import numpy as np
import pytest
from scipy.optimize import Bounds, LinearConstraint, linprog, milp

from ortools_tpu.sat import CpModel, CpSolver, INFEASIBLE, OPTIMAL
from ortools_tpu.sat import model_ir as ir
from ortools_tpu.sat.expand import expand_model
from ortools_tpu.sat.lp_propagator import (
    extract_relaxation,
    reduced_cost_tightenings,
    root_lp_relaxation,
)


def knapsack_model(n=14, seed=0):
    rng = np.random.default_rng(seed)
    m = CpModel()
    xs = [m.new_bool_var(f"x{i}") for i in range(n)]
    w = rng.integers(1, 20, n)
    v = rng.integers(1, 30, n)
    cap = int(w.sum() * 0.4)
    m.add(sum(int(wi) * x for wi, x in zip(w, xs)) <= cap)
    m.maximize(sum(int(vi) * x for vi, x in zip(v, xs)))
    return m, (w, v, cap)


def test_extraction_matches_scipy_lp_bound():
    m, (w, v, cap) = knapsack_model()
    work = expand_model(m.ir)
    ext = extract_relaxation(work)
    assert ext is not None and ext != "infeasible"
    a, rl, ru, vl, vu, covered = ext
    assert covered >= 1
    # internal sense: minimize -v.x  (maximization model)
    info = root_lp_relaxation(work, m.ir.objective, sense=-1, cut_rounds=0)
    assert info is not None and not info.infeasible
    res = linprog(-v.astype(float),
                  A_ub=a.toarray(), b_ub=ru,
                  bounds=list(zip(vl, vu)), method="highs")
    assert res.status == 0
    assert info.lp_objective == pytest.approx(res.fun, abs=1e-6)


def test_bound_is_valid_and_cuts_tighten():
    m, (w, v, cap) = knapsack_model(seed=3)
    work = expand_model(m.ir)
    plain = root_lp_relaxation(work, m.ir.objective, sense=-1, cut_rounds=0)
    cut = root_lp_relaxation(work, m.ir.objective, sense=-1, cut_rounds=3)
    # integer optimum via scipy milp
    res = milp(-v.astype(float),
               constraints=LinearConstraint(
                   w.reshape(1, -1).astype(float), -np.inf, float(cap)),
               bounds=Bounds(np.zeros(len(v)), np.ones(len(v))),
               integrality=np.ones(len(v)))
    opt_internal = res.fun  # min -v.x over integers
    # relaxation bound never exceeds the integer optimum
    assert plain.lp_objective <= opt_internal + 1e-9
    assert cut.int_bound <= math.ceil(opt_internal - 1e-6) + 0
    # cuts only ever tighten
    assert cut.lp_objective >= plain.lp_objective - 1e-9


def test_lp_detects_infeasible_linear_system():
    m = CpModel()
    x = m.new_int_var(0, 5, "x")
    y = m.new_int_var(0, 5, "y")
    m.add(x + y >= 12)  # impossible in the box
    m.minimize(x)
    s = CpSolver()
    assert s.solve(m) == INFEASIBLE


def test_reduced_cost_tightenings_preserve_optimum():
    m, (w, v, cap) = knapsack_model(seed=7)
    work = expand_model(m.ir)
    info = root_lp_relaxation(work, m.ir.objective, sense=-1)
    res = milp(-v.astype(float),
               constraints=LinearConstraint(
                   w.reshape(1, -1).astype(float), -np.inf, float(cap)),
               bounds=Bounds(np.zeros(len(v)), np.ones(len(v))),
               integrality=np.ones(len(v)))
    opt_internal = int(round(res.fun))
    x_opt = np.round(res.x).astype(int)
    # cutoff one unit better than optimal: the optimum itself must
    # survive every tightening (it is the only solution <= cutoff... none
    # are, but tightenings at cutoff=opt must keep x_opt feasible)
    for var, nlo, nhi in reduced_cost_tightenings(info, opt_internal):
        if nlo is not None:
            assert x_opt[var] >= nlo
        if nhi is not None:
            assert x_opt[var] <= nhi


def test_solve_with_lp_relaxation_matches_without():
    for seed in (0, 3, 11):
        m1, _ = knapsack_model(seed=seed)
        s_on = CpSolver()
        s_on.parameters.use_lp_relaxation = True
        assert s_on.solve(m1) == OPTIMAL
        m2, _ = knapsack_model(seed=seed)
        s_off = CpSolver()
        s_off.parameters.use_lp_relaxation = False
        assert s_off.solve(m2) == OPTIMAL
        assert s_on.objective_value == s_off.objective_value


def test_lp_relaxation_with_objective_offset():
    m = CpModel()
    xs = [m.new_bool_var(f"x{i}") for i in range(6)]
    m.add(sum(xs) >= 2)
    # offset through an affine objective
    m.minimize(sum((i + 1) * x for i, x in zip(range(6), xs)) + 10)
    s = CpSolver()
    s.parameters.use_lp_relaxation = True
    assert s.solve(m) == OPTIMAL
    # cheapest two variables: 1 + 2 + 10
    assert s.objective_value == 13
    assert s.best_objective_bound == 13


def test_lin_max_rows_relax_correctly():
    """lin_max contributes target >= expr rows (hull relaxation)."""
    m = CpModel()
    a = m.new_int_var(0, 10, "a")
    b = m.new_int_var(0, 10, "b")
    t = m.new_int_var(0, 20, "t")
    m.add_max_equality(t, [a + 2, b + 5])
    m.add(a + b >= 6)
    m.minimize(t)
    work = expand_model(m.ir)
    info = root_lp_relaxation(work, m.ir.objective, sense=1)
    assert info is not None and not info.infeasible
    # LP: minimize t s.t. t >= a+2, t >= b+5, a+b >= 6, boxes.
    # Balancing both arms: a = b+3, a+b = 6 -> b = 1.5, t = 6.5.
    assert info.lp_objective == pytest.approx(6.5, abs=1e-6)
    # integer optimum: a=4, b=2 -> t = max(6, 7) = 7
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.objective_value == 7


def test_node_lp_propagator_prunes_and_tightens():
    import math

    from ortools_tpu.sat import model_ir as ir
    from ortools_tpu.sat.cp_model import CpModel
    from ortools_tpu.sat.lp_propagator import NodeLpPropagator

    m = CpModel()
    xs = [m.new_int_var(0, 10, f"x{i}") for i in range(5)]
    m.add(sum(xs) <= 20)
    m.minimize(sum((i + 1) * x for i, x in enumerate(xs)))
    obj = m.ir.objective
    prop = NodeLpPropagator(m.ir, obj, sense=1)
    assert prop.ok
    from ortools_tpu.sat.engine import Engine

    e = Engine(m.ir)
    doms = e.initial_domains()
    # with cutoff -1 (< LP bound 0) the node must prune
    out = prop.propagate(doms, cutoff=-1, deadline=math.inf)
    assert out == "infeasible"
    # generous cutoff: no prune; rc tightenings are valid domain cuts
    out = prop.propagate(doms, cutoff=5, deadline=math.inf)
    assert out != "infeasible" and out is not None
    for v, nlo, nhi in out:
        assert 0 <= v < 5


def test_node_lp_inside_engine_search_preserves_optimum():
    from ortools_tpu.sat import CpModel, CpSolver, OPTIMAL

    m = CpModel()
    xs = [m.new_int_var(0, 6, f"x{i}") for i in range(6)]
    for i in range(5):
        m.add(xs[i] + xs[i + 1] <= 8)
    m.add(sum(xs) >= 12)
    m.minimize(sum((i % 2 + 1) * x for i, x in enumerate(xs)))
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    # brute-force via DP over the chain with the >= 12 coupling is
    # awkward; instead verify against the MIP backend
    from ortools_tpu.linear_solver.model_builder import Model, Solver

    mb = Model()
    ys = [mb.new_int_var(0, 6) for _ in range(6)]
    for i in range(5):
        mb.add(ys[i] + ys[i + 1] <= 8)
    mb.add(sum(ys[i] for i in range(6)) >= 12)
    mb.minimize(sum((i % 2 + 1) * ys[i] for i in range(6)))
    ms = Solver("mip")
    ms.solve(mb)
    assert abs(s.objective_value - ms.objective_value) < 1e-6


def test_scheduling_energy_rows_valid_and_tight():
    """Completion-time energy rows (reference sat/scheduling_cuts.cc):
    valid for every feasible schedule (brute-forced) and tight for a
    packed single-machine instance."""
    import itertools

    import numpy as np

    from ortools_tpu.sat.cp_model import CpModel
    from ortools_tpu.sat.lp_propagator import extract_relaxation

    rng = np.random.default_rng(0)
    for trial in range(10):
        n = int(rng.integers(2, 5))
        durs = rng.integers(1, 6, size=n)
        rel = rng.integers(0, 4, size=n)
        m = CpModel()
        ivs, ss = [], []
        h = int(durs.sum() + rel.max() + 5)
        for i in range(n):
            s = m.new_int_var(int(rel[i]), h, f"s{i}")
            ss.append(s)
            ivs.append(m.new_interval_var(s, int(durs[i]),
                                          s + int(durs[i])))
        m.add_no_overlap(ivs)
        a, rl, _ru, _vl, _vu, _cov = extract_relaxation(m.ir)
        arow = a.toarray()[-1]
        lo = rl[-1]
        for perm in itertools.permutations(range(n)):
            t = 0
            sched = [0] * n
            for i in perm:
                sched[i] = max(t, int(rel[i]))
                t = sched[i] + int(durs[i])
            x = np.zeros(a.shape[1])
            for i, s in enumerate(ss):
                x[s.index] = sched[i]
            assert arow @ x >= lo - 1e-9

    # tightness: releases 0, the greedy packing attains the bound
    m = CpModel()
    durs = [3, 2, 4]
    ivs, ss = [], []
    for i, d in enumerate(durs):
        s = m.new_int_var(0, 20, f"s{i}")
        ss.append(s)
        ivs.append(m.new_interval_var(s, d, s + d))
    m.add_no_overlap(ivs)
    a, rl, *_ = extract_relaxation(m.ir)
    arow = a.toarray()[-1]
    d_tot = sum(durs)
    expected = (d_tot * d_tot - sum(d * d for d in durs)) / 2.0
    assert rl[-1] == expected
    # schedule in the order 0,1,2: starts 0,3,5
    x = np.zeros(a.shape[1])
    for s, st in zip(ss, (0, 3, 5)):
        x[s.index] = st
    # some order attains equality for unit-interchangeable weights
    best = min(
        sum(w * s for w, s in zip(
            durs, _starts_for(perm, durs)))
        for perm in itertools.permutations(range(3)))
    assert abs(best - expected) < 1e-9


def _starts_for(perm, durs):
    t = 0
    starts = [0] * len(durs)
    for i in perm:
        starts[i] = t
        t += durs[i]
    return starts
