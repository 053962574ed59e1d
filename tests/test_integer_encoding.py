"""Eager integer order-encoding onto the CDCL core (sat/integer_encoding).

Reference parity target: the integer-literal encoding of
``ortools/sat/integer.h`` + ``cp_model_loader.cc`` (done eagerly).  Every
solver answer is cross-checked against the propagation engine or an
independent brute force.
"""

import itertools
import random

import pytest

from ortools_tpu.sat import model_ir as ir
from ortools_tpu.sat.cp_model import CpModel, CpSolver
from ortools_tpu.sat.integer_encoding import encode_model, solve_integer_cdcl
from ortools_tpu.utils.status import SolveStatus


def _solve_both(model: CpModel, tlim=30.0):
    s1 = CpSolver()
    s1.parameters.use_integer_cdcl = True
    s1.parameters.max_time_in_seconds = tlim
    st1 = s1.solve(model)
    s2 = CpSolver()
    s2.parameters.use_integer_cdcl = False
    s2.parameters.max_time_in_seconds = tlim
    st2 = s2.solve(model)
    return (st1, s1), (st2, s2)


def test_linear_integer_optimization_matches_engine():
    m = CpModel()
    y = [m.new_int_var(0, 6, f"y{i}") for i in range(6)]
    w = [3, 5, 7, 2, 9, 4]
    v = [4, 7, 9, 2, 10, 5]
    m.add(sum(wi * yi for wi, yi in zip(w, y)) <= 40)
    m.add(y[0] + 2 * y[1] - y[2] == 4)
    m.maximize(sum(vi * yi for vi, yi in zip(v, y)))
    (st1, s1), (st2, s2) = _solve_both(m)
    assert st1 == SolveStatus.OPTIMAL
    assert st2 == SolveStatus.OPTIMAL
    assert s1.objective_value == s2.objective_value


def test_infeasible_linear():
    m = CpModel()
    a = m.new_int_var(0, 5, "a")
    b = m.new_int_var(0, 5, "b")
    m.add(a + b >= 9)
    m.add(a + b <= 3)
    s = CpSolver()
    assert s.solve(m) == SolveStatus.INFEASIBLE


def test_enforcement_literal_linear():
    m = CpModel()
    a = m.new_int_var(0, 10, "a")
    lit = m.new_bool_var("lit")
    m.add(a >= 7).only_enforce_if(lit)
    m.add(a <= 3).only_enforce_if(lit.negated())
    m.add(a != 2)
    m.minimize(-a)  # maximize a -> lit true, a = 10
    s = CpSolver()
    assert s.solve(m) == SolveStatus.OPTIMAL
    assert s.value(a) == 10
    assert s.value(lit) == 1


def test_domain_holes_respected():
    m = CpModel()
    from ortools_tpu.utils.domain import Domain
    a = m.new_int_var_from_domain(
        Domain.from_intervals([(0, 2), (7, 9)]), "a")
    b = m.new_int_var(0, 20, "b")
    m.add(a + b == 11)
    m.minimize(b)
    s = CpSolver()
    assert s.solve(m) == SolveStatus.OPTIMAL
    assert s.value(a) == 9 and s.value(b) == 2


def test_all_different_affine():
    # n-queens feasibility at n=8 through the encoder
    m = CpModel()
    n = 8
    q = [m.new_int_var(0, n - 1, f"q{i}") for i in range(n)]
    m.add_all_different(q)
    m.add_all_different([q[i] + i for i in range(n)])
    m.add_all_different([q[i] - i for i in range(n)])
    s = CpSolver()
    st = s.solve(m)
    assert st == SolveStatus.OPTIMAL
    vals = [s.value(x) for x in q]
    assert len(set(vals)) == n
    assert len({v + i for i, v in enumerate(vals)}) == n
    assert len({v - i for i, v in enumerate(vals)}) == n


def test_lin_max_and_element():
    m = CpModel()
    xs = [m.new_int_var(0, 9, f"x{i}") for i in range(3)]
    t = m.new_int_var(0, 30, "t")
    m.add_max_equality(t, [xs[0] + 2, xs[1], 3 * xs[2]])
    idx = m.new_int_var(0, 2, "idx")
    tgt = m.new_int_var(0, 9, "tgt")
    m.add_element(idx, xs, tgt)
    m.add(tgt == 5)
    m.add(idx == 1)
    m.minimize(t)
    s = CpSolver()
    assert s.solve(m) == SolveStatus.OPTIMAL
    assert s.value(xs[1]) == 5
    # t = max(x0+2, 5, 3*x2) minimized -> x0 = x2 = 0 -> t = 5
    assert s.value(t) == 5


def test_table_positive_and_negative():
    m = CpModel()
    a = m.new_int_var(0, 3, "a")
    b = m.new_int_var(0, 3, "b")
    m.add_allowed_assignments([a, b], [(0, 1), (1, 2), (2, 3), (3, 0)])
    m.add_forbidden_assignments([a, b], [(1, 2), (3, 0)])
    m.maximize(a + b)
    s = CpSolver()
    assert s.solve(m) == SolveStatus.OPTIMAL
    assert (s.value(a), s.value(b)) == (2, 3)


def test_bool_xor_chain():
    m = CpModel()
    bs = [m.new_bool_var(f"b{i}") for i in range(5)]
    m.add_bool_xor(bs)
    m.add(sum(bs) <= 1)
    m.maximize(sum((i + 1) * b for i, b in enumerate(bs)))
    s = CpSolver()
    assert s.solve(m) == SolveStatus.OPTIMAL
    assert s.objective_value == 5  # exactly one true, pick the heaviest


def test_encode_model_bails_on_huge_domains():
    m = CpModel()
    a = m.new_int_var(0, 10**9, "a")
    m.add(a >= 5)
    assert encode_model(m.ir) is None


def test_encode_model_bails_on_unsupported_kind():
    m = CpModel()
    a = m.new_int_var(0, 5, "a")
    b = m.new_int_var(0, 5, "b")
    c = m.new_int_var(0, 25, "c")
    m.add_multiplication_equality(c, [a, b])
    assert encode_model(m.ir) is None


@pytest.mark.parametrize("seed", range(4))
def test_random_integer_models_match_bruteforce(seed):
    rng = random.Random(seed)
    n = 5
    dom = 4
    m = CpModel()
    xs = [m.new_int_var(0, dom - 1, f"x{i}") for i in range(n)]
    cons = []
    for _ in range(4):
        coeffs = [rng.randint(-3, 3) for _ in range(n)]
        lo = rng.randint(-6, 0)
        hi = lo + rng.randint(3, 14)
        m.add(sum(c * x for c, x in zip(coeffs, xs)) >= lo)
        m.add(sum(c * x for c, x in zip(coeffs, xs)) <= hi)
        cons.append((coeffs, lo, hi))
    obj = [rng.randint(-5, 5) for _ in range(n)]
    m.minimize(sum(c * x for c, x in zip(obj, xs)))

    best = None
    for combo in itertools.product(range(dom), repeat=n):
        ok = all(lo <= sum(c * v for c, v in zip(coeffs, combo)) <= hi
                 for coeffs, lo, hi in cons)
        if ok:
            val = sum(c * v for c, v in zip(obj, combo))
            best = val if best is None else min(best, val)

    s = CpSolver()
    s.parameters.max_time_in_seconds = 30
    st = s.solve(m)
    if best is None:
        assert st == SolveStatus.INFEASIBLE
    else:
        assert st == SolveStatus.OPTIMAL
        assert s.objective_value == best


def test_golomb8_regression():
    m = CpModel()
    n, ub = 8, 50
    marks = [m.new_int_var(0, ub, f"m{i}") for i in range(n)]
    m.add(marks[0] == 0)
    for i in range(n - 1):
        m.add(marks[i + 1] > marks[i])
    diffs = []
    for i in range(n):
        for j in range(i + 1, n):
            d = m.new_int_var(1, ub, f"d{i}_{j}")
            m.add(d == marks[j] - marks[i])
            diffs.append(d)
    m.add_all_different(diffs)
    m.minimize(marks[-1])
    s = CpSolver()
    s.parameters.max_time_in_seconds = 60
    assert s.solve(m) == SolveStatus.OPTIMAL
    assert s.objective_value == 34  # known optimal Golomb ruler order 8


def test_assumptions_through_integer_path():
    m = CpModel()
    a = m.new_int_var(0, 5, "a")
    lit = m.new_bool_var("lit")
    m.add(a >= 4).only_enforce_if(lit)
    m.add(a <= 2)
    m.add_assumption(lit)
    s = CpSolver()
    st = s.solve(m)
    assert st == SolveStatus.INFEASIBLE


# ---- scheduling fragment (interval / no_overlap / cumulative) ------------
# Reference parity: sat/intervals.h + sat/disjunctive.h + sat/cumulative.cc
# semantics, realized as the eager order encoding.


def test_jobshop_3x3_matches_engine():
    def build():
        m = CpModel()
        # 3 jobs x 3 machines, fixed durations
        jobs = [[(0, 3), (1, 2), (2, 2)],
                [(0, 2), (2, 1), (1, 4)],
                [(1, 4), (2, 3), (0, 1)]]
        horizon = sum(d for job in jobs for _, d in job)
        ends = []
        by_machine = {}
        for j, job in enumerate(jobs):
            prev_end = None
            for t, (mach, dur) in enumerate(job):
                s = m.new_int_var(0, horizon, f"s{j}_{t}")
                iv = m.new_fixed_size_interval_var(s, dur, f"iv{j}_{t}")
                by_machine.setdefault(mach, []).append(iv)
                if prev_end is not None:
                    m.add(s >= prev_end)
                prev_end = s + dur
            ends.append(prev_end)
        for ivs in by_machine.values():
            m.add_no_overlap(ivs)
        mk = m.new_int_var(0, horizon, "mk")
        m.add_max_equality(mk, ends)
        m.minimize(mk)
        return m

    (st1, s1), (st2, s2) = _solve_both(build())
    assert st1 == SolveStatus.OPTIMAL and st2 == SolveStatus.OPTIMAL
    assert s1.objective_value == s2.objective_value
    # the CDCL path must actually have been used (fragment is encodable)
    assert encode_model(build().ir) is not None


def test_zero_size_interval_strictly_inside_is_infeasible():
    # Reference semantics (cp_model.proto): a zero-size interval may touch
    # the endpoints of another interval but not sit strictly inside it.
    m = CpModel()
    p = m.new_int_var(3, 3, "p")
    point = m.new_fixed_size_interval_var(p, 0, "point")
    big = m.new_fixed_size_interval_var(m.new_int_var(2, 2, "s"), 3, "big")
    m.add_no_overlap([point, big])
    s = CpSolver()
    assert s.solve(m) == SolveStatus.INFEASIBLE

    m2 = CpModel()
    p2 = m2.new_int_var(2, 5, "p")  # endpoints 2 and 5 remain feasible
    point2 = m2.new_fixed_size_interval_var(p2, 0, "point")
    big2 = m2.new_fixed_size_interval_var(m2.new_int_var(2, 2, "s"), 3, "big")
    m2.add_no_overlap([point2, big2])
    s2 = CpSolver()
    assert s2.solve(m2) == SolveStatus.OPTIMAL
    assert s2.value(p2) in (2, 5)


def test_optional_intervals_no_overlap():
    m = CpModel()
    lits = [m.new_bool_var(f"p{i}") for i in range(3)]
    ivs = []
    for i, lit in enumerate(lits):
        s = m.new_int_var(0, 3, f"s{i}")
        ivs.append(m.new_optional_fixed_size_interval_var(
            s, 3, lit, f"iv{i}"))
    m.add_no_overlap(ivs)
    # horizon 0..6 fits at most 2 length-3 tasks
    for i in range(3):
        m.add(ivs[i].end_expr <= 6).only_enforce_if(lits[i])
    m.maximize(sum(lits))
    (st1, s1), (st2, s2) = _solve_both(m)
    assert st1 == SolveStatus.OPTIMAL and st2 == SolveStatus.OPTIMAL
    assert s1.objective_value == 2 == s2.objective_value


def test_cumulative_matches_engine():
    def build():
        m = CpModel()
        durs = [3, 2, 4, 2, 2]
        dems = [2, 3, 1, 2, 2]
        cap = 4
        horizon = 10
        ivs = []
        ends = []
        for i, (d, _) in enumerate(zip(durs, dems)):
            s = m.new_int_var(0, horizon - d, f"s{i}")
            ivs.append(m.new_fixed_size_interval_var(s, d, f"iv{i}"))
            ends.append(s + d)
        m.add_cumulative(ivs, dems, cap)
        mk = m.new_int_var(0, horizon, "mk")
        m.add_max_equality(mk, ends)
        m.minimize(mk)
        return m

    (st1, s1), (st2, s2) = _solve_both(build())
    assert st1 == SolveStatus.OPTIMAL and st2 == SolveStatus.OPTIMAL
    assert s1.objective_value == s2.objective_value
    assert encode_model(build().ir) is not None


def test_cumulative_constant_overload_infeasible():
    m = CpModel()
    s0 = m.new_int_var(0, 0, "s0")
    s1_ = m.new_int_var(0, 0, "s1")
    ivs = [m.new_fixed_size_interval_var(s0, 5, "a"),
           m.new_fixed_size_interval_var(s1_, 5, "b")]
    m.add_cumulative(ivs, [3, 3], 4)  # both fixed at t=0, 6 > 4
    s = CpSolver()
    assert s.solve(m) == SolveStatus.INFEASIBLE
