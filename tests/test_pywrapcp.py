"""Classic constraint_solver (pywrapcp-style) facade tests."""

import pytest

from ortools_tpu.constraint_solver import Solver


def test_newsearch_nextsolution_protocol():
    solver = Solver("simple")
    x = solver.IntVar(0, 2, "x")
    y = solver.IntVar(0, 2, "y")
    solver.Add(x != y)
    db = solver.Phase([x, y], Solver.CHOOSE_FIRST_UNBOUND,
                      Solver.ASSIGN_MIN_VALUE)
    solver.NewSearch(db)
    count = 0
    seen = set()
    while solver.NextSolution():
        count += 1
        seen.add((solver.Value(x), solver.Value(y)))
    solver.EndSearch()
    assert count == 6  # 3*3 - 3 equal pairs
    assert all(a != b for a, b in seen)


def test_solve_with_minimize():
    solver = Solver("opt")
    x = solver.IntVar(0, 10, "x")
    y = solver.IntVar(0, 10, "y")
    solver.Add(x + y >= 7)
    obj = solver.Minimize(2 * x + 3 * y, 1)
    db = solver.Phase([x, y])
    assert solver.Solve(db, [obj])
    assert solver.Value(2 * x + 3 * y) == 14  # x=7, y=0


def test_max_min_abs_helpers():
    solver = Solver()
    x = solver.IntVar(-5, 5, "x")
    y = solver.IntVar(-5, 5, "y")
    mx = solver.Max(x, y)
    mn = solver.Min(x, y)
    ab = solver.Abs(x)
    solver.Add(x == -4)
    solver.Add(y == 3)
    assert solver.Solve(solver.Phase([x, y]))
    assert solver.Value(mx) == 3
    assert solver.Value(mn) == -4
    assert solver.Value(ab) == 4


def test_solution_collectors():
    solver = Solver()
    x = solver.IntVar(0, 1, "x")
    y = solver.IntVar(0, 1, "y")
    solver.Add(x + y >= 1)
    collector = solver.AllSolutionCollector()
    collector.Add([x, y])
    assert solver.Solve(solver.Phase([x, y]), [collector])
    assert collector.SolutionCount() == 3
    sols = {(collector.Value(i, x), collector.Value(i, y))
            for i in range(3)}
    assert sols == {(0, 1), (1, 0), (1, 1)}


def test_alldifferent_and_scalprod():
    solver = Solver()
    xs = [solver.IntVar(0, 3, f"x{i}") for i in range(4)]
    solver.AllDifferent(xs)
    solver.Add(solver.ScalProd(xs, [1, 1, 1, 1]) == 6)  # 0+1+2+3
    assert solver.Solve(solver.Phase(xs))
    assert sorted(solver.Value(v) for v in xs) == [0, 1, 2, 3]


def test_infeasible_root():
    solver = Solver()
    x = solver.IntVar(0, 1, "x")
    solver.Add(x >= 2)
    solver.NewSearch(solver.Phase([x]))
    assert not solver.NextSolution()
    solver.EndSearch()
    assert not solver.Solve(solver.Phase([x]))


def test_interval_and_sequence_vars():
    """Classic IntervalVar/SequenceVar surface (constraint_solver.h:4643,
    :4797) over the CP engine."""
    solver = Solver("jobs")
    a = solver.FixedDurationIntervalVar(0, 10, 3, False, "a")
    b = solver.FixedDurationIntervalVar(0, 10, 4, False, "b")
    c = solver.FixedDurationIntervalVar(0, 10, 2, False, "c")
    disj = solver.DisjunctiveConstraint([a, b, c], "machine")
    seq = disj.SequenceVar()
    assert seq.Size() == 3
    # minimize makespan
    makespan = solver.IntVar(0, 30, "mk")
    for iv in (a, b, c):
        solver.Add(iv.EndExpr() <= makespan)
    solver.Minimize(makespan, 1)
    assert solver.Solve()
    assert solver.Value(makespan) == 9  # 3+4+2
    order = seq.RankedSequence()
    assert sorted(order) == [0, 1, 2]
    # starts respect the ranking
    starts = [solver.Value(iv._start) for iv in (a, b, c)]
    durs = [3, 4, 2]
    for x, y in zip(order, order[1:]):
        assert starts[x] + durs[x] <= starts[y]


def test_cumulative_classic():
    solver = Solver("cum")
    a = solver.FixedDurationIntervalVar(0, 20, 4, False, "a")
    b = solver.FixedDurationIntervalVar(0, 20, 4, False, "b")
    solver.Cumulative([a, b], [1, 1], 1, "res")
    mk = solver.IntVar(0, 40, "mk")
    solver.Add(a.EndExpr() <= mk)
    solver.Add(b.EndExpr() <= mk)
    solver.Minimize(mk, 1)
    assert solver.Solve()
    assert solver.Value(mk) == 8


def test_optional_interval():
    solver = Solver("opt")
    a = solver.FixedDurationIntervalVar(0, 5, 3, True, "a")
    assert not a.MustBePerformed()
    solver.Add(a.PerformedExpr() == 0)
    assert solver.Solve()
