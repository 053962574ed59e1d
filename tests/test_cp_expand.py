"""Automaton / reservoir / no_overlap_2d expansion tests."""

import pytest

from ortools_tpu.sat import (
    CpModel,
    CpSolver,
    CpSolverSolutionCallback,
    INFEASIBLE,
    OPTIMAL,
)


def test_automaton_binary_no_two_consecutive_ones():
    # DFA: state 0 = last was 0, state 1 = last was 1; no 11 substring
    m = CpModel()
    n = 5
    bits = [m.new_int_var(0, 1, f"b{i}") for i in range(n)]
    transitions = [(0, 0, 0), (0, 1, 1), (1, 0, 0)]  # (1,1,*) missing
    m.add_automaton(bits, 0, [0, 1], transitions)

    count = [0]

    class Counter(CpSolverSolutionCallback):
        def on_solution_callback(self):
            count[0] += 1

    s = CpSolver()
    s.parameters.enumerate_all_solutions = True
    assert s.solve(m, Counter()) == OPTIMAL
    # number of binary strings of length 5 without "11" = Fibonacci(7) = 13
    assert count[0] == 13


def test_automaton_forces_value():
    m = CpModel()
    x = [m.new_int_var(0, 2, f"x{i}") for i in range(3)]
    # only accepted word: 0,1,2 (chain 0->1->2->3 final)
    m.add_automaton(x, 0, [3], [(0, 0, 1), (1, 1, 2), (2, 2, 3)])
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert [s.value(v) for v in x] == [0, 1, 2]


def test_automaton_infeasible():
    m = CpModel()
    x = [m.new_int_var(1, 1, "x0")]  # must read label 1
    m.add_automaton(x, 0, [1], [(0, 0, 1)])  # only label 0 possible
    s = CpSolver()
    assert s.solve(m) == INFEASIBLE


def test_reservoir_fixed_times():
    m = CpModel()
    # refills +5 at t=0, demands -3 at t in {2, 4}; level in [0, 10]
    t0 = m.new_constant(0)
    t1 = m.new_constant(2)
    t2 = m.new_constant(4)
    m.add_reservoir_constraint([t0, t1, t2], [5, -3, -3], 0, 10)
    s = CpSolver()
    assert s.solve(m) == INFEASIBLE  # 5 - 3 - 3 = -1 < 0


def test_reservoir_variable_times():
    m = CpModel()
    # consumer at t=2 of -3; refill +3 at variable time t in [0,10];
    # initial +5 at t=0; max level 6 -> refill must happen... check level
    t_refill = m.new_int_var(0, 10, "tr")
    m.add_reservoir_constraint(
        [m.new_constant(0), m.new_constant(2), t_refill],
        [5, -4, 4], 0, 6,
    )
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    # refill at t <= 2 would make level 5+4=9 > 6 before the demand unless
    # it lands after the consumption
    assert s.value(t_refill) >= 2
    # verified by checker inside solver already


def test_reservoir_with_active_literals():
    m = CpModel()
    use = m.new_bool_var("use")
    # demand -2 at t=1 only if `use`; supply +1 at t=0; level >= 0
    m.add_reservoir_constraint_with_active(
        [m.new_constant(0), m.new_constant(1)], [1, -2], [True, use], 0, 10
    )
    m.maximize(use)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.value(use) == 0  # taking it would drop level to -1


def test_no_overlap_2d_packing():
    # three 2x2 squares in a 4x4 board with one corner blocked -> feasible
    m = CpModel()
    xs, ys, xiv, yiv = [], [], [], []
    for i in range(3):
        x = m.new_int_var(0, 2, f"x{i}")
        y = m.new_int_var(0, 2, f"y{i}")
        xs.append(x)
        ys.append(y)
        xiv.append(m.new_fixed_size_interval_var(x, 2, f"xi{i}"))
        yiv.append(m.new_fixed_size_interval_var(y, 2, f"yi{i}"))
    m.add_no_overlap_2d(xiv, yiv)
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    # verify pairwise disjoint
    boxes = [(s.value(xs[i]), s.value(ys[i])) for i in range(3)]
    for i in range(3):
        for j in range(i + 1, 3):
            xi, yi = boxes[i]
            xj, yj = boxes[j]
            assert xi + 2 <= xj or xj + 2 <= xi or \
                yi + 2 <= yj or yj + 2 <= yi


def test_no_overlap_2d_infeasible():
    # five 2x2 squares cannot fit a 4x4 board (area 20 > 16)
    m = CpModel()
    xiv, yiv = [], []
    for i in range(5):
        x = m.new_int_var(0, 2, f"x{i}")
        y = m.new_int_var(0, 2, f"y{i}")
        xiv.append(m.new_fixed_size_interval_var(x, 2, f"xi{i}"))
        yiv.append(m.new_fixed_size_interval_var(y, 2, f"yi{i}"))
    m.add_no_overlap_2d(xiv, yiv)
    s = CpSolver()
    assert s.solve(m) == INFEASIBLE
