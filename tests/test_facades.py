"""bop / math_opt facades + CLI tests."""

import subprocess
import sys

import numpy as np
import pytest
import scipy.sparse as sp

from ortools_tpu import math_opt
from ortools_tpu.bop import IntegralSolver
from ortools_tpu.models.lp import QuadraticProgram
from ortools_tpu.utils.status import SolveStatus


def test_math_opt_lp():
    model = math_opt.Model(name="sample")
    x = model.add_variable(lb=0, name="x")
    y = model.add_variable(lb=0, name="y")
    model.add_linear_constraint(x + 2 * y <= 14)
    model.add_linear_constraint(3 * x - y >= 0)
    model.add_linear_constraint(x - y <= 2)
    model.maximize(3 * x + 4 * y)
    result = math_opt.solve(model, math_opt.SolverType.GLOP)
    assert result.termination.reason == math_opt.TerminationReason.OPTIMAL
    assert abs(result.objective_value() - 34.0) < 1e-7
    vals = result.variable_values()
    assert abs(result.value(x) - 6.0) < 1e-7
    assert result.has_primal_feasible_solution()


def test_math_opt_mip():
    model = math_opt.Model()
    x = model.add_binary_variable("x")
    y = model.add_integer_variable(lb=0, ub=5, name="y")
    model.add_linear_constraint(2 * x + 3 * y <= 12)
    model.maximize(x + 2 * y)
    result = math_opt.solve(model, math_opt.SolverType.CP_SAT)
    assert result.termination.reason == math_opt.TerminationReason.OPTIMAL
    assert abs(result.objective_value() - 8.0) < 1e-6  # x=0, y=4


def test_bop_integral_solver():
    qp = QuadraticProgram(
        objective_vector=np.array([2.0, 3.0]),
        constraint_matrix=sp.csr_matrix(np.array([[1.0, 2.0]])),
        constraint_lower=np.array([-np.inf]),
        constraint_upper=np.array([4.0]),
        variable_lower=np.zeros(2),
        variable_upper=np.array([3.0, 3.0]),
        maximize=True,
    )
    r = IntegralSolver().solve(qp)
    assert r.status == SolveStatus.OPTIMAL
    assert r.solution is not None
    x = r.solution
    assert x[0] + 2 * x[1] <= 4
    assert r.objective_value == 2 * x[0] + 3 * x[1]


def test_cli_solve(tmp_path):
    from ortools_tpu.cli import main
    from ortools_tpu.models.lp import random_lp
    from ortools_tpu.models.mps import write_mps

    qp = random_lp(10, 8, density=0.4, seed=2)
    path = str(tmp_path / "m.mps")
    write_mps(qp, path)
    sol = str(tmp_path / "m.sol")
    rc = main(["solve", "--input", path, "--solver", "glop",
               "--sol_file", sol])
    assert rc == 0
    text = open(sol).read()
    assert text.startswith("=obj=")


def test_sigint_handler_interrupts_cp_solve():
    """Cooperative interruption: a programmatic interrupt stops the solve
    at the next engine checkpoint (reference util/sigint.h contract)."""
    import numpy as np
    import threading
    import time as _time
    from ortools_tpu.sat.cp_model import CpModel
    from ortools_tpu.sat.solver import solve_model
    from ortools_tpu.sat.params import SatParameters
    from ortools_tpu.utils.interrupt import SigintHandler

    # A model slow enough not to finish instantly.
    rng = np.random.default_rng(0)
    m = CpModel()
    n = 40
    xs = [m.new_bool_var(f"x{i}") for i in range(n)]
    w = rng.integers(5, 40, n)
    v = rng.integers(5, 50, n)
    m.add(sum(int(wi) * x for wi, x in zip(w, xs)) <= int(w.sum() * 0.5))
    m.maximize(sum(int(vi) * x for vi, x in zip(v, xs)))

    h = SigintHandler()
    timer = threading.Timer(0.3, h.interrupt)
    timer.start()
    t0 = _time.perf_counter()
    r = solve_model(m.ir, SatParameters(max_time_in_seconds=60.0),
                    interrupt=h)
    dt = _time.perf_counter() - t0
    timer.cancel()
    assert dt < 30.0, "interrupt did not stop the solve"
    assert r.status.name in ("FEASIBLE", "UNKNOWN", "OPTIMAL")


def test_gap_integral_reported():
    from ortools_tpu.sat.cp_model import CpModel
    from ortools_tpu.sat.solver import solve_model

    m = CpModel()
    x = m.new_int_var(0, 10, "x")
    m.maximize(x)
    r = solve_model(m.ir)
    assert r.gap_integral >= 0.0


def test_solver_logger_callbacks():
    from ortools_tpu.utils.logging_util import SolverLogger

    lines = []
    lg = SolverLogger()
    lg.add_info_logging_callback(lines.append)
    lg.log_info("phase 1")
    lg("phase 2")
    assert lines == ["phase 1", "phase 2"]
    assert lg.contents() == "phase 1\nphase 2"


def test_math_opt_incremental_update_warm_restart():
    """ModelUpdate + IncrementalSolver (reference model_update.proto /
    core/solver.h session): bounds-only updates re-solve warm through
    the dual simplex."""
    from ortools_tpu.math_opt.model import (
        IncrementalSolver, Model, ModelUpdate, SolverType,
        TerminationReason)

    m = Model("inc")
    x = m.add_variable(lb=0.0, ub=10.0, name="x")
    y = m.add_variable(lb=0.0, ub=10.0, name="y")
    m.add_linear_constraint(x + y >= 4.0)
    m.minimize(2 * x + 3 * y)
    sess = IncrementalSolver(m, SolverType.GLOP)
    r1 = sess.solve()
    assert r1.termination.reason == TerminationReason.OPTIMAL
    assert abs(r1.objective_value() - 8.0) < 1e-7  # x=4, y=0

    upd = ModelUpdate().set_variable_ub(x, 1.0)
    r2 = sess.solve_after_update(upd)
    assert r2.termination.reason == TerminationReason.OPTIMAL
    assert abs(r2.objective_value() - (2.0 + 9.0)) < 1e-7  # x=1, y=3
    vals = {v.index: val for v, val in r2.variable_values().items()} if \
        hasattr(r2, "variable_values") else None

    # infeasible update detected through the warm path
    upd2 = ModelUpdate().set_variable_ub(x, 1.0).set_variable_ub(y, 2.0)
    r3 = sess.solve_after_update(upd2)
    assert r3.termination.reason == TerminationReason.INFEASIBLE


def test_propagator_timing_tables():
    """profile_propagators yields per-kind run counts/time (reference
    DemonProfiler / SCOPED_TIME_STAT tables)."""
    from ortools_tpu.sat.engine import Engine
    from ortools_tpu.sat import expand
    from ortools_tpu.sat.cp_model import CpModel

    m = CpModel()
    xs = [m.new_int_var(0, 5, f"x{i}") for i in range(4)]
    m.add_all_different(xs)
    m.add(sum(xs) == 8)
    eng = Engine(expand.expand_model(m.ir), profile=True)
    doms = eng.initial_domains()
    eng.root_propagate(doms)
    assert eng.propagator_stats
    for kind, (runs, secs) in eng.propagator_stats.items():
        assert runs > 0 and secs >= 0.0
    assert {"all_diff", "linear"} <= set(eng.propagator_stats)


def test_math_opt_incremental_structural_updates():
    """model_update.proto parity: add/delete constraints and variables,
    matrix + constraint-bound updates, through the IncrementalSolver."""
    from ortools_tpu.math_opt.model import (IncrementalSolver, ModelUpdate,
                                            SolverType)

    model = math_opt.Model(name="inc")
    x = model.add_variable(lb=0.0, ub=10.0, name="x")
    y = model.add_variable(lb=0.0, ub=10.0, name="y")
    c0 = model.add_linear_constraint(x + y <= 8.0)
    model.maximize(x + 2 * y)

    inc = IncrementalSolver(model, SolverType.GLOP)
    r0 = inc.solve()
    assert abs(r0.objective_value() - 16.0) < 1e-6  # y=8? no: x+y<=8, max x+2y -> x=0,y=8 -> 16

    # add a constraint limiting y
    upd = ModelUpdate()
    upd.add_linear_constraint(y <= 3.0)
    r1 = inc.solve_after_update(upd)
    # x + y <= 8, y <= 3 -> x=5, y=3 -> 11
    assert abs(r1.objective_value() - 11.0) < 1e-6

    # tighten the first constraint's upper bound
    upd2 = ModelUpdate().set_constraint_ub(c0, 6.0)
    r2 = inc.solve_after_update(upd2)
    assert abs(r2.objective_value() - 9.0) < 1e-6  # x=3,y=3

    # delete the y-limit (constraint index 1) -> back to y-heavy optimum
    upd3 = ModelUpdate()
    upd3.delete_linear_constraint(1)
    r3 = inc.solve_after_update(upd3)
    assert abs(r3.objective_value() - 12.0) < 1e-6  # y=6

    # add a new variable with a strong objective coefficient
    upd4 = ModelUpdate()
    upd4.add_variable(lb=0.0, ub=2.0, name="z")
    r4 = inc.solve_after_update(upd4)
    z_idx = 2
    upd5 = ModelUpdate()
    upd5.objective_coeffs[z_idx] = 5.0
    r5 = inc.solve_after_update(upd5)
    assert abs(r5.objective_value() - 22.0) < 1e-6  # y=6 (12) + z=2 (10)

    # delete variable y: removed from rows + objective, fixed to 0
    upd6 = ModelUpdate().delete_variable(y)
    r6 = inc.solve_after_update(upd6)
    # max x + 5z s.t. x <= 6, z <= 2 -> 6 + 10 = 16
    assert abs(r6.objective_value() - 16.0) < 1e-6

    # matrix coefficient update: make x count double in c0 (x' <= 3)
    upd7 = ModelUpdate().set_coefficient(c0, x, 2.0)
    r7 = inc.solve_after_update(upd7)
    assert abs(r7.objective_value() - 13.0) < 1e-6  # x=3 + 10


def test_math_opt_bounds_only_update_stays_warm():
    from ortools_tpu.math_opt.model import (IncrementalSolver, ModelUpdate,
                                            SolverType)

    model = math_opt.Model()
    x = model.add_variable(lb=0.0, ub=4.0)
    y = model.add_variable(lb=0.0, ub=4.0)
    model.add_linear_constraint(x + y <= 6.0)
    model.maximize(x + y)
    inc = IncrementalSolver(model, SolverType.GLOP)
    r0 = inc.solve()
    assert abs(r0.objective_value() - 6.0) < 1e-6
    upd = ModelUpdate().set_variable_ub(x, 1.0)
    assert upd.bounds_only
    r1 = inc.solve_after_update(upd)
    assert abs(r1.objective_value() - 5.0) < 1e-6


def test_bop_portfolio_optimizes_boolean_lp():
    import numpy as np
    import scipy.sparse as sp
    from scipy.optimize import Bounds, LinearConstraint, milp

    from ortools_tpu.bop.portfolio import solve_boolean_lp
    from ortools_tpu.models.lp import QuadraticProgram
    from ortools_tpu.utils.status import SolveStatus

    rng = np.random.default_rng(4)
    n, m = 30, 12
    a = sp.random(m, n, density=0.3, random_state=2, format="csr")
    a.data = np.abs(rng.standard_normal(a.nnz)) + 0.1
    qp = QuadraticProgram(
        objective_vector=-rng.uniform(1, 3, n),  # minimize negative = pack
        constraint_matrix=a,
        constraint_lower=np.full(m, -np.inf),
        constraint_upper=rng.uniform(2, 4, m),
        variable_lower=np.zeros(n),
        variable_upper=np.ones(n),
        integrality=np.ones(n, dtype=bool),
    )
    r = solve_boolean_lp(qp, time_limit_sec=20)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    s = milp(qp.objective_vector,
             constraints=LinearConstraint(a, qp.constraint_lower,
                                          qp.constraint_upper),
             bounds=Bounds(qp.variable_lower, qp.variable_upper),
             integrality=np.ones(n), options={"time_limit": 20})
    assert r.objective_value <= s.fun + 1e-4 * (1 + abs(s.fun))
    assert sum(r.strategy_wins.values()) >= 1


def test_bop_portfolio_proves_small_instance():
    import numpy as np

    from ortools_tpu.bop.portfolio import solve_boolean_lp
    from ortools_tpu.models.lp import QuadraticProgram
    from ortools_tpu.utils.status import SolveStatus

    qp = QuadraticProgram(
        objective_vector=np.array([-2.0, -3.0, -4.0]),
        constraint_matrix=np.array([[1.0, 1.0, 1.0]]),
        constraint_lower=np.array([-np.inf]),
        constraint_upper=np.array([2.0]),
        variable_lower=np.zeros(3),
        variable_upper=np.ones(3),
        integrality=np.ones(3, dtype=bool),
    )
    r = solve_boolean_lp(qp, time_limit_sec=15)
    assert r.status == SolveStatus.OPTIMAL
    assert abs(r.objective_value - (-7.0)) < 1e-9


def test_math_opt_infeasible_subsystem():
    """reference math_opt/infeasible_subsystem.proto +
    compute_infeasible_subsystem: deletion-filter IIS over rows and
    variable bounds."""
    from ortools_tpu import math_opt as mo

    m = mo.Model("iis")
    x = m.add_variable(lb=0.0, ub=10.0, name="x")
    y = m.add_variable(lb=0.0, ub=10.0, name="y")
    c1 = m.add_linear_constraint(x + y >= 12)   # conflicts with c2
    c2 = m.add_linear_constraint(x + y <= 8)
    m.add_linear_constraint(x - y <= 3)         # irrelevant
    r = mo.compute_infeasible_subsystem(m)
    assert r.feasibility == mo.TerminationReason.INFEASIBLE
    assert r.is_minimal
    assert sorted(r.infeasible_subsystem.linear_constraints) == [0, 1]
    # a feasible model reports feasible with an empty subset
    m2 = mo.Model("ok")
    a = m2.add_variable(lb=0.0, ub=1.0)
    m2.add_linear_constraint(a <= 1)
    r2 = mo.compute_infeasible_subsystem(m2)
    assert r2.feasibility == mo.TerminationReason.OPTIMAL
    assert r2.infeasible_subsystem.linear_constraints == []


def test_math_opt_bound_only_iis():
    from ortools_tpu import math_opt as mo

    m = mo.Model("bounds")
    x = m.add_variable(lb=5.0, ub=10.0)
    m.add_linear_constraint(x <= 2)  # conflicts with x's lower bound
    r = mo.compute_infeasible_subsystem(m)
    assert r.feasibility == mo.TerminationReason.INFEASIBLE
    assert r.infeasible_subsystem.linear_constraints == [0]
    assert r.infeasible_subsystem.variable_bounds == [0]


def test_math_opt_callbacks():
    """reference math_opt callback.proto: message + MIP-solution
    callbacks."""
    from ortools_tpu import math_opt as mo

    m = mo.Model("cb")
    xs = [m.add_binary_variable(name=f"b{i}") for i in range(6)]
    m.add_linear_constraint(sum(xs) >= 3)
    m.minimize(sum((i + 1) * x for i, x in enumerate(xs)))
    msgs = []
    sols = []
    r = mo.solve(m, mo.SolverType.GSCIP,
                 message_callback=lambda lines: msgs.extend(lines),
                 solution_callback=lambda vals, obj: sols.append(obj))
    assert r.termination.reason == mo.TerminationReason.OPTIMAL
    assert any("math_opt" in s for s in msgs)
    assert sols and min(sols) == r.objective_value() == 6.0
