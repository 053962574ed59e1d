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
