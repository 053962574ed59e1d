"""DIMACS CNF / wCNF / OPB readers (sat/sat_io.py) + runner dispatch."""

import itertools

from ortools_tpu.sat.sat_io import (
    SatIoError,
    read_cnf,
    read_opb,
    read_problem_file,
    read_wcnf,
)
from ortools_tpu.sat.solver import solve_model
from ortools_tpu.utils.status import SolveStatus

import pytest


def test_cnf_sat_and_unsat():
    sat_text = """c simple
p cnf 3 3
1 2 0
-1 3 0
-2 -3 0
"""
    m = read_cnf(sat_text)
    assert len(m.variables) == 3 and len(m.constraints) == 3
    r = solve_model(m)
    assert r.status == SolveStatus.OPTIMAL
    # verify against brute force
    ok = False
    for bits in itertools.product([0, 1], repeat=3):
        x1, x2, x3 = bits
        if (x1 or x2) and ((not x1) or x3) and ((not x2) or (not x3)):
            ok = True
    assert ok

    unsat_text = "p cnf 1 2\n1 0\n-1 0\n"
    r = solve_model(read_cnf(unsat_text))
    assert r.status == SolveStatus.INFEASIBLE


def test_wcnf_classic_partial_maxsat():
    # hard: x1 or x2; soft(3): -x1; soft(5): -x2  -> falsify cheaper soft
    text = """p wcnf 2 3 100
100 1 2 0
3 -1 0
5 -2 0
"""
    m = read_wcnf(text)
    r = solve_model(m)
    assert r.status == SolveStatus.OPTIMAL
    assert r.objective_value == 3  # violate the weight-3 soft clause
    assert r.solution[0] == 1 and r.solution[1] == 0


def test_wcnf_2022_format():
    text = """c 2022 format
h 1 2 0
3 -1 0
5 -2 0
"""
    m = read_wcnf(text)
    r = solve_model(m)
    assert r.status == SolveStatus.OPTIMAL
    assert r.objective_value == 3


def test_opb_linear():
    text = """* #variable= 3 #constraint= 2
min: +1 x1 +2 x2 +3 x3 ;
+1 x1 +1 x2 +1 x3 >= 2 ;
+1 x1 +1 x2 <= 1 ;
"""
    m = read_opb(text)
    r = solve_model(m)
    assert r.status == SolveStatus.OPTIMAL
    # need >= 2 of the three, at most one of x1,x2: best is x1 + x3 = 4
    assert r.objective_value == 4


def test_opb_negated_literals_and_equality():
    text = """min: +2 ~x1 +1 x2 ;
+1 x1 +1 ~x2 = 2 ;
"""
    m = read_opb(text)
    r = solve_model(m)
    assert r.status == SolveStatus.OPTIMAL
    # x1=1 and x2=0 forced; objective = 2*0 + 0 = 0
    assert r.objective_value == 0


def test_opb_rejects_nonlinear():
    with pytest.raises(SatIoError):
        read_opb("min: +1 x1 x2 ;\n+1 x1 >= 0 ;\n")


def test_dispatch_by_extension(tmp_path):
    p = tmp_path / "toy.cnf"
    p.write_text("p cnf 1 1\n1 0\n")
    m = read_problem_file(str(p))
    r = solve_model(m)
    assert r.status == SolveStatus.OPTIMAL
    assert r.solution[0] == 1
