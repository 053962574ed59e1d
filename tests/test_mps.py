import math
import os

import numpy as np
import pytest

from ortools_tpu.models.lp import QuadraticProgram, random_lp
from ortools_tpu.models.mps import read_mps, write_mps

SIMPLE_MPS = """\
NAME          test_lp
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  MYEQN
COLUMNS
    X1  COST  1.0  LIM1  1.0
    X1  LIM2  1.0
    X2  COST  2.0  LIM1  1.0
    X2  MYEQN  -1.0
    X3  COST  -1.0  LIM2  1.0
    X3  MYEQN  1.0
RHS
    RHS  LIM1  4.0  LIM2  1.0
    RHS  MYEQN  7.0
BOUNDS
 UP BND  X1  4.0
 LO BND  X2  -1.0
ENDATA
"""


def test_parse_simple():
    qp = read_mps(SIMPLE_MPS, is_text=True)
    assert qp.name == "test_lp"
    assert qp.num_variables == 3 and qp.num_constraints == 3
    np.testing.assert_allclose(qp.objective_vector, [1.0, 2.0, -1.0])
    a = qp.constraint_matrix.toarray()
    np.testing.assert_allclose(a, [[1, 1, 0], [1, 0, 1], [0, -1, 1]])
    np.testing.assert_allclose(qp.constraint_upper, [4.0, math.inf, 7.0])
    np.testing.assert_allclose(qp.constraint_lower, [-math.inf, 1.0, 7.0])
    np.testing.assert_allclose(qp.variable_lower, [0.0, -1.0, 0.0])
    np.testing.assert_allclose(qp.variable_upper, [4.0, math.inf, math.inf])
    assert not qp.validate()


def test_objsense_and_integers():
    text = """\
NAME maxprob
OBJSENSE
    MAX
ROWS
 N obj
 L c1
COLUMNS
    MARKER  'MARKER'  'INTORG'
    x  obj  3.0  c1  1.0
    MARKER  'MARKER'  'INTEND'
    y  obj  2.0  c1  1.0
RHS
    rhs  c1  10
ENDATA
"""
    qp = read_mps(text, is_text=True)
    assert qp.maximize
    # stored in the original (maximization) sense
    np.testing.assert_allclose(qp.objective_vector, [3.0, 2.0])
    np.testing.assert_allclose(
        qp.as_minimization().objective_vector, [-3.0, -2.0]
    )
    assert qp.integrality.tolist() == [True, False]


def test_ranges():
    text = """\
NAME r
ROWS
 N obj
 L c1
 G c2
 E c3
COLUMNS
    x  obj  1.0  c1  1.0
    x  c2  1.0  c3  1.0
RHS
    rhs  c1  10  c2  2
    rhs  c3  5
RANGES
    rng  c1  4  c2  3
    rng  c3  -2
ENDATA
"""
    qp = read_mps(text, is_text=True)
    np.testing.assert_allclose(qp.constraint_lower, [6.0, 2.0, 3.0])
    np.testing.assert_allclose(qp.constraint_upper, [10.0, 5.0, 5.0])


def test_objective_constant_via_rhs():
    text = """\
NAME k
ROWS
 N obj
 G c1
COLUMNS
    x  obj  1.0  c1  1.0
RHS
    rhs  obj  -3.5  c1  1.0
ENDATA
"""
    qp = read_mps(text, is_text=True)
    assert qp.objective_constant == 3.5


def test_roundtrip_random_lp(tmp_path):
    qp = random_lp(20, 30, density=0.2, seed=7)
    qp.variable_names = [f"x{j}" for j in range(30)]
    qp.constraint_names = [f"r{i}" for i in range(20)]
    path = str(tmp_path / "rt.mps")
    write_mps(qp, path)
    qp2 = read_mps(path)
    np.testing.assert_allclose(qp2.objective_vector, qp.objective_vector, rtol=1e-12)
    np.testing.assert_allclose(
        qp2.constraint_matrix.toarray(), qp.constraint_matrix.toarray(), rtol=1e-12
    )
    np.testing.assert_allclose(qp2.constraint_upper, qp.constraint_upper, rtol=1e-12)
    np.testing.assert_allclose(qp2.variable_upper, qp.variable_upper, rtol=1e-12)


REFERENCE_FIXTURES = [
    "/root/reference/examples/cpp/test.mps",
    "/root/reference/examples/cpp/test2.mps",
    "/root/reference/ortools/linear_solver/testdata/maximization.mps",
    "/root/reference/ortools/routing/testdata/solomon_bp_c101.mps",
]


@pytest.mark.parametrize("path", REFERENCE_FIXTURES)
def test_reference_fixture_files(path):
    if not os.path.exists(path):
        pytest.skip("reference data not mounted")
    qp = read_mps(path)
    assert qp.num_variables > 0
    assert not qp.validate(), qp.validate()
