"""LP text format reader/writer tests."""

import math

import numpy as np
import pytest

from ortools_tpu.glop import solve as glop_solve
from ortools_tpu.models.lp import random_lp
from ortools_tpu.models.lp_format import LpFormatError, read_lp, write_lp
from ortools_tpu.utils.stats import StatsGroup, TimeDistribution

LP_SAMPLE = """\
\\ a comment
Maximize
 obj: 3 x + 4 y
Subject to
 c1: x + 2 y <= 14
 c2: 3 x - y >= 0
 c3: x - y <= 2
Bounds
 0 <= x <= 100
End
"""


def test_read_simple():
    qp = read_lp(LP_SAMPLE, is_text=True)
    assert qp.maximize
    assert qp.num_variables == 2 and qp.num_constraints == 3
    r = glop_solve(qp)
    assert abs(r.objective_value - 34.0) < 1e-7


def test_roundtrip():
    qp = random_lp(12, 9, density=0.4, seed=6)
    qp.variable_names = [f"v{j}" for j in range(9)]
    qp.constraint_names = [f"r{i}" for i in range(12)]
    text = write_lp(qp)
    qp2 = read_lp(text, is_text=True)
    r1, r2 = glop_solve(qp), glop_solve(qp2)
    assert abs(r1.objective_value - r2.objective_value) < 1e-7


def test_integers_and_binaries():
    text = """\
Minimize
 obj: x + y + z
Subject to
 c1: x + y + z >= 2
Bounds
 0 <= x <= 5
Generals
 x
Binaries
 y z
End
"""
    qp = read_lp(text, is_text=True)
    assert qp.integrality.tolist() == [True, True, True]
    assert qp.variable_upper[1] == 1.0


def test_free_and_fixed_bounds():
    text = """\
Minimize
 obj: a + b + c2
Subject to
 r: a + b >= 1
Bounds
 a free
 b = 3
 -2 <= c2 <= 2
End
"""
    qp = read_lp(text, is_text=True)
    j = qp.variable_names.index("a")
    assert qp.variable_lower[j] == -math.inf
    j = qp.variable_names.index("b")
    assert qp.variable_lower[j] == qp.variable_upper[j] == 3.0


def test_bad_constraint_raises():
    with pytest.raises(LpFormatError):
        read_lp("Minimize\n obj: x\nSubject to\n c: x ?? 3\nEnd\n",
                is_text=True)


def test_stats():
    g = StatsGroup("solver")
    td = g.time_distribution("propagate")
    for _ in range(3):
        with td.time_this():
            pass
    d = g.integer_distribution("depth")
    d.add(3)
    d.add(7)
    assert d.count == 2 and d.average == 5.0 and d.max == 7
    s = str(g)
    assert "propagate" in s and "depth" in s
