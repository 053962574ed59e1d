"""Structured MIP battery vs scipy.optimize.milp (HiGHS) — the in-repo
stand-in for the MIPLIB-easy target (BASELINE config 3)."""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import Bounds, LinearConstraint as SciLin, milp

from ortools_tpu.mip import MipParams, solve
from ortools_tpu.models.lp import QuadraticProgram
from ortools_tpu.utils.status import MPSolverStatus


def ref_solve(qp):
    qpm = qp.as_minimization()
    res = milp(
        qpm.objective_vector,
        constraints=SciLin(qpm.constraint_matrix, qpm.constraint_lower,
                           qpm.constraint_upper),
        bounds=Bounds(qpm.variable_lower, qpm.variable_upper),
        integrality=qpm.integrality.astype(int),
    )
    return res


def set_cover_mip(seed=0, m=12, n=20):
    rng = np.random.default_rng(seed)
    a = np.zeros((m, n))
    for i in range(m):
        cover = rng.choice(n, size=rng.integers(2, 5), replace=False)
        a[i, cover] = 1.0
    return QuadraticProgram(
        objective_vector=rng.uniform(1, 10, n),
        constraint_matrix=sp.csr_matrix(a),
        constraint_lower=np.ones(m), constraint_upper=np.full(m, np.inf),
        variable_lower=np.zeros(n), variable_upper=np.ones(n),
        integrality=np.ones(n, dtype=bool), name="set_cover",
    )


def fixed_charge_mip(seed=1, n=6):
    # continuous flow x_i <= M y_i with open-cost on y
    rng = np.random.default_rng(seed)
    cap = rng.uniform(3, 8, n)
    demand = float(cap.sum() * 0.55)
    rows, cols, vals = [], [], []
    # sum x = demand
    for i in range(n):
        rows.append(0)
        cols.append(i)
        vals.append(1.0)
    # x_i - cap_i y_i <= 0
    for i in range(n):
        rows.extend([1 + i, 1 + i])
        cols.extend([i, n + i])
        vals.extend([1.0, -float(cap[i])])
    a = sp.csr_matrix((vals, (rows, cols)), shape=(1 + n, 2 * n))
    return QuadraticProgram(
        objective_vector=np.concatenate([
            rng.uniform(1, 3, n), rng.uniform(5, 15, n)
        ]),
        constraint_matrix=a,
        constraint_lower=np.concatenate([[demand], np.full(n, -np.inf)]),
        constraint_upper=np.concatenate([[demand], np.zeros(n)]),
        variable_lower=np.zeros(2 * n),
        variable_upper=np.concatenate([cap, np.ones(n)]),
        integrality=np.concatenate([np.zeros(n, bool), np.ones(n, bool)]),
        name="fixed_charge",
    )


def equality_knapsack(seed=2, n=12):
    rng = np.random.default_rng(seed)
    w = rng.integers(2, 15, n).astype(float)
    pick = rng.random(n) < 0.5
    total = float(w @ pick)
    return QuadraticProgram(
        objective_vector=rng.standard_normal(n),
        constraint_matrix=sp.csr_matrix(w.reshape(1, -1)),
        constraint_lower=np.array([total]),
        constraint_upper=np.array([total]),
        variable_lower=np.zeros(n), variable_upper=np.ones(n),
        integrality=np.ones(n, dtype=bool), name="eq_knapsack",
    )


def interval_scheduling_mip(seed=3, n=14):
    # pick max-weight non-overlapping intervals (pairwise conflict rows)
    rng = np.random.default_rng(seed)
    starts = rng.uniform(0, 10, n)
    lengths = rng.uniform(1, 4, n)
    ends = starts + lengths
    rows, cols, vals = [], [], []
    r = 0
    for i in range(n):
        for j in range(i + 1, n):
            if starts[i] < ends[j] and starts[j] < ends[i]:
                rows.extend([r, r])
                cols.extend([i, j])
                vals.extend([1.0, 1.0])
                r += 1
    a = sp.csr_matrix((vals, (rows, cols)), shape=(max(r, 1), n))
    return QuadraticProgram(
        objective_vector=rng.uniform(1, 10, n),
        constraint_matrix=a,
        constraint_lower=np.full(max(r, 1), -np.inf),
        constraint_upper=np.ones(max(r, 1)),
        variable_lower=np.zeros(n), variable_upper=np.ones(n),
        integrality=np.ones(n, dtype=bool),
        maximize=True, name="interval_scheduling",
    )


FAMILIES = [
    ("set_cover", set_cover_mip),
    ("fixed_charge", fixed_charge_mip),
    ("eq_knapsack", equality_knapsack),
    ("interval_scheduling", interval_scheduling_mip),
]


@pytest.mark.parametrize("name,builder", FAMILIES,
                         ids=[f[0] for f in FAMILIES])
def test_mip_family_matches_highs(name, builder):
    qp = builder()
    ref = ref_solve(qp)
    r = solve(qp, MipParams(node_batch_size=16))
    assert r.status == MPSolverStatus.OPTIMAL, name
    sense = -1.0 if qp.maximize else 1.0
    ref_obj = sense * ref.fun
    assert abs(r.objective_value - ref_obj) <= 1e-4 * (1 + abs(ref_obj)), (
        name, r.objective_value, ref_obj
    )
