"""Structured LP battery: PDHG to 1e-6 vs scipy HiGHS across problem
families (the in-repo stand-in for the Netlib suite — BASELINE config 1/2;
real Netlib files are not available in this zero-egress environment)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ortools_tpu.models.generators import multicommodity_flow_lp
from ortools_tpu.models.lp import QuadraticProgram, random_lp
from ortools_tpu.pdlp import PdhgParams, solve
from ortools_tpu.utils.status import TerminationReason

from tests.test_pdlp import scipy_solve

F64 = dict(dtype=jnp.float64, iteration_limit=200_000)


def transportation_lp(ns=6, nd=8, seed=0):
    rng = np.random.default_rng(seed)
    supply = rng.uniform(5, 15, ns)
    demand = rng.uniform(2, 8, nd)
    demand *= supply.sum() / demand.sum()  # balanced
    cost = rng.uniform(1, 20, (ns, nd))
    n = ns * nd
    rows, cols, vals = [], [], []
    for i in range(ns):
        for j in range(nd):
            rows.append(i)
            cols.append(i * nd + j)
            vals.append(1.0)
    for j in range(nd):
        for i in range(ns):
            rows.append(ns + j)
            cols.append(i * nd + j)
            vals.append(1.0)
    a = sp.csr_matrix((vals, (rows, cols)), shape=(ns + nd, n))
    b = np.concatenate([supply, demand])
    return QuadraticProgram(
        objective_vector=cost.ravel(),
        constraint_matrix=a,
        constraint_lower=b, constraint_upper=b,
        variable_lower=np.zeros(n), variable_upper=np.full(n, np.inf),
        name="transportation",
    )


def assignment_lp(n=10, seed=1):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(0, 50, (n, n))
    rows, cols, vals = [], [], []
    for i in range(n):
        for j in range(n):
            rows.append(i)          # row-sum constraint
            cols.append(i * n + j)
            vals.append(1.0)
            rows.append(n + j)      # column-sum constraint
            cols.append(i * n + j)
            vals.append(1.0)
    a = sp.csr_matrix((vals, (rows, cols)), shape=(2 * n, n * n))
    return QuadraticProgram(
        objective_vector=cost.ravel(),
        constraint_matrix=a,
        constraint_lower=np.ones(2 * n), constraint_upper=np.ones(2 * n),
        variable_lower=np.zeros(n * n), variable_upper=np.ones(n * n),
        name="assignment",
    )


def covering_lp(m=40, n=60, seed=2):
    rng = np.random.default_rng(seed)
    a = (sp.random(m, n, density=0.15,
                   random_state=np.random.RandomState(seed)) > 0
         ).astype(np.float64)
    # ensure every row coverable
    a = sp.lil_matrix(a)
    for i in range(m):
        if a[i].sum() == 0:
            a[i, rng.integers(0, n)] = 1.0
    return QuadraticProgram(
        objective_vector=rng.uniform(1, 10, n),
        constraint_matrix=sp.csr_matrix(a),
        constraint_lower=np.ones(m), constraint_upper=np.full(m, np.inf),
        variable_lower=np.zeros(n), variable_upper=np.ones(n),
        name="covering",
    )


def diet_lp(seed=3):
    rng = np.random.default_rng(seed)
    n, m = 20, 8  # foods x nutrients
    nutr = rng.uniform(0, 5, (m, n))
    need = nutr @ rng.uniform(0.2, 1.0, n)
    return QuadraticProgram(
        objective_vector=rng.uniform(1, 4, n),
        constraint_matrix=sp.csr_matrix(nutr),
        constraint_lower=need, constraint_upper=np.full(m, np.inf),
        variable_lower=np.zeros(n), variable_upper=np.full(n, 10.0),
        name="diet",
    )


FAMILIES = [
    ("transportation", transportation_lp),
    ("assignment", assignment_lp),
    ("covering", covering_lp),
    ("diet", diet_lp),
    ("mcf", lambda: multicommodity_flow_lp(12, 40, 3, seed=4)),
    ("random_dense", lambda: random_lp(60, 45, density=0.5, seed=5)),
    ("random_sparse", lambda: random_lp(150, 120, density=0.05, seed=6)),
]


@pytest.mark.parametrize("name,builder", FAMILIES,
                         ids=[f[0] for f in FAMILIES])
def test_family_to_1e6(name, builder):
    qp = builder()
    ref = scipy_solve(qp)
    r = solve(qp, PdhgParams(**F64))
    assert r.termination_reason == TerminationReason.OPTIMAL, name
    assert abs(r.primal_objective - ref) <= 1e-4 * (1 + abs(ref)), (
        name, r.primal_objective, ref
    )
    assert r.relative_gap <= 1e-5


def test_battery_with_presolve():
    qp = transportation_lp(seed=9)
    ref = scipy_solve(qp)
    r = solve(qp, PdhgParams(presolve=True, **F64))
    assert r.termination_reason == TerminationReason.OPTIMAL
    assert abs(r.primal_objective - ref) <= 1e-4 * (1 + abs(ref))
