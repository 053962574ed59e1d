"""Trust-region subproblem + ADAPTIVE_HEURISTIC restart strategy tests.

Mirrors the reference's trust_region_test.cc style: small problems with
solutions verifiable against an independent solver (scipy SLSQP here).
"""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import minimize

import jax.numpy as jnp

from ortools_tpu.pdlp.trust_region import (
    dual_bounds,
    dual_subgradient,
    solve_joint_trust_region,
)


def test_trust_region_matches_slsqp():
    rng = np.random.default_rng(3)
    for _ in range(10):
        n, m = 5, 4
        gx, gy = rng.standard_normal(n), rng.standard_normal(m)
        x, y = rng.standard_normal(n), rng.standard_normal(m)
        lb, ub = x - rng.uniform(0.1, 2, n), x + rng.uniform(0.1, 2, n)
        ylb, yub = y - rng.uniform(0.1, 2, m), y + rng.uniform(0.1, 2, m)
        lb[rng.random(n) < 0.3] = -np.inf
        ub[rng.random(n) < 0.3] = np.inf
        omega = float(rng.uniform(0.3, 3))
        r = float(rng.uniform(0.2, 2))
        res = solve_joint_trust_region(
            jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(x),
            jnp.asarray(y), jnp.asarray(lb), jnp.asarray(ub),
            jnp.asarray(ylb), jnp.asarray(yub), omega, r,
        )
        got = float(res.primal_delta_objective - res.dual_delta_objective)
        g = np.concatenate([gx, -gy])
        z = np.concatenate([x, y])
        lo = np.clip(np.concatenate([lb, ylb]) - z, -1e6, 0)
        hi = np.clip(np.concatenate([ub, yub]) - z, 0, 1e6)
        w = np.concatenate(
            [np.full(n, omega / 2), np.full(m, 1 / (2 * omega))]
        )
        best = None
        for _ in range(5):
            d0 = rng.uniform(lo / (1 + np.abs(lo)), hi / (1 + np.abs(hi)))
            sol = minimize(
                lambda d: g @ d, d0,
                bounds=list(zip(lo, hi)),
                constraints=[{"type": "ineq",
                              "fun": lambda d: r * r - np.sum(w * d * d)}],
                method="SLSQP", options={"maxiter": 300, "ftol": 1e-12},
            )
            if sol.success and (best is None or sol.fun < best):
                best = sol.fun
        if best is None:
            continue  # SLSQP failed on this instance; skip
        assert got == pytest.approx(best, abs=1e-5, rel=1e-4)


def test_ball_inactive_when_box_small():
    # tiny box far inside the ball: solution = full box move
    gx = jnp.asarray([1.0, -2.0])
    gy = jnp.asarray([3.0])
    x = jnp.zeros(2)
    y = jnp.zeros(1)
    res = solve_joint_trust_region(
        gx, gy, x, y,
        jnp.asarray([-0.1, -0.1]), jnp.asarray([0.1, 0.1]),
        jnp.asarray([-0.1]), jnp.asarray([0.1]), 1.0, 100.0,
    )
    # primal: move against gx: d = (-0.1, +0.1) -> gx.d = -0.3
    assert float(res.primal_delta_objective) == pytest.approx(-0.3)
    # dual: maximize gy.dy -> dy = +0.1 -> 0.3
    assert float(res.dual_delta_objective) == pytest.approx(0.3)
    assert float(res.gap) == pytest.approx(0.6)


def test_dual_bounds_and_subgradient():
    lb = jnp.asarray([0.0, -jnp.inf, 1.0, -jnp.inf])
    ub = jnp.asarray([jnp.inf, 5.0, 2.0, jnp.inf])
    ylb, yub = dual_bounds(lb, ub)
    assert list(np.asarray(ylb)) == [0.0, -np.inf, -np.inf, 0.0]
    assert list(np.asarray(yub)) == [np.inf, 0.0, np.inf, 0.0]
    y = jnp.asarray([0.5, -0.5, 0.0, 0.0])
    ax = jnp.asarray([1.0, 1.0, 1.5, 1.0])
    s = np.asarray(dual_subgradient(lb, ub, y, ax))
    assert s[0] == 0.0  # y>0 -> lower bound
    assert s[1] == 5.0  # y<0 -> upper bound
    assert s[2] == 1.5  # y=0, ranged -> clip(ax, l, u)
    assert s[3] == 0.0  # y=0, free row


def test_adaptive_heuristic_solves_lp():
    from ortools_tpu.models.lp import QuadraticProgram
    from ortools_tpu.pdlp import PdhgParams, solve
    from ortools_tpu.pdlp.params import RestartStrategy

    rng = np.random.default_rng(9)
    m, n = 20, 30
    a = sp.random(m, n, density=0.4, random_state=rng, format="csr")
    x0 = rng.uniform(0, 1, n)
    qp = QuadraticProgram(
        objective_vector=rng.standard_normal(n),
        constraint_matrix=a,
        constraint_lower=a @ x0 - 0.3,
        constraint_upper=np.full(m, np.inf),
        variable_lower=np.zeros(n),
        variable_upper=np.ones(n),
    )
    res = solve(qp, PdhgParams(
        dtype=jnp.float64,
        restart_strategy=RestartStrategy.ADAPTIVE_HEURISTIC,
        eps_optimal_absolute=1e-7, eps_optimal_relative=1e-7,
        iteration_limit=100_000,
    ))
    from scipy.optimize import linprog
    ref = linprog(qp.objective_vector, A_ub=-a.toarray(),
                  b_ub=-qp.constraint_lower,
                  bounds=[(0, 1)] * n, method="highs")
    assert ref.status == 0
    assert res.termination_reason.name == "OPTIMAL"
    assert res.primal_objective == pytest.approx(ref.fun, abs=1e-5)
