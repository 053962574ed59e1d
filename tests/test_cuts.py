"""MIR + cover cut generation: validity (no integer point cut off) and
effectiveness (LP point separated, root bound improves).

Reference roles: ortools/sat/cuts.cc (MIR, knapsack cover cuts).
"""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import linprog

from ortools_tpu.mip.cuts import append_cuts, generate_cuts
from ortools_tpu.models.lp import QuadraticProgram


def _enumerate_integer_points(lb, ub):
    grids = [np.arange(int(l), int(u) + 1) for l, u in zip(lb, ub)]
    return np.array(np.meshgrid(*grids)).reshape(len(lb), -1).T


def _feasible_mask(a, cl, cu, pts, tol=1e-9):
    ax = pts @ np.asarray(a.todense()).T
    return np.all((ax >= cl - tol) & (ax <= cu + tol), axis=1)


@pytest.mark.parametrize("seed", range(8))
def test_cuts_never_remove_integer_points(seed):
    """Every generated cut must keep every integer-feasible point."""
    rng = np.random.default_rng(seed)
    n, m = 5, 4
    a = sp.csr_matrix(np.round(rng.normal(size=(m, n)) * 3))
    lb = np.zeros(n)
    ub = np.full(n, 3.0)
    x_ref = rng.integers(0, 4, size=n)  # ensure nonempty feasible set
    ax_ref = a @ x_ref
    cu = ax_ref + rng.integers(0, 5, size=m)
    cl = np.full(m, -np.inf)
    integrality = np.ones(n, dtype=bool)
    c = rng.normal(size=n)

    res = linprog(c, A_ub=a.todense(), b_ub=cu, bounds=list(zip(lb, ub)),
                  method="highs")
    assert res.status == 0
    x_lp = res.x

    pool = generate_cuts(a, cl, cu, lb, ub, integrality, x_lp,
                         min_violation=1e-6)
    if pool is None:
        return  # LP solution integral or no violated cut — fine
    pts = _enumerate_integer_points(lb, ub)
    feas = pts[_feasible_mask(a, cl, cu, pts)]
    assert len(feas)
    cut_ax = feas @ np.asarray(pool.rows.todense()).T
    assert np.all(cut_ax <= pool.rhs[None, :] + 1e-7), (
        "a cut removed an integer-feasible point")


def test_cover_cut_on_knapsack():
    # 3x1 + 4x2 + 5x3 <= 6, binaries; LP optimum of max x1+x2+x3 is
    # fractional; the cover cut must separate it.
    a = sp.csr_matrix(np.array([[3.0, 4.0, 5.0]]))
    cl = np.array([-np.inf])
    cu = np.array([6.0])
    lb = np.zeros(3)
    ub = np.ones(3)
    integrality = np.ones(3, dtype=bool)
    res = linprog([-1, -1, -1], A_ub=a.todense(), b_ub=cu,
                  bounds=[(0, 1)] * 3, method="highs")
    x_lp = res.x
    pool = generate_cuts(a, cl, cu, lb, ub, integrality, x_lp)
    assert pool is not None and pool.num_cuts >= 1
    viol = np.asarray(pool.rows @ x_lp) - pool.rhs
    assert viol.max() > 1e-5
    # All 8 binary points that satisfy the knapsack must survive.
    pts = _enumerate_integer_points(lb, ub)
    feas = pts[_feasible_mask(a, cl, cu, pts)]
    cut_ax = feas @ np.asarray(pool.rows.todense()).T
    assert np.all(cut_ax <= pool.rhs[None, :] + 1e-9)


def test_mir_closes_gap_on_simple_row():
    # 2x1 + 2x2 <= 3, integers in [0, 2]: LP allows x1+x2 = 1.5 but
    # integrally x1 + x2 <= 1.  MIR with delta=2 finds it.
    a = sp.csr_matrix(np.array([[2.0, 2.0]]))
    cl = np.array([-np.inf])
    cu = np.array([3.0])
    lb = np.zeros(2)
    ub = np.full(2, 2.0)
    integrality = np.ones(2, dtype=bool)
    x_lp = np.array([0.75, 0.75])  # on the LP facet
    pool = generate_cuts(a, cl, cu, lb, ub, integrality, x_lp,
                         min_violation=1e-6)
    assert pool is not None
    # Some cut must enforce x1 + x2 <= 1 (up to scaling).
    ok = False
    for k in range(pool.num_cuts):
        row = np.asarray(pool.rows[k].todense()).ravel()
        if np.all(row > 1e-9):
            # scaled row g*(x1+x2) <= d with d/g ~= 1
            ratio = pool.rhs[k] / row.max()
            if ratio < 1.5:
                ok = True
    assert ok


def test_append_cuts_and_root_bound_improves():
    """B&B root bound with cuts >= pure LP bound on a knapsack-like MIP."""
    rng = np.random.default_rng(7)
    n = 12
    w = rng.integers(3, 10, size=n).astype(float)
    cap = float(w.sum() // 3)
    c = -(w + rng.normal(scale=0.1, size=n))  # maximize value ~ weight
    a = sp.csr_matrix(w[None, :])
    qp = QuadraticProgram(
        objective_vector=c,
        constraint_matrix=a,
        constraint_lower=np.array([-np.inf]),
        constraint_upper=np.array([cap]),
        variable_lower=np.zeros(n),
        variable_upper=np.ones(n),
        integrality=np.ones(n, dtype=bool),
    )
    res = linprog(c, A_ub=a.todense(), b_ub=[cap], bounds=[(0, 1)] * n,
                  method="highs")
    lp_bound = res.fun
    x_lp = res.x
    pool = generate_cuts(a, qp.constraint_lower, qp.constraint_upper,
                         qp.variable_lower, qp.variable_upper,
                         qp.integrality, x_lp)
    if pool is None:
        pytest.skip("LP optimum already integral for this seed")
    qp2 = append_cuts(qp, pool)
    res2 = linprog(c, A_ub=qp2.constraint_matrix.todense(),
                   b_ub=qp2.constraint_upper,
                   bounds=[(0, 1)] * n, method="highs")
    assert res2.status == 0
    assert res2.fun >= lp_bound - 1e-9  # bound can only tighten
    # and the integer optimum is still feasible for the cut system
    from ortools_tpu.mip.branch_and_bound import solve as mip_solve
    mres = mip_solve(qp, max_nodes=2000, node_batch_size=8)
    x_int = mres.solution
    assert np.all(qp2.constraint_matrix @ x_int
                  <= qp2.constraint_upper + 1e-6)


@pytest.mark.parametrize("seed", range(12))
def test_lifted_cover_validity_exhaustive(seed):
    """Lifted cover cuts keep every binary-feasible point (brute force)."""
    rng = np.random.default_rng(100 + seed)
    n = 8
    w = rng.integers(2, 25, n).astype(float)
    cap = float(int(w.sum() * rng.uniform(0.3, 0.6)))
    a = sp.csr_matrix(w.reshape(1, -1))
    cl = np.array([-np.inf]); cu = np.array([cap])
    lb = np.zeros(n); ub = np.ones(n)
    # a fractional LP point near the boundary to trigger separation
    c = -rng.uniform(1, 10, n)
    from scipy.optimize import linprog
    r = linprog(c, A_ub=w.reshape(1, -1), b_ub=[cap],
                bounds=[(0, 1)] * n, method="highs")
    pool = generate_cuts(a, cl, cu, lb, ub, np.ones(n, dtype=bool), r.x)
    if pool is None:
        return
    pts = _enumerate_integer_points(lb, ub)
    feas = pts[w @ pts.T <= cap + 1e-9]
    g = pool.rows.toarray()
    assert np.all(feas @ g.T <= pool.rhs + 1e-6), "a cut removed a feasible point"


def test_lifting_strengthens_cover():
    """A heavy out-of-cover item gets a positive lifted coefficient."""
    from ortools_tpu.mip.cuts import _cover_on_row

    # weights: cover candidates 5,5,5 (cap 12) and a heavy item 11
    idx = np.arange(4)
    val = np.array([5.0, 5.0, 5.0, 11.0])
    lb = np.zeros(4); ub = np.ones(4)
    is_int = np.ones(4, dtype=bool)
    # LP point: x = (0.8, 0.8, 0.8, 0) violates the cover x1+x2+x3 <= 2
    x_lp = np.array([0.8, 0.8, 0.8, 0.0])
    out = _cover_on_row(idx, val, 12.0, lb, ub, is_int, x_lp, 1e-4)
    assert out is not None
    cidx, g, d = out
    coeff = dict(zip(cidx.tolist(), g.tolist()))
    # x4=1 leaves budget 1: nothing else fits -> alpha_4 = 2
    assert coeff.get(3, 0.0) >= 2.0 - 1e-9
    assert d == pytest.approx(2.0)


def test_odd_cycle_cut_on_5_cycle():
    """x = 0.5 on a 5-cycle conflict graph is cut by sum x <= 2."""
    from ortools_tpu.mip.cuts import _odd_cycle_cuts

    n = 5
    rows, cols, vals = [], [], []
    for r, (u, v) in enumerate([(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]):
        rows += [r, r]; cols += [u, v]; vals += [1.0, 1.0]
    a = sp.csr_matrix((vals, (rows, cols)), shape=(5, n))
    cu = np.ones(5)
    x = np.full(n, 0.5)
    cuts = _odd_cycle_cuts(a, cu, np.zeros(n), np.ones(n),
                           np.ones(n, dtype=bool), x, 1e-4)
    assert cuts, "no odd-cycle cut found at the half-integral point"
    viol, cidx, cval, rhs = cuts[0]
    # normalized sum_{C} x <= (|C|-1)/2 with |C| = 5
    assert len(cidx) == 5
    assert float(cval @ x[cidx]) > rhs + 1e-5
    # validity: every stable set of the 5-cycle satisfies it
    import itertools
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]
    for bits in itertools.product([0, 1], repeat=n):
        if any(bits[u] + bits[v] > 1 for u, v in edges):
            continue
        assert float(cval @ np.asarray(bits, float)[cidx]) <= rhs + 1e-9


def test_odd_cycle_improves_edge_packing_root():
    """Root LP bound tightens with odd-cycle cuts on a small packing."""
    rng = np.random.default_rng(3)
    n_nodes, n_edges = 9, 14
    edges = set()
    while len(edges) < n_edges:
        u, v = rng.integers(0, n_nodes, 2)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    edges = sorted(edges)
    rows, cols, vals = [], [], []
    for r, (u, v) in enumerate(edges):
        rows += [r, r]; cols += [int(u), int(v)]; vals += [1.0, 1.0]
    a = sp.csr_matrix((vals, (rows, cols)), shape=(len(edges), n_nodes))
    cl = np.full(len(edges), -np.inf); cu = np.ones(len(edges))
    lb = np.zeros(n_nodes); ub = np.ones(n_nodes)
    c = -np.ones(n_nodes)  # max stable set
    r0 = linprog(c, A_ub=a.toarray(), b_ub=cu, bounds=[(0, 1)] * n_nodes,
                 method="highs")
    pool = generate_cuts(a, cl, cu, lb, ub, np.ones(n_nodes, dtype=bool),
                         r0.x)
    if pool is None:
        return  # LP integral already
    qp = QuadraticProgram(
        objective_vector=c, constraint_matrix=a, constraint_lower=cl,
        constraint_upper=cu, variable_lower=lb, variable_upper=ub)
    cut_qp = append_cuts(qp, pool)
    r1 = linprog(c, A_ub=sp.csr_matrix(cut_qp.constraint_matrix).toarray(),
                 b_ub=cut_qp.constraint_upper,
                 bounds=[(0, 1)] * n_nodes, method="highs")
    assert r1.fun >= r0.fun - 1e-9  # bound never loosens
    # validity: optimal integer solution survives
    from scipy.optimize import milp, LinearConstraint, Bounds
    mi = milp(c, constraints=LinearConstraint(a, cl, cu),
              bounds=Bounds(lb, ub), integrality=np.ones(n_nodes))
    g = pool.rows.toarray()
    assert np.all(g @ mi.x <= pool.rhs + 1e-6)


def test_zero_half_triangle():
    """{0,1/2}-CG separation (reference sat/zero_half_cuts.h:40): the
    triangle x_i + x_j <= 1 at the (1/2,1/2,1/2) LP point yields
    x1 + x2 + x3 <= 1."""
    import numpy as np
    import scipy.sparse as sp

    from ortools_tpu.mip.cuts import _zero_half_cuts

    a = sp.csr_matrix(np.array([[1, 1, 0], [0, 1, 1], [1, 0, 1]],
                               dtype=float))
    out = _zero_half_cuts(
        a, np.full(3, -np.inf), np.ones(3), np.zeros(3), np.ones(3),
        np.ones(3, bool), np.array([0.5, 0.5, 0.5]), 1e-4)
    assert out
    viol, gi, gv, gr = out[0]
    # normalized x1+x2+x3 <= 1
    np.testing.assert_allclose(gv / gv[0], np.ones(3))
    np.testing.assert_allclose(gr / gv[0], 1.0)


def test_zero_half_with_bound_rows():
    """Parity completion through a near-tight bound row: the aggregated
    row needs x3 <= 1 to vanish mod 2."""
    import numpy as np
    import scipy.sparse as sp

    from ortools_tpu.mip.cuts import _zero_half_cuts

    # row 2x1 + x2 <= 2 plus the bound row x2 <= 1:
    # sum = 2x1 + 2x2 <= 3  ->  x1 + x2 <= 1
    a = sp.csr_matrix(np.array([[2, 1]], dtype=float))
    x = np.array([0.55, 0.9])  # row slack 0, bound slack 0.1
    out = _zero_half_cuts(
        a, np.full(1, -np.inf), np.array([2.0]), np.zeros(2),
        np.ones(2), np.ones(2, bool), x, 1e-4)
    assert out, "bound-row-completed zero-half cut not found"
    viol, gi, gv, gr = out[0]
    assert set(gi.tolist()) == {0, 1}
    np.testing.assert_allclose(gv / gv[0], np.ones(2))
    np.testing.assert_allclose(gr / gv[0], 1.0)


# ---------------------------------------------------------------------------
# Flow-cover cuts (reference role: sat/cuts.cc flow covers,
# Padberg-Van Roy-Wolsey single-node fixed-charge inequalities)
# ---------------------------------------------------------------------------


def _snf_instance(rng, k):
    """A single-node flow set: sum f_j <= b, f_j <= cap_j y_j.
    Variables ordered [f_0..f_{k-1}, y_0..y_{k-1}]."""
    cap = rng.integers(3, 12, k).astype(float)
    b = float(np.floor(cap.sum() * rng.uniform(0.4, 0.8)))
    rows, cols, vals = [], [], []
    # row 0: sum f <= b
    for j in range(k):
        rows.append(0); cols.append(j); vals.append(1.0)
    cl = [-np.inf]
    cu = [b]
    # VUB rows: f_j - cap_j y_j <= 0
    for j in range(k):
        r = 1 + j
        rows.append(r); cols.append(j); vals.append(1.0)
        rows.append(r); cols.append(k + j); vals.append(-cap[j])
        cl.append(-np.inf); cu.append(0.0)
    a = sp.csr_matrix((vals, (rows, cols)), shape=(1 + k, 2 * k))
    lb = np.zeros(2 * k)
    ub = np.concatenate([cap, np.ones(k)])
    integ = np.zeros(2 * k, dtype=bool)
    integ[k:] = True
    return a, np.array(cl), np.array(cu), lb, ub, integ, cap, b


@pytest.mark.parametrize("seed", range(6))
def test_flow_cover_validity_exhaustive(seed):
    """For every binary y, the flow-cover cut must hold at the f-vertex
    maximizing the cut LHS (checked by LP over the true feasible set)."""
    rng = np.random.default_rng(100 + seed)
    k = 5
    a, cl, cu, lb, ub, integ, cap, b = _snf_instance(rng, k)
    # an LP point that typically violates flow covers: saturate cheap
    # arcs fractionally
    y_frac = rng.uniform(0.2, 0.95, k)
    f_pt = np.minimum(cap * y_frac, cap)
    # scale f down to satisfy sum f <= b
    if f_pt.sum() > b:
        f_pt *= b / f_pt.sum() * 0.999
        y_frac = np.minimum(1.0, f_pt / cap + 1e-9)
    x_lp = np.concatenate([f_pt, y_frac])
    pool = generate_cuts(a, cl, cu, lb, ub, integ, x_lp,
                         max_cuts=30, min_violation=1e-6)
    if pool is None:
        return  # nothing separated at this point — fine
    rows = pool.rows.toarray()
    for yv in np.array(np.meshgrid(*[[0, 1]] * k)).reshape(k, -1).T:
        ubi = np.concatenate([cap * yv, yv.astype(float)])
        lbi = np.concatenate([np.zeros(k), yv.astype(float)])
        for g, d in zip(rows, pool.rhs):
            # maximize g.x over {sum f <= b, 0 <= f <= cap*y, y = yv}
            res = linprog(-g, A_ub=np.ones((1, 2 * k)) * (np.arange(2 * k)
                          < k), b_ub=[b], bounds=list(zip(lbi, ubi)),
                          method="highs")
            assert res.status == 0
            assert -res.fun <= d + 1e-7, (
                f"flow cover cut violated at y={yv}: {-res.fun} > {d}")


def test_flow_cover_separates_fractional_point():
    """The canonical example: 2 arcs cap 10 each, b = 15; LP point
    f = (10, 5), y = (1, 0.5) violates the cover {1,2}:
    f1 + f2 + 5(1-y1) + 5(1-y2) <= 15."""
    k = 2
    cap = np.array([10.0, 10.0])
    b = 15.0
    rows, cols, vals = [], [], []
    for j in range(k):
        rows.append(0); cols.append(j); vals.append(1.0)
    for j in range(k):
        r = 1 + j
        rows.append(r); cols.append(j); vals.append(1.0)
        rows.append(r); cols.append(k + j); vals.append(-cap[j])
    a = sp.csr_matrix((vals, (rows, cols)), shape=(1 + k, 2 * k))
    cl = np.array([-np.inf] * 3)
    cu = np.array([b, 0.0, 0.0])
    lb = np.zeros(4)
    ub = np.array([10.0, 10.0, 1.0, 1.0])
    integ = np.array([False, False, True, True])
    x_lp = np.array([10.0, 5.0, 1.0, 0.5])
    pool = generate_cuts(a, cl, cu, lb, ub, integ, x_lp,
                         max_cuts=10, min_violation=1e-6)
    assert pool is not None
    # some returned cut must cut off the LP point
    viol = pool.rows @ x_lp - pool.rhs
    assert viol.max() > 1e-6


def test_flow_cover_improves_fixed_charge_root():
    """Root LP bound improves on a small fixed-charge instance."""
    from ortools_tpu.models.mip_generators import fixed_charge

    qp = fixed_charge(30, seed=7).as_minimization()
    a = sp.csr_matrix(qp.constraint_matrix)
    c = qp.objective_vector
    bounds = list(zip(qp.variable_lower, qp.variable_upper))
    import scipy.optimize as sopt
    res = sopt.linprog(
        c, A_ub=sp.vstack([a, -a]).toarray(),
        b_ub=np.concatenate([
            np.where(np.isfinite(qp.constraint_upper),
                     qp.constraint_upper, 1e12),
            np.where(np.isfinite(qp.constraint_lower),
                     -qp.constraint_lower, 1e12)]),
        bounds=bounds, method="highs")
    assert res.status == 0
    x_lp = res.x
    root0 = res.fun
    pool = generate_cuts(a, qp.constraint_lower, qp.constraint_upper,
                         qp.variable_lower, qp.variable_upper,
                         np.asarray(qp.integrality, dtype=bool), x_lp,
                         max_cuts=60, min_violation=1e-5)
    assert pool is not None
    qp2 = append_cuts(qp, pool)
    a2 = sp.csr_matrix(qp2.constraint_matrix)
    res2 = sopt.linprog(
        qp2.objective_vector,
        A_ub=sp.vstack([a2, -a2]).toarray(),
        b_ub=np.concatenate([
            np.where(np.isfinite(qp2.constraint_upper),
                     qp2.constraint_upper, 1e12),
            np.where(np.isfinite(qp2.constraint_lower),
                     -qp2.constraint_lower, 1e12)]),
        bounds=list(zip(qp2.variable_lower, qp2.variable_upper)),
        method="highs")
    assert res2.status == 0
    assert res2.fun > root0 + 1e-6, (
        f"flow covers did not move the fixed-charge root bound "
        f"({root0} -> {res2.fun})")


# ---------------------------------------------------------------------------
# Implied-bound substitution (reference implied_bounds.h): offset VUB/VLB
# expressions replace continuous terms inside MIR/cover derivations
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(6))
def test_implied_bound_substitution_validity(seed):
    """Mixed models with 2-var implied-bound rows: no cut may remove a
    feasible mixed-integer point (continuous part checked by LP)."""
    rng = np.random.default_rng(300 + seed)
    nb, nc = 3, 2  # binaries, continuous
    n = nb + nc
    rows, cl, cu = [], [], []
    # implied-bound rows: f_k <= u0 + du*y (u0 > 0 -> offset form)
    for k in range(nc):
        y = rng.integers(0, nb)
        u0 = float(rng.integers(1, 4))
        du = float(rng.integers(1, 5))
        r = np.zeros(n)
        r[nb + k] = 1.0
        r[y] = -du
        rows.append(r); cl.append(-np.inf); cu.append(u0)
    # general mixed rows
    for _ in range(3):
        r = np.round(rng.normal(size=n) * 2)
        rows.append(r); cl.append(-np.inf)
        cu.append(float(rng.integers(2, 8)))
    a = sp.csr_matrix(np.array(rows))
    lb = np.zeros(n)
    ub = np.concatenate([np.ones(nb), np.full(nc, 10.0)])
    integrality = np.array([True] * nb + [False] * nc)
    x_lp = np.concatenate([rng.uniform(0, 1, nb), rng.uniform(0, 3, nc)])
    pool = generate_cuts(a, np.array(cl), np.array(cu), lb, ub,
                         integrality, x_lp, max_cuts=40,
                         min_violation=1e-6)
    if pool is None:
        return
    grows = pool.rows.toarray()
    # for every binary assignment with a continuous-feasible completion,
    # the cut must admit the LP-optimal completion maximizing each cut
    from scipy.optimize import linprog
    import itertools as it
    for bits in it.product([0, 1], repeat=nb):
        for g, d in zip(grows, pool.rhs):
            # maximize g.x s.t. original rows, binaries fixed
            bnds = ([(b, b) for b in bits]
                    + [(0.0, 10.0)] * nc)
            res = linprog(-g, A_ub=a.toarray(), b_ub=np.array(cu),
                          bounds=bnds, method="highs")
            if res.status != 0:
                continue  # binary pattern infeasible: nothing to keep
            assert -res.fun <= d + 1e-6, (bits, -res.fun, d)


def test_offset_vub_strengthens_root():
    """f <= 2 + 5y with cost structure the plain-VUB code could not
    see: the substituted MIR/cover must cut the fractional point."""
    # min -f s.t. f <= 2 + 5y, f + 3y <= 6;  LP relax: y=4/5... build a
    # point violating the substituted row family
    a = sp.csr_matrix(np.array([[1.0, -5.0], [1.0, 3.0]]))
    cl = np.array([-np.inf, -np.inf])
    cu = np.array([2.0, 6.0])
    lb = np.zeros(2)
    ub = np.array([10.0, 1.0])
    integrality = np.array([False, True])
    x_lp = np.array([4.5, 0.5])  # fractional y, f at its implied cap
    pool = generate_cuts(a, cl, cu, lb, ub, integrality, x_lp,
                         max_cuts=10, min_violation=1e-6)
    assert pool is not None
    viol = pool.rows @ x_lp - pool.rhs
    assert viol.max() > 1e-6
    # validity at both y values
    for yv in (0.0, 1.0):
        fmax = min(2.0 + 5.0 * yv, 6.0 - 3.0 * yv, 10.0)
        for g, d in zip(pool.rows.toarray(), pool.rhs):
            val = max(g[0] * 0.0, g[0] * fmax) + g[1] * yv
            assert val <= d + 1e-9
