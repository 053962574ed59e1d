"""PB-resolution solver (_native/pbsat.cc + sat/pb_solver.py).

Reference role: ortools/sat/pb_constraint.h:526 ResolvePBConflict —
conflicts over PB constraints learn PB constraints by cutting-planes
resolution.  Validation strategy: brute force on small random instances
(decision + optimization), the pigeonhole separation witness, and the
overflow clause-fallback path forced via the test hook.
"""

import itertools
import math
import time

import numpy as np
import pytest

from ortools_tpu.sat.pb_solver import PbSolver, minimize, pigeonhole


def _random_instance(rng, force_guard=None):
    n = int(rng.integers(3, 9))
    m = int(rng.integers(2, 8))
    s = PbSolver(n)
    if force_guard is not None:
        s.set_overflow_guard(force_guard)
    rows = []
    for _ in range(m):
        k = int(rng.integers(1, n + 1))
        vs = rng.choice(n, size=k, replace=False)
        cf = rng.integers(-5, 6, size=k)
        cf[cf == 0] = 1
        neg = rng.random(k) < 0.4
        d = int(rng.integers(-6, 7))
        typ = int(rng.integers(0, 3))
        if typ == 0:
            s.add_geq(cf.tolist(), vs.tolist(), neg.tolist(), d)
        elif typ == 1:
            s.add_leq(cf.tolist(), vs.tolist(), neg.tolist(), d)
        else:
            s.add_eq(cf.tolist(), vs.tolist(), neg.tolist(), d)
        rows.append((typ, cf, vs, neg, d))
    return n, s, rows


def _brute_sat(n, rows):
    for bits in itertools.product([0, 1], repeat=n):
        x = np.array(bits)
        ok = True
        for typ, cf, vs, neg, d in rows:
            lv = np.where(neg, 1 - x[vs], x[vs])
            val = int(cf @ lv)
            if typ == 0 and val < d:
                ok = False
                break
            if typ == 1 and val > d:
                ok = False
                break
            if typ == 2 and val != d:
                ok = False
                break
        if ok:
            return True
    return False


@pytest.mark.parametrize("seed", range(4))
def test_pb_fuzz_vs_brute_force(seed):
    rng = np.random.default_rng(seed)
    for _ in range(60):
        n, s, rows = _random_instance(rng)
        st, model = s.solve(200_000)
        want = "SAT" if _brute_sat(n, rows) else "UNSAT"
        assert st == want
        if st == "SAT":
            assert model is not None  # verified inside solve()


@pytest.mark.parametrize("seed", range(3))
def test_pb_fuzz_with_forced_clause_fallback(seed):
    """Guard lowered to 1: nearly every conflict takes the 1UIP clause
    fallback — the overflow path must stay sound."""
    rng = np.random.default_rng(100 + seed)
    exercised = 0
    for _ in range(60):
        n, s, rows = _random_instance(rng, force_guard=1)
        st, model = s.solve(200_000)
        want = "SAT" if _brute_sat(n, rows) else "UNSAT"
        assert st == want
        exercised += s.num_clause_fallbacks
    # soundness is the assertion here; whether the guard trips depends
    # on the random instances.  test_fallback_triggers_deterministically
    # guarantees coverage of the path.
    del exercised


def test_pigeonhole_unsat_fast():
    """PHP(n+1, n): exponential for clause learning, closed by cutting
    planes in (here) a handful of conflicts."""
    for n in (8, 10, 12, 14):
        s = pigeonhole(n)
        t0 = time.perf_counter()
        st, _ = s.solve(1_000_000)
        dt = time.perf_counter() - t0
        assert st == "UNSAT"
        assert dt < 10.0, f"PHP({n}) took {dt:.1f}s"
        assert s.num_conflicts < 10_000


def test_pigeonhole_sat_case():
    for n in (6, 9):
        s = PbSolver(n * n)
        for i in range(n):
            s.add_geq([1] * n, [i * n + j for j in range(n)],
                      [False] * n, 1)
        for j in range(n):
            s.add_leq([1] * n, [i * n + j for i in range(n)],
                      [False] * n, 1)
        st, m = s.solve(1_000_000)
        assert st == "SAT"
        # verified permutation matrix
        g = m.reshape(n, n)
        assert (g.sum(axis=1) >= 1).all() and (g.sum(axis=0) <= 1).all()


@pytest.mark.parametrize("seed", range(2))
def test_pb_optimization_vs_brute_force(seed):
    rng = np.random.default_rng(200 + seed)
    for _ in range(25):
        n = int(rng.integers(3, 8))
        m = int(rng.integers(2, 6))
        s = PbSolver(n)
        rows = []
        for _ in range(m):
            k = int(rng.integers(1, n + 1))
            vs = rng.choice(n, size=k, replace=False)
            cf = rng.integers(1, 6, size=k)
            d = int(rng.integers(0, int(cf.sum()) + 1))
            s.add_geq(cf.tolist(), vs.tolist(), [False] * k, d)
            rows.append((cf, vs, d))
        w = rng.integers(1, 10, size=n)
        st, model, obj = minimize(s, w.tolist(), list(range(n)),
                                  deadline=time.perf_counter() + 20)
        best = math.inf
        for bits in itertools.product([0, 1], repeat=n):
            x = np.array(bits)
            if all(int(cf @ x[vs]) >= d for cf, vs, d in rows):
                best = min(best, int(w @ x))
        if math.isinf(best):
            assert st == "UNSAT"
        else:
            assert st == "OPTIMAL" and obj == best


def test_incremental_cutoffs_keep_learned():
    """Adding constraints between solves (the optimization pattern) must
    stay consistent."""
    s = PbSolver(6)
    s.add_geq([1] * 6, list(range(6)), [False] * 6, 3)
    st, m = s.solve()
    assert st == "SAT" and m.sum() >= 3
    s.add_leq([1] * 6, list(range(6)), [False] * 6, 3)
    st, m = s.solve()
    assert st == "SAT" and m.sum() == 3
    s.add_leq([1] * 6, list(range(6)), [False] * 6, 2)
    st, _ = s.solve()
    assert st == "UNSAT"


def test_fallback_triggers_deterministically():
    """PHP with guard=1 forces reason-to-clause reduction on every
    resolution (pure clause learning); PHP(5,4) is small enough for
    clauses to refute, and the path must be exercised."""
    s = pigeonhole(4)
    s.set_overflow_guard(1)
    st, _ = s.solve(500_000)
    assert st == "UNSAT"
    assert s.num_clause_fallbacks > 0, "guard=1 never took the fallback"
