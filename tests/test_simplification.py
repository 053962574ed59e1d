"""SAT presolve (BVE + subsumption, reference simplification.cc):
equisatisfiability and model reconstruction, randomized vs brute force."""

import itertools

import numpy as np
import pytest

from ortools_tpu.sat.simplification import presolve_cnf


def _sat_brute(clauses, n):
    for bits in itertools.product([0, 1], repeat=n):
        if all(any((bits[abs(l) - 1] == 1) == (l > 0) for l in c)
               for c in clauses):
            return list(bits)
    return None


def _check_model(clauses, model):
    return all(any((model[abs(l) - 1] == 1) == (l > 0) for l in c)
               for c in clauses)


def test_unit_propagation_and_unsat():
    out = presolve_cnf([[1], [-1, 2], [-2]], 2)
    assert out.unsat
    out2 = presolve_cnf([[1], [-1, 2]], 2)
    assert not out2.unsat
    assert out2.fixed.get(0) is True
    # v1 is either fixed by the follow-up unit or BVE-eliminated as a
    # pure literal; reconstruction must satisfy the original clauses
    assert out2.clauses == []
    full = out2.reconstruct([0, 0])
    assert full[0] == 1 and full[1] == 1


def test_subsumption_removes_superset():
    out = presolve_cnf([[1, 2], [1, 2, 3], [1, 2, -3]], 3)
    assert not out.unsat
    # [1,2] subsumes both others (directly or via self-subsumption)
    assert all(len(c) <= 2 for c in out.clauses) or len(out.clauses) <= 1


@pytest.mark.parametrize("seed", range(25))
def test_presolve_preserves_satisfiability(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 8))
    m = int(rng.integers(3, 18))
    clauses = []
    for _ in range(m):
        k = int(rng.integers(1, 4))
        vs = rng.choice(n, size=min(k, n), replace=False)
        clauses.append([int((v + 1) * rng.choice([-1, 1])) for v in vs])
    ref = _sat_brute(clauses, n)
    out = presolve_cnf(clauses, n)
    if out.unsat:
        assert ref is None, (clauses, ref)
        return
    red_model = _sat_brute(out.clauses, n)
    if ref is None:
        assert red_model is None or not _check_model(
            clauses, out.reconstruct(red_model)), clauses
        return
    assert red_model is not None, (clauses, out.clauses)
    full = out.reconstruct(red_model)
    assert _check_model(clauses, full), (clauses, out.clauses, full)


def test_pure_sat_path_with_presolve():
    from ortools_tpu.sat.cp_model import CpModel, CpSolver
    m = CpModel()
    xs = [m.new_bool_var(f"x{i}") for i in range(9)]
    for i in range(8):
        m.add_bool_or(xs[i].negated(), xs[i + 1])
    m.add_bool_or(xs[0])
    s = CpSolver()
    st = s.solve(m)
    assert s.status_name(st) == "OPTIMAL"
    assert all(s.boolean_value(x) for x in xs)
