"""CP presolve tests."""

import pytest

from ortools_tpu.sat import CpModel, CpSolver, INFEASIBLE, OPTIMAL
from ortools_tpu.sat.presolve import presolve_model
from ortools_tpu.utils.domain import Domain


def test_domain_reduction_recorded():
    m = CpModel()
    x = m.new_int_var(0, 100, "x")
    y = m.new_int_var(0, 100, "y")
    m.add(x + y <= 10)
    m.add(x >= 4)
    p = presolve_model(m.ir)
    assert p is not None
    assert p.variables[0].domain == Domain(4, 10)
    assert p.variables[1].domain == Domain(0, 6)


def test_entailed_constraints_removed():
    m = CpModel()
    x = m.new_int_var(0, 5, "x")
    y = m.new_int_var(0, 5, "y")
    m.add(x + y <= 100)  # entailed
    m.add(x + y <= 7)    # real
    b = m.new_bool_var("b")
    m.add_bool_or(b, ~b)  # tautology... not auto-detected; fix b free
    p = presolve_model(m.ir)
    kinds = [(c.kind, c.args) for c in p.constraints]
    # the entailed <=100 row is gone, the <=7 row stays
    linear = [c for c in p.constraints if c.kind == "linear"]
    assert len(linear) == 1


def test_duplicates_removed():
    m = CpModel()
    x = m.new_int_var(0, 5, "x")
    y = m.new_int_var(0, 5, "y")
    for _ in range(3):
        m.add(x + 2 * y <= 8)
    a, b = m.new_bool_var("a"), m.new_bool_var("b")
    for _ in range(2):
        m.add_bool_or(a, b)
    p = presolve_model(m.ir)
    assert len([c for c in p.constraints if c.kind == "linear"]) == 1
    assert len([c for c in p.constraints if c.kind == "bool_or"]) == 1


def test_false_enforcement_dropped():
    m = CpModel()
    b = m.new_bool_var("b")
    x = m.new_int_var(0, 5, "x")
    m.add(b == 0)
    m.add(x >= 4).only_enforce_if(b)  # never active
    p = presolve_model(m.ir)
    assert p is not None
    # x's domain unchanged (constraint inactive)
    assert p.variables[1].domain == Domain(0, 5)
    assert not any(
        c.enforcement_literals for c in p.constraints
    )


def test_root_infeasibility():
    m = CpModel()
    x = m.new_int_var(0, 5, "x")
    m.add(x >= 3)
    m.add(x <= 2)
    assert presolve_model(m.ir) is None


def test_solver_with_presolve_matches_without():
    def build():
        m = CpModel()
        xs = [m.new_int_var(0, 9, f"x{i}") for i in range(8)]
        m.add_all_different(xs[:5])
        for i in range(7):
            m.add(xs[i] + xs[i + 1] <= 12)
        m.add(xs[0] + 2 * xs[3] >= 6)
        m.maximize(sum(xs))
        return m

    m1, m2 = build(), build()
    s1 = CpSolver()
    s1.parameters.cp_model_presolve = False
    s2 = CpSolver()
    assert s1.solve(m1) == OPTIMAL
    assert s2.solve(m2) == OPTIMAL
    assert s1.objective_value == s2.objective_value


def test_probing_fixes_failed_literal():
    """b=1 forces a conflict via chained implications -> probing fixes b=0
    at the root (reference probing.h FailedLiteralProbing)."""
    from ortools_tpu.sat.presolve import probe_binaries
    m = CpModel()
    b = m.new_bool_var("b")
    x = m.new_int_var(0, 10, "x")
    # b -> x >= 8 and b -> x <= 3: b must be false
    m.add(x >= 8).only_enforce_if(b)
    m.add(x <= 3).only_enforce_if(b)
    out = probe_binaries(m.ir)
    assert out is not None
    assert out.variables[b.index].domain.is_fixed()
    assert out.variables[b.index].domain.fixed_value() == 0


def test_probing_detects_infeasible():
    from ortools_tpu.sat.presolve import probe_binaries
    m = CpModel()
    b = m.new_bool_var("b")
    x = m.new_int_var(0, 10, "x")
    m.add(x >= 8).only_enforce_if(b)
    m.add(x <= 3).only_enforce_if(b)
    m.add(x >= 8).only_enforce_if(b.negated())
    m.add(x <= 3).only_enforce_if(b.negated())
    assert probe_binaries(m.ir) is None


def test_clique_merging_builds_bigger_amo():
    """Three pairwise exclusions merge into one at_most_one of size 3."""
    from ortools_tpu.sat.presolve import merge_cliques
    m = CpModel()
    a = m.new_bool_var("a")
    b = m.new_bool_var("b")
    c = m.new_bool_var("c")
    m.add_at_most_one([a, b])
    m.add_at_most_one([b, c])
    m.add_at_most_one([a, c])
    out = merge_cliques(m.ir)
    amos = [ct for ct in out.constraints if ct.kind == "at_most_one"]
    assert any(len(ct.args.literals) >= 3 for ct in amos)
    # and the merged model is equivalent: at most one of a,b,c true
    from ortools_tpu.sat.cp_model import CpSolver
    s = CpSolver()
    m.maximize(a + b + c)
    assert s.status_name(s.solve(m)) == "OPTIMAL"
    assert s.objective_value == 1
