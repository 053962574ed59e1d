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
    # domain reduction [4,10]/[0,6]; dual fixing may then pin variables
    # at a bound (no objective: any feasible point is as good as another)
    assert Domain(4, 10).contains(p.variables[0].domain.min())
    assert Domain(4, 10).contains(p.variables[0].domain.max())
    assert Domain(0, 6).contains(p.variables[1].domain.min())
    assert Domain(0, 6).contains(p.variables[1].domain.max())


def test_entailed_constraints_removed():
    m = CpModel()
    x = m.new_int_var(0, 5, "x")
    y = m.new_int_var(0, 5, "y")
    m.add(x + y <= 100)  # entailed
    m.add(x + y <= 7)    # real
    b = m.new_bool_var("b")
    m.add_bool_or(b, ~b)  # tautology... not auto-detected; fix b free
    p = presolve_model(m.ir)
    # the entailed <=100 row is gone, the <=7 row stays (x/y are
    # interchangeable, so presolve may also add a symmetry_break row)
    linear = [c for c in p.constraints
              if c.kind == "linear" and c.name != "symmetry_break"]
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
    assert len([c for c in p.constraints if c.kind == "linear"
                and c.name != "symmetry_break"]) == 1
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


def test_diophantine_gcd_reduction():
    # 6x + 9y == 10 has gcd 3 not dividing 10 -> infeasible at presolve
    m = CpModel()
    x = m.new_int_var(-10, 10, "x")
    y = m.new_int_var(-10, 10, "y")
    m.add(6 * x + 9 * y == 10)
    out = presolve_model(m.ir)
    assert out is None or CpSolver().solve(m) == INFEASIBLE
    s = CpSolver()
    assert s.solve(m) == INFEASIBLE


def test_diophantine_reduces_coefficients():
    # 4x + 6y in [2, 10] -> 2x + 3y in [1, 5]
    m = CpModel()
    x = m.new_int_var(0, 5, "x")
    y = m.new_int_var(0, 5, "y")
    m.add_linear_expression_in_domain(4 * x + 6 * y, Domain(2, 10))
    out = presolve_model(m.ir)
    lin = [ct for ct in out.constraints if ct.kind == "linear"]
    assert lin, "linear constraint should survive"
    a = lin[0].args
    assert sorted(abs(c) for c in a.coeffs) == [2, 3]
    assert a.domain.min() == 1 and a.domain.max() == 5
    # still solvable and consistent with the original model
    s = CpSolver()
    assert s.solve(m) in (OPTIMAL,)


def test_diophantine_enforced_infeasible_body_negates_enforcement():
    m = CpModel()
    b = m.new_bool_var("b")
    x = m.new_int_var(-10, 10, "x")
    y = m.new_int_var(-10, 10, "y")
    m.add(4 * x + 8 * y == 6).only_enforce_if(b)  # gcd 4, 6 % 4 != 0
    m.add(x + y >= -100)  # keep model nontrivial
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    assert s.boolean_value(b) is False


def test_setppc_clause_subsumption():
    from ortools_tpu.sat.presolve import setppc_dominance

    m = CpModel()
    a, b, c = (m.new_bool_var(n) for n in "abc")
    m.add_bool_or([a, b])          # S1
    m.add_bool_or([a, b, c])       # S2 superset -> dominated
    m.add_at_most_one([a, b, c])   # P1
    m.add_at_most_one([a, b])      # P2 subset -> dominated
    out = setppc_dominance(m.ir)
    kinds = [(ct.kind, tuple(sorted(ct.args.literals)))
             for ct in out.constraints]
    assert (("bool_or", (0, 1)) in kinds)
    assert (("bool_or", (0, 1, 2)) not in kinds)
    assert (("at_most_one", (0, 1, 2)) in kinds)
    assert (("at_most_one", (0, 1)) not in kinds)


def test_setppc_exactly_one_dominates_both_sides():
    from ortools_tpu.sat.presolve import setppc_dominance

    m = CpModel()
    a, b, c = (m.new_bool_var(n) for n in "abc")
    m.add_exactly_one([a, b])
    m.add_bool_or([a, b, c])      # implied by exactly_one subset
    m.add_at_most_one([a])        # NOT a strict subset domination target? {a} < {a,b} -> implied
    out = setppc_dominance(m.ir)
    kinds = [(ct.kind, tuple(sorted(ct.args.literals)))
             for ct in out.constraints]
    assert ("exactly_one", (0, 1)) in kinds
    assert ("bool_or", (0, 1, 2)) not in kinds
    assert ("at_most_one", (0,)) not in kinds


def test_setppc_solutions_preserved():
    import itertools

    m = CpModel()
    lits = [m.new_bool_var(f"b{i}") for i in range(4)]
    m.add_bool_or(lits[:2])
    m.add_bool_or(lits[:3])
    m.add_at_most_one(lits)
    m.add_at_most_one(lits[1:3])
    m.maximize(sum((i + 1) * l for i, l in enumerate(lits)))
    s = CpSolver()
    assert s.solve(m) == OPTIMAL
    # brute-force optimum: at_most_one over all 4, need one of first two
    best = max(
        sum((i + 1) * v for i, v in enumerate(assign))
        for assign in itertools.product([0, 1], repeat=4)
        if sum(assign) <= 1 and (assign[0] or assign[1])
        and sum(assign[1:3]) <= 1
    )
    assert s.objective_value == best


def test_pure_literal_fixing_sound():
    from ortools_tpu.sat.presolve import pure_literal_fixing

    m = CpModel()
    a, b, c = (m.new_bool_var(n) for n in "abc")
    x = m.new_int_var(0, 5, "x")
    m.add_bool_or([a, b])          # a appears only positively
    m.add_bool_or([a, c.negated()])  # c only negatively
    m.add(x + b >= 1)              # b also in a linear row: not pure
    out = pure_literal_fixing(m.ir)
    doms = [v.domain for v in out.variables]
    assert doms[a.index].is_fixed() and doms[a.index].fixed_value() == 1
    assert doms[c.index].is_fixed() and doms[c.index].fixed_value() == 0
    assert not doms[b.index].is_fixed()
    # the full solve stays satisfiable
    s = CpSolver()
    assert s.solve(m) in (OPTIMAL,)


def test_pure_literal_not_applied_when_enumerating():
    m = CpModel()
    a, b = m.new_bool_var("a"), m.new_bool_var("b")
    m.add_bool_or([a, b])
    s = CpSolver()
    s.parameters.enumerate_all_solutions = True
    count = [0]

    from ortools_tpu.sat import CpSolverSolutionCallback

    class Cb(CpSolverSolutionCallback):
        def on_solution_callback(self):
            count[0] += 1

    s.solve(m, Cb())
    assert count[0] == 3  # (1,0), (0,1), (1,1) — nothing pruned


def test_dual_bound_fixing_directed():
    """var_domination.cc DualBoundStrengthening core: direction-safe
    variables get fixed at the helpful bound."""
    from ortools_tpu.sat.presolve import dual_bound_fixing

    m = CpModel()
    x = m.new_int_var(0, 9, "x")
    y = m.new_int_var(0, 9, "y")
    z = m.new_int_var(0, 9, "z")
    m.add(x + y >= 7)   # raising x only relaxes (no upper bound)
    m.add(y + z <= 12)  # z capped above
    m.minimize(y - x + z)  # objective rewards large x, small z
    out = dual_bound_fixing(m.ir)
    assert out.variables[0].domain.is_fixed()
    assert out.variables[0].domain.min() == 9   # x -> max
    assert out.variables[2].domain.is_fixed()
    assert out.variables[2].domain.min() == 0   # z -> min (dn-safe)
    assert not out.variables[1].domain.is_fixed()  # y pulled both ways


def test_dual_bound_fixing_optimality_fuzz():
    """Random linear CP models: presolve with dual fixing preserves the
    OPTIMAL objective value (solved with and without presolve)."""
    import random

    from ortools_tpu.sat import CpSolver

    rng = random.Random(5)
    for trial in range(12):
        m = CpModel()
        nv = rng.randint(3, 6)
        xs = [m.new_int_var(0, rng.randint(2, 8), f"x{i}")
              for i in range(nv)]
        for _ in range(rng.randint(2, 5)):
            sel = rng.sample(range(nv), rng.randint(1, min(3, nv)))
            coeffs = [rng.choice([-3, -2, -1, 1, 2, 3]) for _ in sel]
            expr = sum(c * xs[v] for c, v in zip(coeffs, sel))
            kind = rng.random()
            if kind < 0.4:
                m.add(expr >= rng.randint(-5, 8))
            elif kind < 0.8:
                m.add(expr <= rng.randint(-2, 12))
            else:
                m.add(expr == rng.randint(0, 6))
        m.minimize(sum(rng.randint(-4, 4) * x for x in xs))

        s1 = CpSolver()
        s1.parameters.max_time_in_seconds = 20
        st1 = s1.solve(m)
        s2 = CpSolver()
        s2.parameters.max_time_in_seconds = 20
        s2.parameters.use_presolve = False
        st2 = s2.solve(m)
        n1, n2 = s1.status_name(st1), s2.status_name(st2)
        assert (n1 == "INFEASIBLE") == (n2 == "INFEASIBLE"), trial
        if n1 == "OPTIMAL" and n2 == "OPTIMAL":
            assert s1.objective_value == s2.objective_value, trial


# ---------------------------------------------------------------------------
# Wave 3: int_prod/int_div affine rewrites + AMO-aware linear tightening
# (reference cp_model_presolve.cc PresolveIntProd / PresolveIntDiv /
# DetectAndProcessAtMostOneInLinear)
# ---------------------------------------------------------------------------


def test_int_prod_constant_factor_becomes_linear():
    from ortools_tpu.sat.cp_model import CpModel, CpSolver
    from ortools_tpu.sat.presolve import presolve_model
    from ortools_tpu.sat import expand

    m = CpModel()
    x = m.new_int_var(0, 50, "x")
    k = m.new_int_var(3, 3, "k")  # fixed factor
    t = m.new_int_var(0, 200, "t")
    m.add_multiplication_equality(t, [k, x])
    m.add(x >= 7)
    m.minimize(t)
    work = presolve_model(expand.expand_model(m.ir))
    assert work is not None
    assert all(ct.kind != "int_prod" for ct in work.constraints), \
        "constant-factor product should have been linearized"
    s = CpSolver()
    assert s.status_name(s.solve(m)) == "OPTIMAL"
    assert s.value(t) == 21 and s.value(x) == 7


def test_int_div_fixed_divisor_becomes_linear():
    from ortools_tpu.sat.cp_model import CpModel, CpSolver
    from ortools_tpu.sat.presolve import presolve_model
    from ortools_tpu.sat import expand

    m = CpModel()
    x = m.new_int_var(0, 100, "x")
    t = m.new_int_var(0, 100, "t")
    m.add_division_equality(t, x, 7)
    m.add(x == 45)
    work = presolve_model(expand.expand_model(m.ir))
    assert work is not None
    assert all(ct.kind != "int_div" for ct in work.constraints), \
        "fixed-divisor division should have been linearized"
    s = CpSolver()
    assert s.status_name(s.solve(m)) in ("OPTIMAL", "FEASIBLE")
    assert s.value(t) == 45 // 7


def test_int_prod_div_rewrites_fuzz():
    """Rewritten models agree with brute force on all solutions."""
    import numpy as np
    from ortools_tpu.sat.cp_model import CpModel, CpSolver

    rng = np.random.default_rng(0)
    for trial in range(20):
        m = CpModel()
        x = m.new_int_var(0, 6, "x")
        kv = int(rng.integers(1, 5))
        k = m.new_int_var(kv, kv, "k")
        t = m.new_int_var(-5, 40, "t")
        if trial % 2 == 0:
            m.add_multiplication_equality(t, [k, x])
        else:
            m.add_division_equality(t, x, kv)
        w1 = int(rng.integers(1, 4))
        m.minimize(w1 * t - x)
        s = CpSolver()
        st = s.solve(m)
        assert s.status_name(st) == "OPTIMAL"
        best = None
        for xv in range(7):
            tv = kv * xv if trial % 2 == 0 else xv // kv
            if not (-5 <= tv <= 40):
                continue
            obj = w1 * tv - xv
            if best is None or obj < best:
                best = obj
        assert s.objective_value == best, (trial, s.objective_value, best)


def test_amo_aware_tightening_drops_entailed_row():
    from ortools_tpu.sat import model_ir as ir
    from ortools_tpu.sat.presolve import amo_aware_linear_tightening
    from ortools_tpu.utils.domain import Domain

    # x0+x1+x2 at_most_one; row: 3*x0 + 2*x1 + x2 <= 3 is entailed
    # clique-aware (max contribution 3) but NOT by plain activity (6)
    model = ir.CpModelIR(
        name="t",
        variables=[ir.IntegerVariableIR(f"x{i}", Domain(0, 1))
                   for i in range(3)],
        constraints=[
            ir.ConstraintIR("at_most_one", ir.BoolArgs([0, 1, 2])),
            ir.ConstraintIR("linear", ir.LinearArgs(
                [0, 1, 2], [3, 2, 1], Domain(-10**9, 3))),
        ],
    )
    out = amo_aware_linear_tightening(model)
    assert out is not None
    kinds = [ct.kind for ct in out.constraints]
    assert kinds.count("linear") == 0, "entailed row should be dropped"


def test_amo_aware_tightening_forces_variable():
    from ortools_tpu.sat import model_ir as ir
    from ortools_tpu.sat.presolve import amo_aware_linear_tightening
    from ortools_tpu.utils.domain import Domain

    # clique {x1, x2} contributes at most 2; row 5*x0 + 2*x1 + 2*x2 >= 6
    # forces x0 = 1 clique-aware (without x0: max 2 < 6)
    model = ir.CpModelIR(
        name="t",
        variables=[ir.IntegerVariableIR(f"x{i}", Domain(0, 1))
                   for i in range(3)],
        constraints=[
            ir.ConstraintIR("at_most_one", ir.BoolArgs([1, 2])),
            ir.ConstraintIR("linear", ir.LinearArgs(
                [0, 1, 2], [5, 2, 2], Domain(6, 10**9))),
        ],
    )
    out = amo_aware_linear_tightening(model)
    assert out is not None
    units = [ct for ct in out.constraints
             if ct.kind == "bool_or" and ct.args.literals == [0]]
    assert units, "x0 should be forced true"


# ---------------------------------------------------------------------------
# General binary variable domination (reference var_domination.h:36)
# ---------------------------------------------------------------------------


def test_binary_dominance_adds_implication():
    from ortools_tpu.sat import model_ir as ir
    from ortools_tpu.sat.presolve import binary_dominance

    # minimize 2*x0 + 3*x1 s.t. x0 + x1 >= 1: x0 dominates x1
    # (cheaper, same row coverage) -> clause (~x1 or x0)
    model = ir.CpModelIR(
        name="t",
        variables=[ir.IntegerVariableIR(f"x{i}", Domain(0, 1))
                   for i in range(2)],
        constraints=[ir.ConstraintIR("linear", ir.LinearArgs(
            [0, 1], [1, 1], Domain(1, 10**9)))],
        objective=ir.ObjectiveIR(vars=[0, 1], coeffs=[2, 3]),
    )
    out = binary_dominance(model)
    added = [ct for ct in out.constraints if ct.kind == "bool_or"]
    assert any(sorted(ct.args.literals) == sorted(
        [ir.negated_literal(1), 0]) for ct in added), added


def test_binary_dominance_preserves_optima_fuzz():
    """On random set-cover-like minimization models, presolve with
    dominance reaches the same optimal objective as without."""
    import numpy as np
    from ortools_tpu.sat.cp_model import CpModel, CpSolver

    rng = np.random.default_rng(4)
    for trial in range(10):
        n, m = 8, 5

        def build():
            mm = CpModel()
            xs = [mm.new_bool_var(f"x{i}") for i in range(n)]
            for r in range(m):
                members = rng.choice(n, size=int(rng.integers(2, 5)),
                                     replace=False)
                mm.add(sum(xs[int(j)] for j in members) >= 1)
            w = rng.integers(1, 9, n)
            mm.minimize(sum(int(w[i]) * xs[i] for i in range(n)))
            return mm

        state = rng.bit_generator.state
        m1 = build()
        s1 = CpSolver()
        assert s1.status_name(s1.solve(m1)) == "OPTIMAL"
        rng.bit_generator.state = state
        m2 = build()
        s2 = CpSolver()
        s2.parameters.cp_model_presolve = False
        assert s2.status_name(s2.solve(m2)) == "OPTIMAL"
        assert s1.objective_value == s2.objective_value, trial
