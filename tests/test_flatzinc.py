"""FlatZinc front-end tests."""

import pytest

from ortools_tpu.flatzinc import solve_fzn_text
from ortools_tpu.flatzinc.driver import FlatZincError, parse_fzn
from ortools_tpu.utils.status import SolveStatus


def test_simple_satisfy():
    fzn = """
var 1..5: x :: output_var;
var 1..5: y :: output_var;
constraint int_lin_eq([1, 1], [x, y], 7);
constraint int_lt(x, y);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    assert "----------" in r.text
    vals = dict(
        ln.replace(";", "").split(" = ")
        for ln in r.text.splitlines() if " = " in ln
    )
    assert int(vals["x"]) + int(vals["y"]) == 7
    assert int(vals["x"]) < int(vals["y"])


def test_minimize_with_arrays():
    fzn = """
array [1..3] of var 0..10: xs :: output_array([1..3]);
constraint int_lin_le([-1, -1, -1], [xs[1], xs[2], xs[3]], -6);
constraint all_different_int(xs);
solve minimize xs[3];
"""
    r = solve_fzn_text(fzn)
    assert r.status == SolveStatus.OPTIMAL
    assert "==========" in r.text
    assert r.objective == 0.0  # xs3=0, xs1+xs2>=6 possible with 0 in mix


def test_reified_and_bools():
    fzn = """
var bool: b :: output_var;
var 0..10: x :: output_var;
constraint int_le_reif(x, 3, b);
constraint int_lin_eq([1], [x], 7);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    vals = dict(
        ln.replace(";", "").split(" = ")
        for ln in r.text.splitlines() if " = " in ln
    )
    assert int(vals["x"]) == 7 and int(vals["b"]) == 0


def test_element_and_max():
    fzn = """
array [1..4] of int: costs = [10, 3, 7, 5];
var 1..4: i :: output_var;
var 0..100: c :: output_var;
constraint array_int_element(i, costs, c);
solve minimize c;
"""
    r = solve_fzn_text(fzn)
    assert r.status == SolveStatus.OPTIMAL
    assert r.objective == 3.0


def test_unsat():
    fzn = """
var 0..1: x;
constraint int_lin_eq([1], [x], 5);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status == SolveStatus.INFEASIBLE
    assert "UNSATISFIABLE" in r.text


def test_table_and_set_in():
    fzn = """
var 0..5: x :: output_var;
var 0..5: y :: output_var;
constraint table_int([x, y], [1, 2, 3, 4, 5, 0]);
constraint set_in(x, {3, 5});
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    vals = dict(
        ln.replace(";", "").split(" = ")
        for ln in r.text.splitlines() if " = " in ln
    )
    assert (int(vals["x"]), int(vals["y"])) in [(3, 4), (5, 0)]


def test_unknown_predicate():
    with pytest.raises(FlatZincError, match="unsupported FlatZinc"):
        parse_fzn("""
var 1..2: x;
constraint frobnicate(x);
solve satisfy;
""")


def test_nqueens_fzn():
    # 4-queens in flatzinc style (minizinc-compiled shape)
    fzn = """
array [1..4] of var 1..4: q :: output_array([1..4]);
constraint all_different_int(q);
constraint all_different_int([q[1], q[2], q[3], q[4]]);
constraint int_lin_ne([1, -1], [q[1], q[2]], 1);
constraint int_lin_ne([1, -1], [q[1], q[2]], -1);
constraint int_lin_ne([1, -1], [q[1], q[3]], 2);
constraint int_lin_ne([1, -1], [q[1], q[3]], -2);
constraint int_lin_ne([1, -1], [q[1], q[4]], 3);
constraint int_lin_ne([1, -1], [q[1], q[4]], -3);
constraint int_lin_ne([1, -1], [q[2], q[3]], 1);
constraint int_lin_ne([1, -1], [q[2], q[3]], -1);
constraint int_lin_ne([1, -1], [q[2], q[4]], 2);
constraint int_lin_ne([1, -1], [q[2], q[4]], -2);
constraint int_lin_ne([1, -1], [q[3], q[4]], 1);
constraint int_lin_ne([1, -1], [q[3], q[4]], -1);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    import re
    m = re.search(r"\[([0-9, ]+)\]", r.text)
    q = [int(x) for x in m.group(1).split(",")]
    assert sorted(q) == [1, 2, 3, 4]


def test_float_linear_constraints():
    """float_* builtins via exact fixed-point scaling (reference
    cp_model_fz_solver float handling)."""
    text = """
var 0.0..10.0: x :: output_var;
var 0.0..10.0: y :: output_var;
constraint float_lin_eq([1.5, 2.5], [x, y], 10.0);
constraint float_le(x, 2.0);
constraint float_lin_le([-1.0], [y], -2.8);
solve satisfy;
"""
    out = solve_fzn_text(text).text
    assert "----------" in out
    vals = {}
    for line in out.splitlines():
        if "=" in line:
            k, v = line.split("=")
            vals[k.strip()] = float(v.strip().rstrip(";"))
    assert abs(1.5 * vals["x"] + 2.5 * vals["y"] - 10.0) < 1e-5
    assert vals["x"] <= 2.0 + 1e-9
    assert vals["y"] >= 2.8 - 1e-9


def test_int2float_and_float_plus():
    text = """
var 0..5: n :: output_var;
var 0.0..20.0: f :: output_var;
var 0.0..30.0: g :: output_var;
constraint int2float(n, f);
constraint float_plus(f, f, g);
constraint float_eq(g, 6.0);
solve satisfy;
"""
    out = solve_fzn_text(text).text
    assert "n = 3;" in out


def test_element_and_count_builtins():
    text = """
array [1..4] of var 1..3: xs :: output_array([1..4]);
var 1..4: i;
var 1..3: t :: output_var;
constraint array_var_int_element(i, xs, t);
constraint int_eq(i, 2);
constraint int_eq(t, 3);
var 0..4: c :: output_var;
constraint count_eq(xs, 3, c);
constraint int_le(c, 1);
solve satisfy;
"""
    out = solve_fzn_text(text).text
    assert "t = 3;" in out
    assert "c = 1;" in out


def test_set_in_reif():
    text = """
var 0..10: x :: output_var;
var bool: b;
constraint set_in_reif(x, 3..5, b);
constraint bool_clause([], [b]);
constraint int_le(x, 4);
solve satisfy;
"""
    # b must be false -> x not in 3..5 and x <= 4
    out = solve_fzn_text(text).text
    val = int(out.splitlines()[0].split("=")[1].strip().rstrip(";"))
    assert val <= 4 and not (3 <= val <= 5)


def _values(r):
    import re as _re

    out = {}
    for ln in r.text.splitlines():
        if " = " not in ln:
            continue
        k, v = ln.replace(";", "").split(" = ", 1)
        m = _re.match(r"array1d\(\s*(-?\d+)\.\.-?\d+,\s*\[(.*)\]\s*\)", v)
        if m:
            base = int(m.group(1))
            for off, tok in enumerate(m.group(2).split(",")):
                out[f"{k}[{base + off}]"] = int(tok.strip())
        elif v.lstrip("-").isdigit():
            out[k] = int(v)
    return out


def test_cumulative_builtin():
    fzn = """
var 0..10: s1 :: output_var;
var 0..10: s2 :: output_var;
var 0..10: s3 :: output_var;
constraint fzn_cumulative([s1, s2, s3], [3, 3, 3], [2, 2, 2], 3);
solve minimize s3;
"""
    r = solve_fzn_text(fzn)
    assert r.status == SolveStatus.OPTIMAL
    v = _values(r)
    # capacity 3 with demands 2: no two tasks overlap; spans must be
    # pairwise disjoint, so some task starts at >= 6... s3 minimized = 0
    starts = sorted([v["s1"], v["s2"], v["s3"]])
    assert starts[1] >= starts[0] + 3 and starts[2] >= starts[1] + 3


def test_diffn_builtin():
    fzn = """
var 0..2: x1 :: output_var;
var 0..2: y1 :: output_var;
var 0..2: x2 :: output_var;
var 0..2: y2 :: output_var;
constraint fzn_diffn([x1, x2], [y1, y2], [2, 2], [2, 2]);
constraint int_le(x1, 0);
constraint int_le(x2, 0);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    v = _values(r)
    # both 2x2 boxes pinned to x=0: they must separate vertically
    assert abs(v["y1"] - v["y2"]) >= 2


def test_circuit_builtin():
    fzn = """
array [1..4] of var 1..4: s :: output_array([1..4]);
constraint fzn_circuit(s);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    v = _values(r)
    succ = [v[f"s[{i}]"] for i in range(1, 5)]
    # follow the successors: one cycle covering all 4 nodes
    seen, cur = set(), 1
    for _ in range(4):
        assert cur not in seen
        seen.add(cur)
        cur = succ[cur - 1]
    assert cur == 1 and len(seen) == 4


def test_inverse_builtin():
    fzn = """
array [1..3] of var 1..3: f :: output_array([1..3]);
array [1..3] of var 1..3: g :: output_array([1..3]);
constraint fzn_inverse(f, g);
constraint int_eq(f[1], 2);
constraint int_eq(f[2], 3);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    v = _values(r)
    f = [v[f"f[{i}]"] for i in range(1, 4)]
    g = [v[f"g[{i}]"] for i in range(1, 4)]
    for i in range(1, 4):
        assert g[f[i - 1] - 1] == i


def test_global_cardinality_builtin():
    fzn = """
array [1..4] of var 1..3: xs :: output_array([1..4]);
var 0..4: c1 :: output_var;
var 0..4: c2 :: output_var;
constraint fzn_global_cardinality(xs, [1, 2], [c1, c2]);
constraint int_eq(c1, 2);
constraint int_eq(c2, 1);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    v = _values(r)
    xs = [v[f"xs[{i}]"] for i in range(1, 5)]
    assert xs.count(1) == 2 and xs.count(2) == 1


def test_regular_builtin():
    # DFA over {1,2}: accept strings matching 1*2* (state 1 start, both
    # final); d[1][1]=1, d[1][2]=2, d[2][1]=0 (fail), d[2][2]=2
    fzn = """
array [1..4] of var 1..2: xs :: output_array([1..4]);
constraint fzn_regular(xs, 2, 2, [1, 2, 0, 2], 1, 1..2);
constraint int_eq(xs[2], 2);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    v = _values(r)
    xs = [v[f"xs[{i}]"] for i in range(1, 5)]
    # xs[2]=2 forces all later symbols to be 2; xs[1] free
    assert xs[1] == 2 and xs[2] == 2 and xs[3] == 2


def test_nvalue_builtin():
    fzn = """
array [1..4] of var 1..3: xs :: output_array([1..4]);
var 1..4: n :: output_var;
constraint fzn_nvalue(n, xs);
constraint int_eq(n, 1);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    v = _values(r)
    xs = [v[f"xs[{i}]"] for i in range(1, 5)]
    assert len(set(xs)) == 1

    fzn3 = fzn.replace("int_eq(n, 1)", "int_eq(n, 3)")
    r = solve_fzn_text(fzn3)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    v = _values(r)
    xs = [v[f"xs[{i}]"] for i in range(1, 5)]
    assert len(set(xs)) == 3


def test_lex_builtin():
    fzn = """
array [1..3] of var 0..2: a :: output_array([1..3]);
array [1..3] of var 0..2: b :: output_array([1..3]);
constraint fzn_lex_less_int(a, b);
constraint int_eq(a[1], b[1]);
constraint int_eq(a[2], b[2]);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    v = _values(r)
    a = [v[f"a[{i}]"] for i in range(1, 4)]
    b = [v[f"b[{i}]"] for i in range(1, 4)]
    assert a[:2] == b[:2] and a[2] < b[2]

    # lesseq admits full equality; strict on equal arrays is UNSAT
    uns = """
array [1..2] of var 0..0: a;
array [1..2] of var 0..0: b;
constraint fzn_lex_less_int(a, b);
solve satisfy;
"""
    r = solve_fzn_text(uns)
    assert r.status == SolveStatus.INFEASIBLE
    ok = uns.replace("lex_less_int", "lex_lesseq_int")
    r = solve_fzn_text(ok)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)


def test_all_different_except_0_builtin():
    fzn = """
array [1..4] of var 0..2: xs :: output_array([1..4]);
constraint fzn_all_different_except_0(xs);
solve maximize xs[1];
"""
    r = solve_fzn_text(fzn)
    assert r.status == SolveStatus.OPTIMAL
    v = _values(r)
    xs = [v[f"xs[{i}]"] for i in range(1, 5)]
    nz = [x for x in xs if x != 0]
    assert len(nz) == len(set(nz))  # non-zeros pairwise distinct
    assert xs[0] == 2


def test_among_builtin():
    fzn = """
array [1..5] of var 1..4: xs :: output_array([1..5]);
var 0..5: n :: output_var;
constraint fzn_among(n, xs, 2..3);
constraint int_eq(n, 2);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    v = _values(r)
    xs = [v[f"xs[{i}]"] for i in range(1, 6)]
    assert sum(1 for x in xs if 2 <= x <= 3) == 2


def test_set_variables_card_union():
    fzn = """
var set of 1..5: s :: output_var;
var set of 1..5: t :: output_var;
var set of 1..5: u :: output_var;
var 0..5: cs;
constraint set_card(s, cs);
constraint int_eq(cs, 2);
constraint set_in(1, s);
constraint set_in(3, s);
constraint set_eq(t, s);
constraint set_union(s, t, u);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    vals = dict(ln.replace(";", "").split(" = ")
                for ln in r.text.splitlines() if " = " in ln)
    assert vals["s"] == "{1, 3}"
    assert vals["t"] == "{1, 3}"
    assert vals["u"] == "{1, 3}"


def test_set_variables_subset_diff_symdiff():
    fzn = """
var set of 1..4: a :: output_var;
var set of 1..4: b :: output_var;
var set of 1..4: d :: output_var;
var set of 1..4: x :: output_var;
var 0..4: ca;
var 0..4: cb;
constraint set_card(a, ca);
constraint set_card(b, cb);
constraint int_eq(ca, 3);
constraint int_eq(cb, 2);
constraint set_subset(b, a);
constraint set_diff(a, b, d);
constraint set_symdiff(a, b, x);
constraint set_in(1, b);
constraint set_in(2, b);
constraint set_in(4, a);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    vals = dict(ln.replace(";", "").split(" = ")
                for ln in r.text.splitlines() if " = " in ln)
    assert vals["b"] == "{1, 2}"
    assert vals["a"] == "{1, 2, 4}"
    assert vals["d"] == "{4}"
    assert vals["x"] == "{4}"


def test_set_var_membership_reified():
    fzn = """
var set of 1..3: s;
var 1..3: x :: output_var;
var bool: r;
constraint set_card(s, 1);
constraint set_in(2, s);
constraint set_in_reif(x, s, r);
constraint bool_clause([r], []);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    val = int(r.text.splitlines()[0].split("=")[1].strip().rstrip(";"))
    assert val == 2


def test_float_times_div():
    fzn = """
var 0.5..4.0: x :: output_var;
var 0.5..4.0: y :: output_var;
var 0.25..16.0: z :: output_var;
var 0.5..4.0: q :: output_var;
constraint float_eq(x, 1.5);
constraint float_eq(y, 2.0);
constraint float_times(x, y, z);
constraint float_div(z, y, q);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    vals = dict(ln.replace(";", "").split(" = ")
                for ln in r.text.splitlines() if " = " in ln)
    assert abs(float(vals["z"]) - 3.0) < 1e-9
    assert abs(float(vals["q"]) - 1.5) < 1e-9


def test_float_abs_min_max():
    fzn = """
var -2.0..2.0: x :: output_var;
var 0.0..2.0: a :: output_var;
var -2.0..2.0: mn :: output_var;
var -2.0..2.0: mx :: output_var;
constraint float_eq(x, -1.25);
constraint float_abs(x, a);
constraint float_min(x, a, mn);
constraint float_max(x, a, mx);
solve satisfy;
"""
    r = solve_fzn_text(fzn)
    assert r.status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE)
    vals = dict(ln.replace(";", "").split(" = ")
                for ln in r.text.splitlines() if " = " in ln)
    assert abs(float(vals["a"]) - 1.25) < 1e-9
    assert abs(float(vals["mn"]) + 1.25) < 1e-9
    assert abs(float(vals["mx"]) - 1.25) < 1e-9
