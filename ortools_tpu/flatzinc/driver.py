"""FlatZinc front-end.

Capability parity: ``ortools/flatzinc`` (flex/bison parser + the
FlatZinc -> CpModelProto translation of cp_model_fz_solver.cc + the fz CLI,
fz.cc:174).  FlatZinc is machine-generated and line-regular, so a
regex/recursive-descent parser covers it without a parser generator.

Supported items: par/var declarations (int ranges, int sets, bool, arrays),
constraints over the common integer/bool builtins (with _reif forms),
solve satisfy/minimize/maximize, output annotations.  Unknown predicates
raise a clear error listing the offender (reference behavior).
"""

from __future__ import annotations

import dataclasses
import re
import sys
from typing import Dict, List, Optional, Tuple, Union

from ortools_tpu.sat import CpModel, CpSolver, CpSolverSolutionCallback
from ortools_tpu.sat.cp_model import IntVar, LinearExpr, _NotBoolVar
from ortools_tpu.utils.domain import Domain
from ortools_tpu.utils.status import SolveStatus


class FlatZincError(ValueError):
    pass


_ITEM_RE = re.compile(r"([^;]*);", re.S)


@dataclasses.dataclass
class FzResult:
    status: SolveStatus
    text: str  # FlatZinc-format output
    objective: Optional[float] = None


def _split_top(s: str, sep: str = ",") -> List[str]:
    """Split at top level (not inside brackets/parens)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    last = "".join(cur).strip()
    if last:
        out.append(last)
    return out


class _FzModel:
    def __init__(self) -> None:
        self.model = CpModel()
        self.vars: Dict[str, IntVar] = {}
        self.pars: Dict[str, Union[int, List[int]]] = {}
        self.arrays: Dict[str, List] = {}  # name -> list of IntVar/int
        self.output_items: List[Tuple[str, object]] = []
        self.objective = None
        self.sense = "satisfy"

    # ---- value/expression resolution ----------------------------------
    def value(self, tok: str):
        tok = tok.strip()
        if tok in self.vars:
            return self.vars[tok]
        if tok in self.pars:
            return self.pars[tok]
        if tok in self.arrays:
            return self.arrays[tok]
        if tok.startswith("[") and tok.endswith("]"):
            inner = tok[1:-1].strip()
            return [self.value(t) for t in _split_top(inner)] if inner else []
        if tok == "true":
            return 1
        if tok == "false":
            return 0
        if re.fullmatch(r"-?\d+", tok):
            return int(tok)
        m = re.fullmatch(r"(\w+)\[(\d+)\]", tok)
        if m:
            return self.arrays[m.group(1)][int(m.group(2)) - 1]
        raise FlatZincError(f"cannot resolve {tok!r}")

    def int_list(self, tok: str) -> List[int]:
        v = self.value(tok)
        assert isinstance(v, list), tok
        return [int(x) for x in v]

    def var_list(self, tok: str) -> List:
        v = self.value(tok)
        return v if isinstance(v, list) else [v]

    def as_expr(self, item) -> LinearExpr:
        if isinstance(item, LinearExpr):
            return item
        return LinearExpr.of(int(item))

    def lin(self, coeffs: str, xs: str) -> LinearExpr:
        cs = self.int_list(coeffs)
        vs = self.var_list(xs)
        return LinearExpr.sum([self.as_expr(v) * c for c, v in zip(cs, vs)])

    def as_lit(self, item):
        if isinstance(item, (IntVar, _NotBoolVar)):
            return item
        return bool(int(item))


def parse_fzn(text: str) -> _FzModel:
    fz = _FzModel()
    m = fz.model
    # strip comments
    text = re.sub(r"%[^\n]*", "", text)
    for item_m in _ITEM_RE.finditer(text):
        item = item_m.group(1).strip()
        if not item:
            continue
        if item.startswith("predicate"):
            continue
        anns = re.findall(r"::\s*([\w]+(?:\([^)]*\))?)", item)
        body = re.split(r"::", item)[0].strip()
        if item.startswith("solve"):
            _parse_solve(fz, item)
            continue
        if body.startswith("constraint"):
            _parse_constraint(fz, body[len("constraint"):].strip())
            continue
        _parse_decl(fz, body, anns, item)
    return fz


def _parse_domain(dom: str) -> Domain:
    dom = dom.strip()
    if dom == "bool":
        return Domain(0, 1)
    if dom == "int":
        return Domain(-(2**31), 2**31)
    m = re.fullmatch(r"(-?\d+)\s*\.\.\s*(-?\d+)", dom)
    if m:
        return Domain(int(m.group(1)), int(m.group(2)))
    if dom.startswith("{"):
        vals = [int(x) for x in _split_top(dom[1:-1])]
        return Domain.from_values(vals)
    raise FlatZincError(f"unsupported domain {dom!r}")


def _parse_decl(fz: _FzModel, body: str, anns: List[str],
                full_item: str) -> None:
    mdl = fz.model
    # array declaration
    am = re.match(
        r"array\s*\[\s*1\s*\.\.\s*(\d+)\s*\]\s*of\s+(.*?):\s*(\w+)"
        r"(?:\s*=\s*(.*))?$",
        body, re.S,
    )
    if am:
        size, elem_type, name, init = am.groups()
        size = int(size)
        if init is not None:
            vals = [fz.value(t) for t in _split_top(init.strip()[1:-1])]
            fz.arrays[name] = vals
        else:
            elem_type = elem_type.strip()
            if elem_type.startswith("var"):
                dom = _parse_domain(elem_type[3:].strip())
                fz.arrays[name] = [
                    mdl.new_int_var_from_domain(dom, f"{name}[{i+1}]")
                    for i in range(size)
                ]
            else:
                raise FlatZincError(f"par array without init: {body!r}")
        for ann in anns:
            if ann.startswith("output_array"):
                fz.output_items.append((name, fz.arrays[name]))
        return
    # var declaration
    vm = re.match(r"var\s+(.*?):\s*(\w+)(?:\s*=\s*(.*))?$", body, re.S)
    if vm:
        dom_s, name, init = vm.groups()
        if init is not None:
            val = fz.value(init.strip())
            if isinstance(val, IntVar):
                fz.vars[name] = val
            else:
                fz.vars[name] = fz.model.new_constant(int(val))
        else:
            fz.vars[name] = mdl.new_int_var_from_domain(
                _parse_domain(dom_s), name
            )
        if any(a.startswith("output_var") for a in anns):
            fz.output_items.append((name, fz.vars[name]))
        return
    # par declaration
    pm = re.match(r"(?:int|bool)\s*:\s*(\w+)\s*=\s*(.*)$", body, re.S)
    if pm:
        name, init = pm.groups()
        fz.pars[name] = fz.value(init.strip())
        return
    pm2 = re.match(r"set\s+of\s+int\s*:\s*(\w+)\s*=\s*(.*)$", body, re.S)
    if pm2:
        name, init = pm2.groups()
        init = init.strip()
        rm = re.fullmatch(r"(-?\d+)\s*\.\.\s*(-?\d+)", init)
        if rm:
            fz.pars[name] = list(range(int(rm.group(1)),
                                       int(rm.group(2)) + 1))
        else:
            fz.pars[name] = [int(x) for x in _split_top(init[1:-1])]
        return
    raise FlatZincError(f"cannot parse declaration: {full_item!r}")


def _parse_solve(fz: _FzModel, item: str) -> None:
    item = re.sub(r"::\s*\w+\([^)]*\)", "", item)  # drop search annotations
    parts = item.split()
    if "satisfy" in parts:
        fz.sense = "satisfy"
        return
    for sense in ("minimize", "maximize"):
        if sense in parts:
            target = item.split(sense, 1)[1].strip()
            fz.sense = sense
            fz.objective = fz.as_expr(fz.value(target))
            if sense == "minimize":
                fz.model.minimize(fz.objective)
            else:
                fz.model.maximize(fz.objective)
            return
    raise FlatZincError(f"cannot parse solve item: {item!r}")


def _parse_constraint(fz: _FzModel, text: str) -> None:
    m = re.match(r"(\w+)\s*\((.*)\)$", text, re.S)
    if not m:
        raise FlatZincError(f"bad constraint syntax: {text!r}")
    name, args_s = m.group(1), m.group(2)
    args = _split_top(args_s)
    mdl = fz.model
    E = fz.as_expr
    V = fz.value

    def expr(i):
        return E(V(args[i]))

    def lit(i):
        return fz.as_lit(V(args[i]))

    if name == "int_lin_eq":
        mdl.add(fz.lin(args[0], args[1]) == int(V(args[2])))
    elif name == "int_lin_le":
        mdl.add(fz.lin(args[0], args[1]) <= int(V(args[2])))
    elif name == "int_lin_ne":
        mdl.add(fz.lin(args[0], args[1]) != int(V(args[2])))
    elif name in ("int_lin_eq_reif", "int_lin_le_reif"):
        b = lit(3)
        e = fz.lin(args[0], args[1])
        c = int(V(args[2]))
        if name == "int_lin_eq_reif":
            mdl.add(e == c).only_enforce_if(b)
            mdl.add(e != c).only_enforce_if(_neg(b))
        else:
            mdl.add(e <= c).only_enforce_if(b)
            mdl.add(e >= c + 1).only_enforce_if(_neg(b))
    elif name in ("int_eq", "bool_eq"):
        mdl.add(expr(0) == expr(1))
    elif name in ("int_ne", "bool_not"):
        mdl.add(expr(0) != expr(1))
    elif name in ("int_le", "bool_le"):
        mdl.add(expr(0) <= expr(1))
    elif name == "int_lt":
        mdl.add(expr(0) <= expr(1) - 1)
    elif name in ("int_eq_reif", "bool_eq_reif"):
        b = lit(2)
        mdl.add(expr(0) == expr(1)).only_enforce_if(b)
        mdl.add(expr(0) != expr(1)).only_enforce_if(_neg(b))
    elif name in ("int_ne_reif",):
        b = lit(2)
        mdl.add(expr(0) != expr(1)).only_enforce_if(b)
        mdl.add(expr(0) == expr(1)).only_enforce_if(_neg(b))
    elif name in ("int_le_reif", "bool_le_reif"):
        b = lit(2)
        mdl.add(expr(0) <= expr(1)).only_enforce_if(b)
        mdl.add(expr(0) >= expr(1) + 1).only_enforce_if(_neg(b))
    elif name == "int_lt_reif":
        b = lit(2)
        mdl.add(expr(0) <= expr(1) - 1).only_enforce_if(b)
        mdl.add(expr(0) >= expr(1)).only_enforce_if(_neg(b))
    elif name == "int_plus":
        mdl.add(expr(0) + expr(1) == expr(2))
    elif name == "int_minus":
        mdl.add(expr(0) - expr(1) == expr(2))
    elif name == "int_times":
        mdl.add_multiplication_equality(expr(2), [expr(0), expr(1)])
    elif name == "int_div":
        mdl.add_division_equality(expr(2), expr(0), expr(1))
    elif name == "int_mod":
        mdl.add_modulo_equality(expr(2), expr(0), expr(1))
    elif name == "int_abs":
        mdl.add_abs_equality(expr(1), expr(0))
    elif name == "int_min":
        mdl.add_min_equality(expr(2), [expr(0), expr(1)])
    elif name == "int_max":
        mdl.add_max_equality(expr(2), [expr(0), expr(1)])
    elif name == "array_int_maximum":
        mdl.add_max_equality(expr(0), [E(v) for v in fz.var_list(args[1])])
    elif name == "array_int_minimum":
        mdl.add_min_equality(expr(0), [E(v) for v in fz.var_list(args[1])])
    elif name in ("array_int_element", "array_var_int_element"):
        idx = expr(0) - 1  # FlatZinc is 1-based
        arr = [E(v) for v in fz.var_list(args[1])]
        mdl.add_element(idx, arr, expr(2))
    elif name == "all_different_int":
        mdl.add_all_different([E(v) for v in fz.var_list(args[0])])
    elif name == "bool_clause":
        pos = [fz.as_lit(v) for v in fz.var_list(args[0])]
        neg = [_neg(fz.as_lit(v)) for v in fz.var_list(args[1])]
        mdl.add_bool_or(pos + neg)
    elif name == "array_bool_and":
        b = lit(1)
        lits = [fz.as_lit(v) for v in fz.var_list(args[0])]
        mdl.add_bool_and(lits).only_enforce_if(b)
        mdl.add_bool_or([_neg(x) for x in lits] + [b])
    elif name == "array_bool_or":
        b = lit(1)
        lits = [fz.as_lit(v) for v in fz.var_list(args[0])]
        mdl.add_bool_or(lits).only_enforce_if(b)
        for x in lits:
            mdl.add_implication(x, b)
    elif name == "bool2int":
        mdl.add(expr(0) == expr(1))
    elif name == "set_in":
        dom_tok = args[1].strip()
        rm = re.fullmatch(r"(-?\d+)\s*\.\.\s*(-?\d+)", dom_tok)
        if rm:
            d = Domain(int(rm.group(1)), int(rm.group(2)))
        else:
            d = Domain.from_values([int(x) for x in
                                    _split_top(dom_tok[1:-1])])
        mdl.add_linear_expression_in_domain(expr(0), d)
    elif name == "table_int":
        exprs = [E(v) for v in fz.var_list(args[0])]
        flat = fz.int_list(args[1])
        k = len(exprs)
        tuples = [tuple(flat[i:i + k]) for i in range(0, len(flat), k)]
        mdl.add_allowed_assignments(exprs, tuples)
    else:
        raise FlatZincError(f"unsupported FlatZinc predicate: {name}")


def _neg(lit):
    if isinstance(lit, bool):
        return not lit
    return lit.negated()


def _format_output(fz: _FzModel, solver: CpSolver) -> str:
    lines = []
    for name, item in fz.output_items:
        if isinstance(item, list):
            vals = ", ".join(
                str(solver.value(fz.as_expr(v))) for v in item
            )
            lines.append(
                f"{name} = array1d(1..{len(item)}, [{vals}]);"
            )
        else:
            lines.append(f"{name} = {solver.value(item)};")
    lines.append("----------")
    return "\n".join(lines)


def solve_fzn_text(text: str, max_time_in_seconds: float = 60.0,
                   all_solutions: bool = False) -> FzResult:
    fz = parse_fzn(text)
    solver = CpSolver()
    solver.parameters.max_time_in_seconds = max_time_in_seconds
    outputs: List[str] = []

    if all_solutions and fz.sense == "satisfy":
        solver.parameters.enumerate_all_solutions = True

        class Cb(CpSolverSolutionCallback):
            def on_solution_callback(cb_self):
                pass

        # enumeration prints each; round 1 prints only the last
    status = solver.solve(fz.model)
    if status in (SolveStatus.OPTIMAL, SolveStatus.FEASIBLE):
        out = _format_output(fz, solver)
        if status == SolveStatus.OPTIMAL and fz.sense != "satisfy":
            out += "\n=========="
        obj = (solver.objective_value if fz.sense != "satisfy" else None)
        return FzResult(status, out, obj)
    if status == SolveStatus.INFEASIBLE:
        return FzResult(status, "=====UNSATISFIABLE=====")
    return FzResult(status, "=====UNKNOWN=====")


def solve_flatzinc(path: str, **kw) -> FzResult:
    with open(path) as f:
        return solve_fzn_text(f.read(), **kw)


def main(argv=None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    if not args:
        print("usage: python -m ortools_tpu.flatzinc model.fzn")
        return 2
    res = solve_flatzinc(args[0])
    print(res.text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
