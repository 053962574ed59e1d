"""CP model presolve.

Capability parity: ``ortools/sat/cp_model_presolve.{h,cc}`` (SURVEY §2.4.2)
scoped to the structural core of its rule set:

- root fix-point domain reduction (every propagator run once to a fixed
  point; variable domains in the IR are tightened accordingly);
- removal of entailed constraints (satisfied for every assignment within
  the reduced domains);
- singleton linear constraints folded into domains;
- duplicate constraint elimination (same kind/args/enforcement);
- empty-enforcement cleanup (constraints with a false enforcement literal
  dropped).

The presolved model is equisatisfiable with identical variable set (no
renumbering), so solutions transfer 1:1 and the original-model checker
contract is unaffected.  Returns None when root propagation proves
infeasibility.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from ortools_tpu.sat import model_ir as ir
from ortools_tpu.sat.engine import Conflict, Engine
from ortools_tpu.utils.domain import Domain


def presolve_model(model: ir.CpModelIR) -> Optional[ir.CpModelIR]:
    """Domain-reduce and simplify; None = proven infeasible at the root."""
    engine = Engine(model)
    doms = engine.initial_domains()
    if not engine.root_propagate(doms):
        return None

    new_vars = [
        ir.IntegerVariableIR(v.name, doms[i])
        for i, v in enumerate(model.variables)
    ]

    kept: List[ir.ConstraintIR] = []
    index_map = {}  # old constraint index -> new index
    seen = set()
    for old_idx, ct in enumerate(model.constraints):
        # Interval constraints are indexed by scheduling constraints and
        # must survive (their enforcement literals are also kept verbatim
        # so optional-interval presence still reads correctly).
        if ct.kind == "interval":
            index_map[old_idx] = len(kept)
            kept.append(ct)
            continue
        # drop constraints never active
        dead = False
        enf: List[int] = []
        for lit in ct.enforcement_literals:
            v = ir.literal_index(lit)
            d = doms[v]
            if d.is_fixed():
                val = bool(d.fixed_value()) == (lit >= 0)
                if not val:
                    dead = True
                    break
                continue  # literal fixed true: remove from the list
            enf.append(lit)
        if dead:
            continue
        if ct.kind == "linear" and not ct.enforcement_literals:
            a = ct.args
            live = [(v, c) for v, c in zip(a.vars, a.coeffs) if c != 0]
            if len(live) == 0:
                if not a.domain.contains(0):
                    # infeasible constant constraint survived propagation
                    # only if enforcement made it vacuous; no enforcement
                    # here -> infeasible model
                    return None
                continue  # trivially true
            if len(live) == 1:
                # singleton: already folded into the domain by propagation
                v, c = live[0]
                if a.domain.num_intervals() == 1 or doms[v].size() <= 4096:
                    continue
        if _entailed(ct, doms):
            continue
        key = _constraint_key(ct, enf)
        if key in seen:
            continue
        seen.add(key)
        index_map[old_idx] = len(kept)
        kept.append(dataclasses.replace(ct, enforcement_literals=enf))

    # remap interval references in scheduling constraints
    for i, ct in enumerate(kept):
        if ct.kind in ("no_overlap",):
            kept[i] = dataclasses.replace(ct, args=ir.NoOverlapArgs(
                [index_map[k] for k in ct.args.intervals]
            ))
        elif ct.kind == "cumulative":
            kept[i] = dataclasses.replace(ct, args=ir.CumulativeArgs(
                ct.args.capacity,
                [index_map[k] for k in ct.args.intervals],
                ct.args.demands,
            ))
        elif ct.kind == "no_overlap_2d":
            kept[i] = dataclasses.replace(ct, args=ir.NoOverlap2DArgs(
                [index_map[k] for k in ct.args.x_intervals],
                [index_map[k] for k in ct.args.y_intervals],
            ))

    return dataclasses.replace(model, variables=new_vars, constraints=kept)


def _entailed(ct: ir.ConstraintIR, doms) -> bool:
    """Cheap entailment checks: constraint satisfied for ALL assignments
    within current domains."""
    a = ct.args
    k = ct.kind
    if k == "linear" and not ct.enforcement_literals:
        lo = hi = 0
        for v, c in zip(a.vars, a.coeffs):
            d = doms[v]
            t1, t2 = c * d.min(), c * d.max()
            lo += min(t1, t2)
            hi += max(t1, t2)
        hull = Domain(lo, hi)
        # entailed iff the full hull fits into one interval of the rhs
        for ilo, ihi in a.domain.intervals():
            if ilo <= lo and hi <= ihi:
                return True
        return False
    if k == "bool_or":
        return any(
            doms[ir.literal_index(l)].is_fixed()
            and bool(doms[ir.literal_index(l)].fixed_value()) == (l >= 0)
            for l in a.literals
        )
    if k == "at_most_one":
        unfixed_or_true = 0
        for l in a.literals:
            d = doms[ir.literal_index(l)]
            if d.is_fixed():
                if bool(d.fixed_value()) == (l >= 0):
                    unfixed_or_true += 1
            else:
                unfixed_or_true += 1
        return unfixed_or_true <= 1
    return False


def _constraint_key(ct: ir.ConstraintIR, enf: List[int]):
    a = ct.args
    if ct.kind in ("bool_or", "bool_and", "at_most_one", "exactly_one",
                   "bool_xor"):
        body = tuple(sorted(a.literals))
    elif ct.kind == "linear":
        body = (tuple(a.vars), tuple(a.coeffs),
                tuple(a.domain.flattened_intervals()))
    else:
        return id(ct)  # only cheap kinds are deduplicated
    return (ct.kind, body, tuple(sorted(enf)))
