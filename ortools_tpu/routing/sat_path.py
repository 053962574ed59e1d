"""CP-SAT certification path for routing models.

Capability parity: ``ortools/constraint_solver/routing_sat.cc`` — the
reference solves (small/medium) routing models exactly through CP-SAT by
encoding the VRP as one giant tour over a ``circuit`` constraint (vehicle
end -> next vehicle start arcs fixed to true), with dimension cumuls as
integer variables propagated along selected arcs.  This module is the
same role on this framework's CP stack: it certifies (or improves) the
local-search solution, and proves optimality when the CP solve finishes.

Scope (callers fall back to pure local search outside it): homogeneous
fleet (identical per-vehicle cost matrices and per-dimension capacities),
dimensions with integer transits, node time windows, optional nodes from
disjunctions (penalized self-loop arcs), fixed vehicle costs.  Pickup &
delivery, breaks, resources and span costs are out of the fragment.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


def solve_with_cp_sat(model, time_limit_sec: float = 10.0,
                      warm_routes: Optional[List[List[int]]] = None):
    """Exact solve/certification of a RoutingModel through CP-SAT.

    Returns ``(assignment, proven_optimal)`` or ``None`` when the model
    is outside the supported fragment or the CP solve finds nothing
    within the limit.  ``warm_routes`` (internal-index routes without
    depots, one list per vehicle) seed the solution hint.
    """
    mgr = model.manager
    if model._pd_pairs or model._resource_groups:
        return None
    node_of, cost, dims = model._build_matrices()
    nv = mgr.num_vehicles
    # homogeneous fleet only (the giant tour cannot tell which vehicle
    # serves a node)
    for v in range(1, nv):
        if not np.array_equal(cost[v], cost[0]):
            return None
    for d, _mat in dims:
        if d.capacities and len(set(d.capacities)) > 1:
            return None
        if d.span_cost_coefficient or d.breaks_per_vehicle:
            return None
    n = mgr.get_number_of_indices()
    starts = [mgr.vehicle_start(v) for v in range(nv)]
    ends = [mgr.vehicle_end(v) for v in range(nv)]
    start_set, end_set = set(starts), set(ends)
    # visit copies of terminal NODES (e.g. the depot's plain index) are
    # never visited — only indices whose node is not a vehicle terminal
    terminal_nodes = set(mgr._starts) | set(mgr._ends)
    visits = [i for i in range(mgr.num_nodes)
              if node_of[i] not in terminal_nodes]
    optional: Dict[int, int] = {}
    for idxs, pen in model._disjunctions:
        for i in idxs:
            optional[i] = pen
    if len(visits) > 60:  # certification path is for small instances
        return None

    from ortools_tpu.sat.cp_model import CpModel, CpSolver

    cp = CpModel()
    arc_cost = cost[0]
    obj_terms: List[Tuple[int, object]] = []
    obj_const = 0
    lits: Dict[Tuple[int, int], object] = {}
    arcs = []

    def add_arc(t: int, h: int, c: int) -> None:
        b = cp.new_bool_var(f"x_{t}_{h}")
        lits[(t, h)] = b
        arcs.append((t, h, b))
        if c:
            obj_terms.append((c, b))

    for v in range(nv):
        sv, ev = starts[v], ends[v]
        for j in visits:
            add_arc(sv, j, int(arc_cost[node_of[sv], node_of[j]]))
        # empty route: the reference pays the depot->depot arc only when
        # start and end are distinct nodes (routing/model.py _objective)
        empty_cost = (int(arc_cost[node_of[sv], node_of[ev]])
                      if node_of[sv] != node_of[ev] else 0)
        add_arc(sv, ev, empty_cost)
        for i in visits:
            add_arc(i, ev, int(arc_cost[node_of[i], node_of[ev]]))
    for i in visits:
        for j in visits:
            if i != j:
                add_arc(i, j, int(arc_cost[node_of[i], node_of[j]]))
    for i in visits:
        if i in optional:
            b = cp.new_bool_var(f"skip_{i}")
            lits[(i, i)] = b
            arcs.append((i, i, b))
            obj_terms.append((optional[i], b))
    # vehicle-end -> next-vehicle-start arcs are fixed true
    true_lit = cp.new_constant(1)
    for v in range(nv):
        arcs.append((ends[v], starts[(v + 1) % nv], true_lit))
    cp.add_circuit(arcs)

    # fixed vehicle cost: paid unless the route is empty
    for v in range(nv):
        c = int(model._fixed_vehicle_cost[v])
        if c:
            empty = lits[(starts[v], ends[v])]
            obj_terms.append((-c, empty))
            obj_const += c

    # dimensions: cumul variable per internal index, propagated along
    # selected arcs (NOT across the fixed end->start links: each vehicle
    # restarts its cumul)
    for d, mat in dims:
        cap = int(d.capacities[0]) if d.capacities else (1 << 40)
        cum = []
        for i in range(n):
            lo = int(d.cumul_lb.get(i, 0))
            hi = min(int(d.cumul_ub.get(i, cap)), cap)
            if i in start_set and d.fix_start_cumul_to_zero:
                lo = hi = 0
            if lo > hi:
                return None  # inconsistent window
            cum.append(cp.new_int_var(lo, hi, f"cum_{d.name}_{i}"))
        slack = max(0, int(d.slack_max))
        for (t, h), b in lits.items():
            if t == h:
                continue
            tr = int(mat[node_of[t], node_of[h]])
            e = cum[h] - cum[t]
            cp.add(e >= tr).only_enforce_if(b)
            if slack < cap:
                cp.add(e <= tr + slack).only_enforce_if(b)

    expr = obj_const
    for c, b in obj_terms:
        expr = expr + c * b
    cp.minimize(expr)

    if warm_routes is not None:
        nxt = {}
        for v, r in enumerate(warm_routes):
            seq = [starts[v]] + list(r) + [ends[v]]
            for a, b in zip(seq, seq[1:]):
                nxt[a] = b
        placed = {i for r in warm_routes for i in r}
        for (t, h), b in lits.items():
            if t == h:
                cp.add_hint(b, 0 if t in placed else 1)
            else:
                cp.add_hint(b, 1 if nxt.get(t) == h else 0)

    solver = CpSolver()
    solver.parameters.max_time_in_seconds = float(time_limit_sec)
    status = solver.solve(cp)
    name = solver.status_name(status)
    if name not in ("OPTIMAL", "FEASIBLE"):
        return None
    nexts = {}
    for (t, h), b in lits.items():
        if solver.value(b):
            nexts[t] = h
    routes = []
    dropped = [i for i in visits if nexts.get(i) == i]
    for v in range(nv):
        r = []
        cur = nexts.get(starts[v])
        while cur is not None and cur != ends[v]:
            r.append(cur)
            cur = nexts.get(cur)
        routes.append(r)
    from ortools_tpu.routing.model import Assignment

    internal = [[starts[v]] + routes[v] + [ends[v]] for v in range(nv)]
    obj = model._objective(routes, dropped, cost, optional)
    return Assignment(model, internal, obj), name == "OPTIMAL"
