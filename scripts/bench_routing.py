"""Routing local-search depth battery (VERDICT r3 task #8).

Real Solomon instance files are not present in this sandbox (the
reference ships only two toy 'google' files in solomon.zip), so the
battery is 10 SEEDED Solomon-style VRPTW instances (clustered + uniform
customers, capacities, time windows) solved twice under the SAME wall
budget:
  level 1 = the round-3 operator set (2-opt + relocate-1)
  level 2 = the full catalogue (+ Or-opt 2-3 chains, cross-exchange,
            make-active/make-inactive), reference
            constraint_solveri.h:912-1300 operator zoo
Reports per-instance objectives and the improvement of level 2 over
level 1.  Writes artifacts/ROUTING_r04.json.
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from ortools_tpu.routing import (FirstSolutionStrategy,
                                 LocalSearchMetaheuristic,
                                 RoutingIndexManager, RoutingModel,
                                 default_routing_search_parameters)

BUDGET = float(os.environ.get("ROUTING_BUDGET", "10"))


def seeded_vrptw(seed, n=28, vehicles=4, clustered=True):
    rng = random.Random(seed)
    pts = [(50.0, 50.0)]  # depot
    if clustered:
        centers = [(rng.uniform(10, 90), rng.uniform(10, 90))
                   for _ in range(4)]
        for _ in range(n - 1):
            cx, cy = rng.choice(centers)
            pts.append((cx + rng.gauss(0, 6), cy + rng.gauss(0, 6)))
    else:
        for _ in range(n - 1):
            pts.append((rng.uniform(0, 100), rng.uniform(0, 100)))
    d = np.zeros((n, n), dtype=np.int64)
    for i in range(n):
        for j in range(n):
            d[i, j] = round(((pts[i][0] - pts[j][0]) ** 2
                             + (pts[i][1] - pts[j][1]) ** 2) ** 0.5)
    demand = [0] + [rng.randint(1, 9) for _ in range(n - 1)]
    cap = max(12, int(sum(demand) / vehicles * 1.35))
    tw = [(0, 10_000)]
    for i in range(1, n):
        a = rng.randint(0, 600)
        tw.append((a, a + rng.randint(150, 400)))
    return d, demand, cap, tw


def build_instance(seed):
    d, demand, cap, tw = seeded_vrptw(seed, clustered=(seed % 2 == 0))
    n = d.shape[0]
    vehicles = 4
    mgr = RoutingIndexManager(n, vehicles, 0)
    routing = RoutingModel(mgr)
    cb = routing.register_transit_callback(
        lambda f, t: int(d[mgr.index_to_node(f), mgr.index_to_node(t)]))
    routing.set_arc_cost_evaluator_of_all_vehicles(cb)
    dem = routing.register_unary_transit_callback(
        lambda f: demand[mgr.index_to_node(f)])
    routing.add_dimension_with_vehicle_capacity(
        dem, 0, [cap] * vehicles, True, "Capacity")
    # travel time = distance; service 10 at each stop
    tt = routing.register_transit_callback(
        lambda f, t: int(d[mgr.index_to_node(f),
                           mgr.index_to_node(t)]) + 10)
    routing.add_dimension(tt, 10_000, 20_000, True, "Time")
    time_dim = routing.get_dimension_or_die("Time")
    for node in range(1, n):
        idx = mgr.node_to_index(node)
        time_dim.set_cumul_var_range(idx, tw[node][0], tw[node][1])
    return routing


def solve_instance(seed, level, budget=None, meta=None, strategy=None):
    routing = build_instance(seed)
    params = default_routing_search_parameters()
    params.time_limit_seconds = budget if budget is not None else BUDGET
    params.local_search_metaheuristic = (
        meta if meta is not None
        else LocalSearchMetaheuristic.GUIDED_LOCAL_SEARCH)
    params.first_solution_strategy = (
        strategy if strategy is not None
        else FirstSolutionStrategy.PATH_CHEAPEST_ARC)
    params.ls_operator_level = level
    t0 = time.perf_counter()
    sol = routing.solve_with_parameters(params)
    dt = time.perf_counter() - t0
    if sol is None:
        return None, dt
    return sol.objective_value(), dt


def best_known_proxy(seed):
    """Long-budget multi-start best over strategies x metaheuristics —
    the battery's stand-in for published best-known values (real Solomon
    files are not shipped in this sandbox)."""
    best = None
    for strat in (FirstSolutionStrategy.PATH_CHEAPEST_ARC,
                  FirstSolutionStrategy.SAVINGS,
                  FirstSolutionStrategy.SWEEP):
        for meta in (LocalSearchMetaheuristic.GUIDED_LOCAL_SEARCH,
                     LocalSearchMetaheuristic.SIMULATED_ANNEALING):
            o, _ = solve_instance(seed, 2, budget=2.5 * BUDGET,
                                  meta=meta, strategy=strat)
            if o is not None and (best is None or o < best):
                best = o
    return best


def main():
    results = []
    wins = 0
    within5 = 0
    for seed in range(1, 11):
        bk = best_known_proxy(seed)
        o1, t1 = solve_instance(seed, level=1)
        o2, t2 = solve_instance(seed, level=2)
        # fixed-budget portfolio row: best of the catalogue at level 2
        o_best = o2
        for strat in (FirstSolutionStrategy.SAVINGS,
                      FirstSolutionStrategy.SWEEP):
            ox, _ = solve_instance(seed, 2, strategy=strat)
            if ox is not None and (o_best is None or ox < o_best):
                o_best = ox
        gain = (o1 - o2) / o1 * 100 if o1 and o2 else float("nan")
        wins += int(o2 is not None and (o1 is None or o2 <= o1))
        ok5 = (o_best is not None and bk is not None
               and o_best <= bk * 1.05)
        within5 += int(ok5)
        print(f"vrptw_s{seed:<3} bk~{bk}  level1: {o1}  level2: {o2}  "
              f"best: {o_best}  gain {gain:+.1f}%  within5%: {ok5}")
        results.append({"seed": seed, "best_known_proxy": bk,
                        "level1": o1, "level2": o2,
                        "catalogue_best": o_best,
                        "within_5pct": bool(ok5),
                        "gain_pct": None if gain != gain
                        else round(gain, 2)})
    frac = wins / len(results)
    frac5 = within5 / len(results)
    print(f"level2 at-least-as-good on {wins}/{len(results)}; "
          f"within 5% of best-known proxy on {within5}/{len(results)}")
    out = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "ROUTING_r05.json")
    with open(out, "w") as f:
        json.dump({"budget_s": BUDGET, "instances": results,
                   "level2_no_worse_frac": frac,
                   "within_5pct_frac": frac5}, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
