"""OPB battery: PB-resolution (cutting planes) vs clause learning.

VERDICT r4 item #3 deliverable: a counting family (pigeonhole PB) that
clause learning cannot finish closes in seconds on the PB-resolution
core (_native/pbsat.cc; reference pb_constraint.h:526).  Both engines
run through the same solve_model facade — only `use_pb_resolution`
differs.  Writes artifacts/OPB_r05.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ortools_tpu.sat.sat_io import read_opb
from ortools_tpu.sat.solver import solve_model
from ortools_tpu.sat.params import SatParameters


def php_opb(n):
    P, H = n + 1, n
    lines = [f"* pigeonhole {P} pigeons {H} holes"]

    def v(p, h):
        return f"x{p * H + h + 1}"

    for p in range(P):
        lines.append(" ".join(f"+1 {v(p, h)}" for h in range(H)) + " >= 1 ;")
    for h in range(H):
        lines.append(" ".join(f"-1 {v(p, h)}" for p in range(P))
                     + " >= -1 ;")
    return read_opb("\n".join(lines), name=f"php_{P}_{H}")


def run(model, use_pb, tl):
    params = SatParameters(max_time_in_seconds=tl,
                           use_pb_resolution=use_pb,
                           use_feasibility_jump=False)
    t0 = time.perf_counter()
    r = solve_model(model, params)
    return {
        "status": r.status.name,
        "sec": round(time.perf_counter() - t0, 2),
        "conflicts": int(r.num_conflicts),
    }


def main():
    tl = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    out = {"metric": "opb_pigeonhole_separation", "time_limit_sec": tl,
           "instances": []}
    for n in (8, 10, 12, 14, 16):
        m = php_opb(n)
        pb = run(m, True, tl)
        cl = run(m, False, tl)
        row = {"name": m.name, "n_vars": (n + 1) * n,
               "pb_resolution": pb, "clause_learning": cl}
        out["instances"].append(row)
        print(f"# {m.name}: pb={pb['status']} {pb['sec']}s "
              f"({pb['conflicts']} confl)  clause={cl['status']} "
              f"{cl['sec']}s ({cl['conflicts']} confl)", file=sys.stderr)
    pb_solved = sum(r["pb_resolution"]["status"] == "INFEASIBLE"
                    for r in out["instances"])
    cl_solved = sum(r["clause_learning"]["status"] == "INFEASIBLE"
                    for r in out["instances"])
    out["pb_solved"] = pb_solved
    out["clause_solved"] = cl_solved
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "OPB_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "instances"}))


if __name__ == "__main__":
    main()
