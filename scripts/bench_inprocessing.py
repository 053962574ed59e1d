"""SAT inprocessing battery (VERDICT r4 item #10 'Done' criterion):
conflict-count effect of restart-time vivification + deferred OTF
subsumption (reference sat_inprocessing.h:160-210), DRAT still checking.
Writes artifacts/INPROCESS_r05.json."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ortools_tpu.sat.cdcl import CdclSolver
from ortools_tpu.sat.drat import check_drat


def php(holes):
    p, h = holes + 1, holes

    def v(i, j):
        return i * h + j + 1

    cls = [[v(i, j) for j in range(h)] for i in range(p)]
    for j in range(h):
        for i1 in range(p):
            for i2 in range(i1 + 1, p):
                cls.append([-v(i1, j), -v(i2, j)])
    return p * h, cls


def rand3sat(nv, ratio, seed):
    rng = np.random.default_rng(seed)
    cls = []
    for _ in range(int(nv * ratio)):
        vs = rng.choice(nv, size=3, replace=False) + 1
        cls.append(list((vs * rng.choice([-1, 1], 3)).astype(int)))
    return nv, cls


def main():
    # structured family (clause quality matters consistently) + a wide
    # random sample (single near-threshold 3-SAT runs are trajectory
    # noise: one seed can swing 5x either way)
    instances = [("php6", *php(6)), ("php7", *php(7)), ("php8", *php(8))]
    for k in range(10):
        instances.append((f"r3s_160_{k}", *rand3sat(160, 4.26, 10 + k)))
    rows = []
    proofs_ok = 0
    proofs_total = 0
    for name, nv, cls in instances:
        row = {"name": name, "n_vars": nv, "n_clauses": len(cls)}
        for on in (True, False):
            s = CdclSolver(nv, proof=on)
            s.set_inprocessing(on)
            for c in cls:
                s.add_clause(c)
            t0 = time.perf_counter()
            r = s.solve(conflict_budget=1_000_000)
            key = "on" if on else "off"
            row[key] = {"verdict": int(r),
                        "conflicts": s.num_conflicts,
                        "sec": round(time.perf_counter() - t0, 2)}
            if on:
                row["vivified"] = s.num_vivified
                row["otf_subsumed"] = s.num_otf_subsumed
                if r == 0:  # UNSAT: check the proof
                    proofs_total += 1
                    if check_drat(cls, list(s.proof())):
                        proofs_ok += 1
                        row["drat_checked"] = True
                    else:
                        row["drat_checked"] = False
        assert row["on"]["verdict"] == row["off"]["verdict"], name
        rows.append(row)
        print(f"# {name}: on={row['on']['conflicts']} "
              f"off={row['off']['conflicts']} "
              f"viv={row.get('vivified')} otf={row.get('otf_subsumed')} "
              f"drat={row.get('drat_checked', 'n/a')}", file=sys.stderr)
    out = {
        "metric": "sat_inprocessing",
        "instances": rows,
        "proofs_checked": f"{proofs_ok}/{proofs_total}",
        "total_conflicts_on": sum(r["on"]["conflicts"] for r in rows),
        "total_conflicts_off": sum(r["off"]["conflicts"] for r in rows),
        "php_conflicts_on": sum(r["on"]["conflicts"] for r in rows
                                if r["name"].startswith("php")),
        "php_conflicts_off": sum(r["off"]["conflicts"] for r in rows
                                 if r["name"].startswith("php")),
        "median_ratio_on_over_off": sorted(
            (r["on"]["conflicts"] + 1) / (r["off"]["conflicts"] + 1)
            for r in rows)[len(rows) // 2],
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "INPROCESS_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "instances"}))


if __name__ == "__main__":
    main()
