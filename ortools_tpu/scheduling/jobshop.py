"""Jobshop scheduling: parser + CP model.

Capability parity: ``ortools/scheduling/jobshop_scheduling_parser.{h,cc}``
(standard JSSP format) and the reference's ``examples/cpp/jobshop_sat.cc``
model: one interval per operation, no_overlap per machine, job precedence
chains, makespan minimization (BASELINE config 4).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple


@dataclasses.dataclass
class JobshopInstance:
    name: str
    jobs: List[List[Tuple[int, int]]]  # per job: [(machine, duration), ...]

    @property
    def num_jobs(self) -> int:
        return len(self.jobs)

    @property
    def num_machines(self) -> int:
        return 1 + max(m for job in self.jobs for m, _ in job)

    @property
    def horizon(self) -> int:
        return sum(d for job in self.jobs for _, d in job)


def parse_jobshop(path_or_text: str, is_text: bool = False,
                  name: str = "") -> JobshopInstance:
    """Standard JSSP format: first non-comment line `num_jobs num_machines`,
    then one line per job with (machine, duration) pairs.  Lines starting
    with '#' and instance-bank headers ('+++', 'instance ...') are skipped.
    """
    text = path_or_text if is_text else open(path_or_text).read()
    rows = []
    for ln in text.splitlines():
        s = ln.strip()
        if not s or s.startswith(("#", "+", "instance", "Times", "Machines")):
            continue
        parts = s.split()
        try:
            rows.append([int(float(x)) for x in parts])
        except ValueError:
            continue
    assert rows, "no numeric data found"
    nj, nm = rows[0][0], rows[0][1]
    jobs = []
    for r in rows[1:1 + nj]:
        job = [(r[i], r[i + 1]) for i in range(0, 2 * nm, 2)]
        jobs.append(job)
    assert len(jobs) == nj
    return JobshopInstance(name=name, jobs=jobs)


@dataclasses.dataclass
class JobshopSolution:
    makespan: int
    starts: List[List[int]]  # per job, per operation
    optimal: bool


def solve_jobshop(instance: JobshopInstance,
                  max_time_in_seconds: float = 60.0,
                  horizon: Optional[int] = None,
                  disjunctive_branching: bool = True
                  ) -> Optional[JobshopSolution]:
    """Interval + no_overlap CP model (reference jobshop_sat.cc shape).

    With ``disjunctive_branching`` the model adds machine-pair order
    booleans (b => end_i <= start_j; !b => end_j <= start_i) so the search
    branches on sequencing decisions instead of start values — the
    classical disjunctive-scheduling branching scheme (start values then
    follow by propagation)."""
    from ortools_tpu.sat import CpModel, CpSolver, FEASIBLE, OPTIMAL

    m = CpModel()
    horizon = horizon or instance.horizon
    all_ops = {}
    machine_ivs = {mm: [] for mm in range(instance.num_machines)}
    machine_ops = {mm: [] for mm in range(instance.num_machines)}
    for j, job in enumerate(instance.jobs):
        prev_end = None
        for o, (mach, dur) in enumerate(job):
            start = m.new_int_var(0, horizon, f"s_{j}_{o}")
            iv = m.new_fixed_size_interval_var(start, dur, f"iv_{j}_{o}")
            all_ops[j, o] = (start, dur)
            machine_ivs[mach].append(iv)
            machine_ops[mach].append((start, dur, j, o))
            if prev_end is not None:
                m.add(start >= prev_end)
            prev_end = start + dur
    order_bools = []
    for mach, ivs in machine_ivs.items():
        if len(ivs) > 1:
            m.add_no_overlap(ivs)
    if disjunctive_branching:
        for mach, ops in machine_ops.items():
            for a in range(len(ops)):
                for b in range(a + 1, len(ops)):
                    s1, d1, j1, o1 = ops[a]
                    s2, d2, j2, o2 = ops[b]
                    lit = m.new_bool_var(f"ord_m{mach}_{j1}{o1}_{j2}{o2}")
                    m.add(s1 + d1 <= s2).only_enforce_if(lit)
                    m.add(s2 + d2 <= s1).only_enforce_if(~lit)
                    order_bools.append(lit)
        # branch on sequencing decisions first
        m.add_decision_strategy(order_bools, "choose_first",
                                "select_min_value")
    makespan = m.new_int_var(0, horizon, "makespan")
    m.add_max_equality(
        makespan,
        [all_ops[j, len(job) - 1][0] + all_ops[j, len(job) - 1][1]
         for j, job in enumerate(instance.jobs)],
    )
    m.minimize(makespan)
    s = CpSolver()
    s.parameters.max_time_in_seconds = max_time_in_seconds
    status = s.solve(m)
    if status not in (OPTIMAL, FEASIBLE):
        return None
    starts = [
        [s.value(all_ops[j, o][0]) for o in range(len(job))]
        for j, job in enumerate(instance.jobs)
    ]
    return JobshopSolution(
        makespan=int(s.objective_value),
        starts=starts,
        optimal=status == OPTIMAL,
    )
