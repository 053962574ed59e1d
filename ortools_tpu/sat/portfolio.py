"""Deterministic interleaved search portfolio.

Capability parity: the reference's parallel portfolio layer (SURVEY §2.4.6)
— SolveCpModelParallel (cp_model_solver.cc:3360) with `interleave_search`:
diverse workers advance in fixed round-robin slices of deterministic work
(here: branch counts, the dtime analogue), sharing the incumbent and
objective bound between slices (the SharedResponseManager role).  Same
results on every run by construction (A.10 determinism contract).

Worker diversity follows the reference's named-config idea (A.5): the
configs differ in branching variable/value rules and seeds rather than a
single strategy running longer.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional, Tuple

from ortools_tpu.sat import model_ir as ir
from ortools_tpu.sat.engine import Engine
from ortools_tpu.utils.domain import Domain, INT_MIN

# (name, var_rule, value_rule, seed) — diversity catalogue
WORKER_CONFIGS = [
    ("default", "min_domain", "min", 0),
    ("split", "min_domain", "split", 0),
    ("max_value", "min_domain", "max", 0),
    ("random_1", "random", "random", 1),
    ("random_2", "random", "random", 2),
    ("first_min", "first", "min", 0),
    ("random_3", "random", "min", 3),
    ("split_random", "random", "split", 4),
]

SLICE_BRANCHES = 512
LNS_BRANCHES = 2000  # per LNS subproblem solve
LNS_RELAX_FRACTION = 0.3  # fraction of variables freed each round


class LnsWorker:
    """Large-neighborhood-search worker (reference cp_model_lns.h random
    variable relaxation generator): fix a random subset of variables to the
    incumbent, search the free rest under the objective bound."""

    def __init__(self, work: "ir.CpModelIR", deadline: float,
                 seed: int) -> None:
        import random as _random

        self.work = work
        self.deadline = deadline
        self._rng = _random.Random(seed)
        self.num_branches = 0
        self.num_conflicts = 0

    def slice(self, best: Optional[List[int]],
              bound_ct: Optional[ir.ConstraintIR],
              cb) -> None:
        if best is None:
            return
        nvars = len(self.work.variables)
        keep = max(0, int(nvars * (1.0 - LNS_RELAX_FRACTION)))
        fixed_idx = self._rng.sample(range(nvars), keep) if keep else []
        cts = list(self.work.constraints)
        if bound_ct is not None:
            cts.append(bound_ct)
        for v in fixed_idx:
            val = best[v] if v < len(best) else 0
            if not self.work.variables[v].domain.contains(val):
                continue
            cts.append(ir.ConstraintIR(
                "linear", ir.LinearArgs([v], [1], Domain(val, val))
            ))
        sub = dataclasses.replace(self.work, constraints=cts)
        e = Engine(sub, deadline=self.deadline, max_branches=LNS_BRANCHES,
                   var_rule="random", value_rule="random",
                   seed=self._rng.randrange(1 << 30))
        doms = e.initial_domains()
        try:
            if e.root_propagate(doms):
                e.search(doms, cb)
        finally:
            self.num_branches += e.num_branches
            self.num_conflicts += e.num_conflicts


@dataclasses.dataclass
class PortfolioOutcome:
    # "optimal": best_solution proven optimal (or search exhausted)
    # "infeasible": proven no solution (under current bound none existed
    #                and no incumbent)
    # "limit": stopped by time/branch limits
    outcome: str
    num_branches: int
    num_conflicts: int


class InterleavedPortfolio:
    def __init__(self, work: ir.CpModelIR, num_workers: int,
                 deadline: float, max_branches: int,
                 num_lns: int = 0) -> None:
        self.work = work
        n_tree = max(1, num_workers - num_lns)
        self.configs = [
            WORKER_CONFIGS[i % len(WORKER_CONFIGS)]
            for i in range(n_tree)
        ]
        self.lns_workers = [
            LnsWorker(work, deadline, seed=100 + k) for k in range(num_lns)
        ]
        self.deadline = deadline
        self.max_branches = max_branches
        self.num_branches = 0
        self.num_conflicts = 0

    def _build_engines(self, bound_ct: Optional[ir.ConstraintIR]
                       ) -> List[Engine]:
        cts = list(self.work.constraints)
        if bound_ct is not None:
            cts = cts + [bound_ct]
        model = dataclasses.replace(self.work, constraints=cts)
        engines = []
        hints = dict(self.work.solution_hint)
        for name, var_rule, value_rule, seed in self.configs:
            e = Engine(model, deadline=self.deadline,
                       max_branches=self.max_branches,
                       var_rule=var_rule, value_rule=value_rule, seed=seed,
                       value_hints=hints)
            engines.append(e)
        return engines

    def run(self, on_candidate: Callable[[List[int]], bool],
            bound_ct_builder: Callable[[], Optional[ir.ConstraintIR]],
            stop_on_first: bool = False,
            best_provider: Optional[Callable[[], Optional[List[int]]]]
            = None) -> PortfolioOutcome:
        """Interleave workers until the search is decided.

        ``on_candidate(values) -> improved`` is called for each solution a
        worker finds; when it returns True (incumbent improved) all workers
        restart against the new bound from ``bound_ct_builder()``.
        """
        engines = self._build_engines(bound_ct_builder())
        for e in engines:
            doms = e.initial_domains()
            if not e.root_propagate(doms):
                # bound/root infeasible: proven (any worker's root proof
                # is a proof for all — same model)
                return PortfolioOutcome("infeasible",
                                        self.num_branches,
                                        self.num_conflicts)
            e.start_search(doms)

        active = list(range(len(engines)))
        while True:
            if time.perf_counter() > self.deadline:
                return PortfolioOutcome("limit", self.num_branches,
                                        self.num_conflicts)
            if self.num_branches >= self.max_branches:
                return PortfolioOutcome("limit", self.num_branches,
                                        self.num_conflicts)
            restart = [False]
            found: List[Optional[List[int]]] = [None]

            def cb(values: List[int]) -> bool:
                found[0] = values
                return False  # pause this worker; portfolio decides

            for wi in list(active):
                e = engines[wi]
                outcome = e.search_budget(cb, SLICE_BRANCHES)
                self.num_branches += 0  # engines track their own; sum below
                if found[0] is not None:
                    improved = on_candidate(found[0])
                    found[0] = None
                    if stop_on_first:
                        self._accumulate(engines)
                        return PortfolioOutcome(
                            "stopped", self.num_branches, self.num_conflicts
                        )
                    if improved:
                        restart[0] = True
                        break
                    # not improving: worker continues next slice (its tree
                    # already excludes nothing; bound unchanged)
                    continue
                if outcome == "done":
                    # this worker exhausted the (bounded) tree: proven
                    self._accumulate(engines)
                    return PortfolioOutcome("optimal", self.num_branches,
                                            self.num_conflicts)
                if outcome == "limit":
                    self._accumulate(engines)
                    return PortfolioOutcome("limit", self.num_branches,
                                            self.num_conflicts)
            # LNS workers: one neighborhood solve per round
            if not restart[0] and self.lns_workers and \
                    best_provider is not None:
                for lw in self.lns_workers:
                    lw.slice(best_provider(), bound_ct_builder(), cb)
                    if found[0] is not None:
                        improved = on_candidate(found[0])
                        found[0] = None
                        if improved:
                            restart[0] = True
                            break
            if restart[0]:
                self._accumulate(engines)
                engines = self._build_engines(bound_ct_builder())
                dead = False
                for e in engines:
                    doms = e.initial_domains()
                    if not e.root_propagate(doms):
                        dead = True
                        break
                    e.start_search(doms)
                if dead:
                    # nothing better exists: current incumbent optimal
                    return PortfolioOutcome("optimal", self.num_branches,
                                            self.num_conflicts)
                active = list(range(len(engines)))

    def _accumulate(self, engines: List[Engine]) -> None:
        self.num_branches += sum(e.num_branches for e in engines)
        self.num_conflicts += sum(e.num_conflicts for e in engines)
        for lw in self.lns_workers:
            self.num_branches += lw.num_branches
            self.num_conflicts += lw.num_conflicts
            lw.num_branches = 0
            lw.num_conflicts = 0
