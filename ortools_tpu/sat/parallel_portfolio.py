"""Process-parallel CP portfolio: real wall-clock parallelism.

Capability parity: the reference's ``NonDeterministicLoop``
(``ortools/sat/subsolver.cc:170``) — N workers each running a full solver
with diverse parameters, sharing the incumbent and objective bound.  The
reference uses C++ threads over one address space; the engine here is
Python, so workers are forked PROCESSES holding persistent engine state,
exchanging slices over pipes (the ``Shared*`` manager role lives in the
parent).  The deterministic interleaved portfolio (sat/portfolio.py)
remains the reproducible mode (``interleave_search=True``, A.10).

Soundness notes:

- the objective bound only ever tightens, so a worker exhausting its tree
  under an OLDER (looser) bound still proves no better solution exists;
- every candidate solution is re-checked by the caller against the
  original model (runtime self-verification contract), so worker results
  are advisory.
"""

from __future__ import annotations

import dataclasses
import multiprocessing as mp
import pickle
import time
from typing import Callable, List, Optional

from ortools_tpu.sat import model_ir as ir
from ortools_tpu.sat.portfolio import (
    LnsWorker,
    PortfolioOutcome,
    SLICE_BRANCHES,
    WORKER_CONFIGS,
)


def _worker_main(conn, work_bytes: bytes, cfg, deadline_wall: float,
                 max_branches: int, slice_branches: int) -> None:
    """Stateful worker process: holds a resumable Engine between slices."""
    from ortools_tpu.sat.engine import Engine

    work = pickle.loads(work_bytes)
    name, var_rule, value_rule, seed = cfg
    engine = None
    try:
        while True:
            msg = conn.recv()
            if msg[0] == "stop":
                return
            _, extra_bytes, reset = msg
            if engine is None or reset:
                cts = list(work.constraints)
                if extra_bytes is not None:
                    cts.extend(pickle.loads(extra_bytes))
                model = dataclasses.replace(work, constraints=cts)
                engine = Engine(
                    model, deadline=deadline_wall,
                    max_branches=max_branches, var_rule=var_rule,
                    value_rule=value_rule, seed=seed,
                    value_hints=dict(work.solution_hint),
                )
                doms = engine.initial_domains()
                if not engine.root_propagate(doms):
                    conn.send(("res", "root_infeasible", None,
                               engine.num_branches, engine.num_conflicts))
                    engine = None
                    continue
                engine.start_search(doms)
            found: List[Optional[List[int]]] = [None]

            def cb(values: List[int]) -> bool:
                found[0] = list(values)
                return False  # pause; parent decides

            outcome = engine.search_budget(cb, slice_branches)
            conn.send(("res", outcome, found[0],
                       engine.num_branches, engine.num_conflicts))
    except (EOFError, KeyboardInterrupt, BrokenPipeError):
        return


class ParallelPortfolio:
    """Same .run() interface as InterleavedPortfolio, but each tree worker
    is a forked process advancing concurrently; LNS workers run in the
    parent between collection rounds."""

    def __init__(self, work: ir.CpModelIR, num_workers: int,
                 deadline: float, max_branches: int,
                 num_lns: int = 0) -> None:
        self.work = work
        self.n_tree = max(1, num_workers - num_lns)
        self.lns_workers = [
            LnsWorker(work, deadline, seed=100 + k) for k in range(num_lns)
        ]
        self.deadline = deadline
        self.max_branches = max_branches
        self.num_branches = 0
        self.num_conflicts = 0
        self._procs: List[mp.Process] = []
        self._conns = []

    def _spawn(self) -> None:
        ctx = mp.get_context("fork")
        work_bytes = pickle.dumps(self.work)
        for i in range(self.n_tree):
            cfg = WORKER_CONFIGS[i % len(WORKER_CONFIGS)]
            parent, child = ctx.Pipe()
            p = ctx.Process(
                target=_worker_main,
                args=(child, work_bytes, cfg, self.deadline,
                      self.max_branches, SLICE_BRANCHES),
                daemon=True,
            )
            p.start()
            child.close()
            self._procs.append(p)
            self._conns.append(parent)

    def _shutdown(self) -> None:
        for conn in self._conns:
            try:
                conn.send(("stop",))
            except (BrokenPipeError, OSError):
                pass
        for p in self._procs:
            p.join(timeout=2.0)
            if p.is_alive():
                p.terminate()
                p.join(timeout=2.0)
        self._procs = []
        self._conns = []

    def run(self, on_candidate: Callable[[List[int]], bool],
            bound_ct_builder: Callable[[], Optional[ir.ConstraintIR]],
            stop_on_first: bool = False,
            best_provider: Optional[Callable[[], Optional[List[int]]]]
            = None) -> PortfolioOutcome:
        self._spawn()
        try:
            return self._run(on_candidate, bound_ct_builder, stop_on_first,
                             best_provider)
        finally:
            self._shutdown()

    def _send_slice(self, wi: int, reset: bool,
                    bound_ct: Optional[ir.ConstraintIR]) -> None:
        extra = (pickle.dumps([bound_ct]) if (reset and bound_ct is not None)
                 else (pickle.dumps([]) if reset else None))
        self._conns[wi].send(("slice", extra, reset))

    def _run(self, on_candidate, bound_ct_builder, stop_on_first,
             best_provider) -> PortfolioOutcome:
        n = self.n_tree
        bound_ct = bound_ct_builder()
        for wi in range(n):
            self._send_slice(wi, True, bound_ct)
        pending = set(range(n))
        stale = set()  # workers that must reset at their next dispatch
        counted = [0] * n  # branches already folded into totals

        while True:
            if time.perf_counter() > self.deadline or \
                    self.num_branches >= self.max_branches:
                return PortfolioOutcome("limit", self.num_branches,
                                        self.num_conflicts)
            ready = mp.connection.wait(
                [self._conns[i] for i in pending], timeout=1.0)
            if not ready:
                continue
            improved_any = False
            for conn in ready:
                wi = self._conns.index(conn)
                try:
                    _, outcome, sol, nb, nc = conn.recv()
                except EOFError:
                    pending.discard(wi)
                    continue
                self.num_branches += nb - counted[wi]
                self.num_conflicts += nc
                counted[wi] = nb
                pending.discard(wi)
                if sol is not None:
                    improved = on_candidate(sol)
                    if stop_on_first:
                        return PortfolioOutcome(
                            "stopped", self.num_branches, self.num_conflicts)
                    if improved:
                        improved_any = True
                elif outcome == "done":
                    # exhausted under a (possibly older, i.e. looser)
                    # bound: proves optimality/infeasibility either way
                    return PortfolioOutcome("optimal", self.num_branches,
                                            self.num_conflicts)
                elif outcome == "root_infeasible":
                    # With a bound ct: nothing better than the incumbent
                    # exists -> optimal.  Without one: model infeasible.
                    kind = "optimal" if bound_ct is not None else "infeasible"
                    return PortfolioOutcome(kind, self.num_branches,
                                            self.num_conflicts)
                elif outcome == "limit":
                    return PortfolioOutcome("limit", self.num_branches,
                                            self.num_conflicts)
            if improved_any:
                bound_ct = bound_ct_builder()
                stale.update(range(n))
            # LNS in the parent while children work
            if self.lns_workers and best_provider is not None \
                    and best_provider() is not None:
                found: List[Optional[List[int]]] = [None]

                def cb(values):
                    found[0] = list(values)
                    return False

                for lw in self.lns_workers:
                    lw.slice(best_provider(), bound_ct_builder(), cb)
                    self.num_branches += lw.num_branches
                    self.num_conflicts += lw.num_conflicts
                    lw.num_branches = lw.num_conflicts = 0
                    if found[0] is not None:
                        if on_candidate(found[0]):
                            bound_ct = bound_ct_builder()
                            stale.update(range(n))
                        found[0] = None
            # redispatch finished workers
            for wi in list(range(n)):
                if wi in pending or not self._procs[wi].is_alive():
                    continue
                reset = wi in stale
                stale.discard(wi)
                if reset:
                    counted[wi] = 0
                self._send_slice(wi, reset, bound_ct)
                pending.add(wi)
            if not pending and not any(p.is_alive() for p in self._procs):
                return PortfolioOutcome("limit", self.num_branches,
                                        self.num_conflicts)