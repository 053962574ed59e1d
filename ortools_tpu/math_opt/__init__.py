from ortools_tpu.math_opt.model import (  # noqa: F401
    Model,
    SolveResult,
    SolverType,
    TerminationReason,
    solve,
)
