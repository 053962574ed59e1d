from ortools_tpu.linear_solver.model_builder import (  # noqa: F401
    LinearExpr,
    Model,
    Solver,
    Variable,
)
from ortools_tpu.utils.status import MPSolverStatus  # noqa: F401
