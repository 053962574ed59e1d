from ortools_tpu.constraint_solver.pywrapcp import (  # noqa: F401
    IntVar,
    Solver,
)
