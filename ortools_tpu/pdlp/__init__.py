from ortools_tpu.pdlp.params import PdhgParams  # noqa: F401
from ortools_tpu.pdlp.solver import solve, SolveResult  # noqa: F401
