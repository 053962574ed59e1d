from ortools_tpu.models.lp import QuadraticProgram  # noqa: F401
from ortools_tpu.models.mps import read_mps, write_mps  # noqa: F401
