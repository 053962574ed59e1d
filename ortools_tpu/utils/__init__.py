from ortools_tpu.utils.status import TerminationReason, SolveStatus  # noqa: F401
from ortools_tpu.utils.domain import Domain  # noqa: F401
from ortools_tpu.utils.timers import WallTimer, TimeLimit  # noqa: F401
