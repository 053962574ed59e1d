from ortools_tpu.algorithms.knapsack import KnapsackSolver  # noqa: F401
from ortools_tpu.algorithms.set_cover import SetCoverModel, greedy_set_cover  # noqa: F401
