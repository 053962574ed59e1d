from ortools_tpu.graph.max_flow import SimpleMaxFlow  # noqa: F401
from ortools_tpu.graph.min_cost_flow import SimpleMinCostFlow  # noqa: F401
from ortools_tpu.graph.shortest_paths import dijkstra_shortest_path  # noqa: F401
from ortools_tpu.graph.assignment import LinearSumAssignment  # noqa: F401
