from ortools_tpu.glop.simplex import SimplexResult, solve  # noqa: F401
