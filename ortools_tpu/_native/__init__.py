from ortools_tpu._native.build import load_library  # noqa: F401
