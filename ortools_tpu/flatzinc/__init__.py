from ortools_tpu.flatzinc.driver import solve_flatzinc, solve_fzn_text  # noqa: F401
