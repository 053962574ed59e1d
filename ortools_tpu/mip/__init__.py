from ortools_tpu.mip.branch_and_bound import MipParams, MipResult, solve  # noqa: F401
