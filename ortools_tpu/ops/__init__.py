from ortools_tpu.ops.block_sparse import BlockSparseMatrix  # noqa: F401
