"""Device operators: SpMV / SpMM / SDDMM over the schedule planners."""
from loops_tpu.ops.sddmm import SDDMMOperator, sddmm  # noqa: F401
from loops_tpu.ops.spmm import SpMMOperator, spmm  # noqa: F401
from loops_tpu.ops.spmv import SpMVOperator, flat_partitioned_spmv, spmv  # noqa: F401
