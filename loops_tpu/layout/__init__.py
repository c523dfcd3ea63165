"""Layout views + partitioners: the tile/atom contract and its
implementations (reference: include/loops/container/layout.hxx +
partitioning.hxx)."""
from loops_tpu.layout.contract import (  # noqa: F401
    Layout,
    check_layout_invariants,
    check_tile_of_round_trip,
)
from loops_tpu.layout.merge_path import (  # noqa: F401
    merge_path_partition,
    merge_path_partition_jax,
    merge_path_reference,
)
from loops_tpu.layout.partition import FlatRebinLayout  # noqa: F401
from loops_tpu.layout.views import (  # noqa: F401
    BcsrLayout,
    CooLayout,
    CscLayout,
    CsrLayout,
    DiaLayout,
    EllLayout,
    OffsetsLayout,
    UniformLayout,
)
from loops_tpu.layout.reorder import (  # noqa: F401
    bandwidth,
    bfs_order,
    degree_order,
    inverse_permutation,
    permute_csr,
)
