"""Host-side sparse containers with the full cross-format conversion graph.

Reference parity: include/loops/container/{coo,csr,csc,ell,bcsr,dia}.hxx
plus detail/convert.hxx. The forward-declaration hub pattern of
formats.hxx:22-62 is simply this package's namespace.
"""
from loops_tpu.formats.base import INDEX_DTYPE, VALUE_DTYPE  # noqa: F401
from loops_tpu.formats.coo import COO  # noqa: F401
from loops_tpu.formats.csr import CSR  # noqa: F401
from loops_tpu.formats.csc import CSC  # noqa: F401
from loops_tpu.formats.ell import ELL  # noqa: F401
from loops_tpu.formats.bcsr import BCSR  # noqa: F401
from loops_tpu.formats.dia import DIA  # noqa: F401
from loops_tpu.formats.advisor import (  # noqa: F401
    FormatAdvice,
    advise,
    choose_format,
)
from loops_tpu.formats.convert import (  # noqa: F401
    indices_to_offsets,
    offsets_to_indices,
    offsets_to_indices_jax,
)
