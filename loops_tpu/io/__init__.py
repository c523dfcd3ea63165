"""I/O: Matrix Market loader, binary CSR cache, filepath helpers."""
from loops_tpu.io import binary, edges, filepath, market, ogb  # noqa: F401
from loops_tpu.io.edges import load_edges  # noqa: F401
from loops_tpu.io.market import load as load_market  # noqa: F401
from loops_tpu.io.market import load_csr as load_market_csr  # noqa: F401
