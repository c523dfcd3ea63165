"""GNN model family: message passing, GCN, GraphSAGE, sampling, training."""
from loops_tpu.models.gat import GAT, init_gat  # noqa: F401
from loops_tpu.models.gatv2 import GATv2, init_gatv2  # noqa: F401
from loops_tpu.models.gcn import GCN, init_gcn  # noqa: F401
from loops_tpu.models.graph import Graph  # noqa: F401
from loops_tpu.models.message_passing import aggregate_operator, edge_aggregate  # noqa: F401
from loops_tpu.models.sage import GraphSAGE, init_sage, make_sampled_train_step  # noqa: F401
from loops_tpu.models.sampling import sample_neighbors, sampled_block  # noqa: F401
from loops_tpu.models import train  # noqa: F401
from loops_tpu.models import checkpoint  # noqa: F401
