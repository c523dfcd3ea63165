"""GATv2 (Brody, Alon & Yahav 2022) — dynamic graph attention.

GATv1's score ``a . [Wh_i || Wh_j]`` factorizes into node halves, so
its attention ranking is the same for every query node ("static
attention"). GATv2 moves the nonlinearity inside —
``e_ij = a . leaky_relu(W_l h_i + W_r h_j)`` — which makes the score a
genuine per-edge vector computation. That is exactly the workload
class this framework schedules: the fused pass runs score + masked
softmax + weighted aggregation inside the group_mapped plane windows
(ops/attention.GroupedAttentionV2), with zero per-edge scatters.

Beyond-reference model family (the reference stops at SpMV/SpMM);
north-star consumer of the attention primitive pair alongside GATv1.
"""
from __future__ import annotations

import numpy as np

from loops_tpu.models.gcn import _glorot
from loops_tpu.models.graph import Graph
from loops_tpu.ops.segment import segment_softmax, segment_sum


def init_gatv2(key, dims, heads: int = 4):
    import jax

    layers = []
    keys = jax.random.split(key, 3 * (len(dims) - 1))
    for i in range(len(dims) - 1):
        d_in = dims[i] * (heads if i > 0 else 1)
        d_out = dims[i + 1]
        layer = {
            # W_l (destination role) and W_r (source role; also the
            # value transform, per the paper's reference impl)
            "w_l": _glorot(keys[3 * i], d_in, heads * d_out),
            "w_r": _glorot(keys[3 * i + 1], d_in, heads * d_out),
            "a": _glorot(keys[3 * i + 2], heads, d_out),
        }
        if i == len(dims) - 2:
            # apply() only adds the bias on the head-averaged last
            # layer; intermediate biases would be dead parameters
            layer["b"] = np.zeros(d_out, np.float32)
        layers.append(layer)
    return layers


class GATv2:
    """Multi-head GATv2; heads averaged on the last layer, concatenated
    elsewhere (same head handling as models/gat.py).

    ``fused=True`` (default) runs each layer through the bucketed
    group_mapped pass; ``fused=False`` is the textbook per-edge
    composition (the oracle for tests). Backward is autodiff through
    either path — the v2 score's in-edge nonlinearity breaks the
    scalar-half identities GATv1's transposed-plan custom VJP uses.
    """

    def __init__(self, graph: Graph, dims, heads: int = 4,
                 negative_slope: float = 0.2, fused: bool = True,
                 dtype=None):
        self.graph = graph.add_self_loops()
        self.dims = list(dims)
        self.heads = heads
        self.negative_slope = negative_slope
        self.fused = fused
        adj = self.graph.adj
        import jax.numpy as jnp

        self._dst = jnp.asarray(adj.row_ids())
        self._src = jnp.asarray(adj.indices)
        self._n = self.graph.num_nodes
        if fused:
            from loops_tpu.ops.attention import GroupedAttentionV2
            self._fused_op = GroupedAttentionV2(adj, negative_slope,
                                                dtype=dtype)

    def init(self, key):
        return init_gatv2(key, self.dims, self.heads)

    def apply(self, params, h):
        import jax
        import jax.numpy as jnp

        H = self.heads
        src, dst, n = self._src, self._dst, self._n
        for li, layer in enumerate(params):
            d_out = layer["a"].shape[1]
            v = (h @ layer["w_l"]).reshape(-1, H, d_out)   # dest role
            u = (h @ layer["w_r"]).reshape(-1, H, d_out)   # src role
            if self.fused:
                out = self._fused_op.apply(u, v, layer["a"], u)
            else:
                # textbook per-edge composition over flat [., H*D]
                # views (3-D gathers hit the per-element slow path)
                pre = (u.reshape(n, -1)[src].reshape(-1, H, d_out)
                       + v.reshape(n, -1)[dst].reshape(-1, H, d_out))
                e = jnp.einsum(
                    "ehd,hd->eh",
                    jax.nn.leaky_relu(pre, self.negative_slope),
                    layer["a"])
                alpha = segment_softmax(e, dst, n, sorted_ids=True)
                us = u.reshape(n, -1)[src].reshape(-1, H, d_out)
                msgs = (alpha[..., None] * us).reshape(-1, H * d_out)
                out = segment_sum(msgs, dst, n, sorted_ids=True)
                out = out.reshape(n, H, d_out)
            if li + 1 < len(params):
                h = jax.nn.elu(out.reshape(n, H * d_out))
            else:
                h = out.mean(axis=1) + layer["b"]
        return h
