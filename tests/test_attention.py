"""Fused grouped attention aggregation vs the per-edge oracle."""
import numpy as np
import pytest

from loops_tpu.ops.attention import (
    GroupedAttentionAggregate,
    reference_attention_aggregate,
)
from loops_tpu.utils import generate


@pytest.mark.parametrize("name,mk", [
    ("random", lambda: generate.random_csr(50, 50, 0.12, seed=2)),
    ("skewed", lambda: generate.skewed_csr(24, 24, heavy_rows=3)),
    ("tridiag", lambda: generate.tridiag_csr(33)),
])
def test_grouped_attention_matches_oracle(name, mk):
    csr = mk()
    # ensure no empty rows (GAT always adds self loops); add identity
    dense = csr.to_dense() + np.eye(csr.shape[0], dtype=np.float32)
    from loops_tpu.formats import COO
    csr = COO.from_dense(dense).to_csr()

    n = csr.shape[0]
    H, D = 3, 5
    rng = np.random.default_rng(0)
    s_src = rng.normal(size=(n, H)).astype(np.float32)
    s_dst = rng.normal(size=(n, H)).astype(np.float32)
    hw = rng.normal(size=(n, H, D)).astype(np.float32)

    op = GroupedAttentionAggregate(csr)
    got = np.asarray(op(s_src, s_dst, hw))
    want = reference_attention_aggregate(csr, s_src, s_dst, hw)
    assert np.allclose(got, want, atol=1e-4, rtol=1e-4), (
        np.abs(got - want).max())


def test_gat_fused_matches_textbook():
    import jax

    from loops_tpu.models import GAT
    from loops_tpu.models.graph import Graph
    from loops_tpu.utils import generate

    csr = generate.random_csr(40, 40, 0.1, seed=7)
    g = Graph(csr)
    dims = [12, 8, 4]
    m_f = GAT(g, dims, heads=2, fused=True)
    m_t = GAT(g, dims, heads=2, fused=False)
    params = m_f.init(jax.random.PRNGKey(0))
    x = np.asarray(generate.make_input_vector(40 * 12)).reshape(40, 12)
    yf = np.asarray(m_f.apply(params, x))
    yt = np.asarray(m_t.apply(params, x))
    assert np.allclose(yf, yt, atol=1e-4, rtol=1e-4)


def test_grouped_attention_bf16_close():
    csr = generate.random_csr(40, 40, 0.12, seed=3)
    dense = csr.to_dense() + np.eye(40, dtype=np.float32)
    from loops_tpu.formats import COO
    csr = COO.from_dense(dense).to_csr()
    rng = np.random.default_rng(1)
    s_src = rng.normal(size=(40, 2)).astype(np.float32)
    s_dst = rng.normal(size=(40, 2)).astype(np.float32)
    hw = rng.normal(size=(40, 2, 8)).astype(np.float32)
    f32 = np.asarray(GroupedAttentionAggregate(csr)(s_src, s_dst, hw))
    bf = np.asarray(GroupedAttentionAggregate(csr, dtype="bfloat16")(
        s_src, s_dst, hw))
    assert np.allclose(bf, f32, atol=0.05, rtol=0.05)


def test_grouped_attention_custom_vjp_matches_autodiff():
    """Custom VJP (transposed-plan backward) vs autodiff of the
    per-edge textbook composition — same graph, same cotangent."""
    import jax
    import jax.numpy as jnp

    from loops_tpu.ops.segment import segment_softmax, segment_sum

    csr = generate.random_csr(37, 37, 0.15, seed=5)
    dense = csr.to_dense() + np.eye(37, dtype=np.float32)
    from loops_tpu.formats import COO
    csr = COO.from_dense(dense).to_csr()
    n = csr.shape[0]
    H, D = 3, 6
    rng = np.random.default_rng(4)
    s_src = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    hw = jnp.asarray(rng.normal(size=(n, H, D)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(n, H, D)).astype(np.float32))

    op = GroupedAttentionAggregate(csr, negative_slope=0.2)
    dst = jnp.asarray(csr.row_ids())
    src = jnp.asarray(csr.indices)

    def textbook(ss, sd, f):
        e = ss[src] + sd[dst]
        e = jax.nn.leaky_relu(e, 0.2)
        alpha = segment_softmax(e, dst, n, sorted_ids=True)
        msgs = (alpha[..., None] * f[src]).reshape(-1, H * D)
        return segment_sum(msgs, dst, n, sorted_ids=True).reshape(n, H, D)

    def loss_fused(ss, sd, f):
        return jnp.vdot(op.apply(ss, sd, f), ct)

    def loss_text(ss, sd, f):
        return jnp.vdot(textbook(ss, sd, f), ct)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(s_src, s_dst, hw)
    g_t = jax.grad(loss_text, argnums=(0, 1, 2))(s_src, s_dst, hw)
    for a, b, name in zip(g_f, g_t, ("s_src", "s_dst", "hw")):
        assert np.allclose(np.asarray(a), np.asarray(b),
                           atol=2e-4, rtol=2e-4), (
            name, np.abs(np.asarray(a) - np.asarray(b)).max())


def test_gat_fused_grad_matches_textbook():
    """End-to-end model gradients: fused (custom VJP) vs textbook."""
    import jax
    import jax.numpy as jnp

    from loops_tpu.models import GAT
    from loops_tpu.models.graph import Graph

    csr = generate.random_csr(30, 30, 0.12, seed=9)
    g = Graph(csr)
    dims = [8, 6, 3]
    m_f = GAT(g, dims, heads=2, fused=True)
    m_t = GAT(g, dims, heads=2, fused=False)
    params = m_f.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(30, 8)).astype(np.float32))

    def loss(model, p):
        return (model.apply(p, x) ** 2).sum()

    gf = jax.grad(lambda p: loss(m_f, p))(params)
    gt = jax.grad(lambda p: loss(m_t, p))(params)
    flat_f, _ = jax.tree_util.tree_flatten(gf)
    flat_t, _ = jax.tree_util.tree_flatten(gt)
    for a, b in zip(flat_f, flat_t):
        assert np.allclose(np.asarray(a), np.asarray(b),
                           atol=5e-3, rtol=5e-3), (
            np.abs(np.asarray(a) - np.asarray(b)).max())


def test_grouped_attention_custom_vjp_bf16_close():
    """bf16 feature-gather mode through the custom VJP: gradients close
    to the f32 path (one bf16 rounding on products and grads)."""
    import jax
    import jax.numpy as jnp

    csr = generate.random_csr(40, 40, 0.15, seed=12)
    dense = csr.to_dense() + np.eye(40, dtype=np.float32)
    from loops_tpu.formats import COO
    csr = COO.from_dense(dense).to_csr()
    n, H, D = 40, 2, 8
    rng = np.random.default_rng(3)
    s_src = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    hw = jnp.asarray(rng.normal(size=(n, H, D)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(n, H, D)).astype(np.float32))

    def loss(op):
        return lambda ss, sd, f: jnp.vdot(op.apply(ss, sd, f), ct)

    g32 = jax.grad(loss(GroupedAttentionAggregate(csr)),
                   argnums=(0, 1, 2))(s_src, s_dst, hw)
    gbf = jax.grad(loss(GroupedAttentionAggregate(csr, dtype="bfloat16")),
                   argnums=(0, 1, 2))(s_src, s_dst, hw)
    for a, b in zip(g32, gbf):
        assert np.allclose(np.asarray(a), np.asarray(b),
                           atol=0.08, rtol=0.08), (
            np.abs(np.asarray(a) - np.asarray(b)).max())
