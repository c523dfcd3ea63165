"""Device query, trace helpers, OGB loader (synthetic path), bucketing
alias."""
import numpy as np

from loops_tpu.io import ogb
from loops_tpu.layout import CsrLayout
from loops_tpu.schedule import make_plan
from loops_tpu.utils import device, trace, generate


def test_device_properties():
    p = device.properties()
    assert p["platform"] == "cpu"
    assert p["num_devices"] == 8
    assert device.num_devices() == 8


def test_csv_row_contract():
    row = trace.csv_row("merge_path", "chesapeake", 39, 39, 340, 0.042)
    assert row == "merge_path,chesapeake,39,39,340,0.04200"


def test_synthetic_dataset_shapes():
    ds = ogb.load("tiny")
    assert ds.synthetic
    n = ds.graph.num_nodes
    assert ds.features.shape[0] == n
    assert ds.labels.shape == (n,)
    assert ds.num_classes >= 2
    # splits partition the nodes
    total = ds.train_mask + ds.val_mask + ds.test_mask
    np.testing.assert_allclose(total, 1.0)


def test_synthetic_scaled_arxiv_is_powerlaw():
    ds = ogb.load("ogbn-arxiv", scale=0.01)
    deg = ds.graph.in_degrees()
    # power-law-ish: max degree far above mean
    assert deg.max() > 10 * max(deg.mean(), 1)


def test_bucketing_alias():
    layout = CsrLayout.from_csr(generate.random_csr(10, 10, 0.3, seed=1))
    a = make_plan(layout, "bucketing")
    b = make_plan(layout, "group_mapped")
    assert len(a.buckets) == len(b.buckets)


def test_edge_list_loader():
    from loops_tpu.io import load_edges

    data = b"# comment\n0 1 2.0\n1 2\n2 0 0.5\n"
    g = load_edges(data)
    assert g.num_nodes == 3 and g.num_edges == 3
    assert g.adj.to_dense()[1, 0] == 2.0  # dst=1, src=0
    g2 = load_edges(b"0,1\n1,2\n", make_undirected=True)
    assert g2.num_edges == 4


def test_gcn_remat_matches():
    import jax

    from loops_tpu.models import GCN, Graph

    rng = np.random.default_rng(1)
    g = Graph.from_edges(rng.integers(0, 12, 30), rng.integers(0, 12, 30),
                         12, make_undirected=True)
    feats = rng.normal(size=(12, 5)).astype(np.float32)
    m1 = GCN(g, [5, 7, 3], dropout=0.0, remat=False)
    m2 = GCN(g, [5, 7, 3], dropout=0.0, remat=True)
    params = m1.init(jax.random.PRNGKey(0))
    o1 = np.asarray(m1.apply(params, feats))
    o2 = np.asarray(m2.apply(params, feats))
    np.testing.assert_allclose(o1, o2, rtol=1e-5, atol=1e-6)
    # grads flow through the checkpointed layers
    loss = lambda p: (m2.apply(p, feats) ** 2).sum()
    gr = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(gr[0]["w"])).all()
