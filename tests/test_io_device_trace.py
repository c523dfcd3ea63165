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
