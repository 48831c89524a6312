"""Multi-label property-graph family (reference apps/property/*.h):
WCC / SSSP over labeled fragments, per-label output, incremental
append — checked against networkx on the flattened union graph."""

import networkx as nx
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.pipelines.property import (
    LABEL_STRIDE,
    build_property_graph,
    sssp_property,
    sssp_property_append,
    wcc_property,
)


def _labeled_fixture(seed=3, n_a=40, n_b=30, m_ab=120, m_aa=60):
    """Two vertex labels (a, b) with overlapping oid spaces, two edge
    labels: a-b (weighted) and a-a (weighted)."""
    rng = np.random.default_rng(seed)
    ab = pd.DataFrame({
        "src": rng.integers(0, n_a, m_ab),
        "dst": rng.integers(0, n_b, m_ab),
        "w": rng.integers(1, 9, m_ab).astype(float),
    }).drop_duplicates(["src", "dst"])
    aa = pd.DataFrame({
        "src": rng.integers(0, n_a, m_aa),
        "dst": rng.integers(0, n_a, m_aa),
        "w": rng.integers(1, 9, m_aa).astype(float),
    })
    aa = aa[aa.src != aa.dst].drop_duplicates(["src", "dst"])
    va = pd.DataFrame({"id": np.arange(n_a)})
    vb = pd.DataFrame({"id": np.arange(n_b)})
    return va, vb, ab, aa


def _build(va, vb, ab, aa, P=3):
    return build_property_graph(
        {"a": (ray.data.from_pandas(va), "id"),
         "b": (ray.data.from_pandas(vb), "id")},
        {"ab": {"ds": ray.data.from_pandas(ab), "src_label": "a",
                "dst_label": "b", "weight": "w"},
         "aa": {"ds": ray.data.from_pandas(aa), "src_label": "a",
                "dst_label": "a", "weight": "w"}},
        num_partitions=P, directed=False,
    )


def _nx_union(va, vb, ab, aa):
    g = nx.Graph()
    for _, r in va.iterrows():
        g.add_node(("a", int(r.id)))
    for _, r in vb.iterrows():
        g.add_node(("b", int(r.id)))
    for _, r in ab.iterrows():
        g.add_edge(("a", int(r.src)), ("b", int(r.dst)), weight=float(r.w))
    for _, r in aa.iterrows():
        g.add_edge(("a", int(r.src)), ("a", int(r.dst)), weight=float(r.w))
    return g


def test_wcc_property_matches_networkx():
    va, vb, ab, aa = _labeled_fixture()
    pg = _build(va, vb, ab, aa)
    got = wcc_property(pg)[0].to_pandas()
    # same-component iff same label in both engines, across labels
    got["node"] = list(zip(got.label, got.vid))
    comp = dict(zip(got.node, got.component))
    g = _nx_union(va, vb, ab, aa)
    assert set(got.node) == set(g.nodes)
    for cc in nx.connected_components(g):
        ids = {comp[n] for n in cc}
        assert len(ids) == 1
        # component id = min member gid (deterministic relabel)
        lid = {"a": 0, "b": 1}
        assert ids.pop() == min(
            lid[l] * LABEL_STRIDE + v for l, v in cc)


def test_sssp_property_matches_dijkstra():
    va, vb, ab, aa = _labeled_fixture()
    pg = _build(va, vb, ab, aa)
    got = sssp_property(pg, "a", 0)[0].to_pandas()
    got["node"] = list(zip(got.label, got.vid))
    dist = dict(zip(got.node, got.distance))
    g = _nx_union(va, vb, ab, aa)
    want = nx.single_source_dijkstra_path_length(g, ("a", 0))
    for n in g.nodes:
        if n in want:
            assert dist[n] == pytest.approx(want[n], abs=1e-9), n
        else:
            assert not np.isfinite(dist[n]), n


def test_sssp_property_partition_invariance():
    va, vb, ab, aa = _labeled_fixture(seed=11)
    d1 = sssp_property(_build(va, vb, ab, aa, P=1), "a", 0)[0].to_pandas()
    d4 = sssp_property(_build(va, vb, ab, aa, P=4), "a", 0)[0].to_pandas()
    k = ["label", "vid"]
    m = d1.sort_values(k).reset_index(drop=True).merge(
        d4.sort_values(k).reset_index(drop=True), on=k)
    assert np.allclose(m.distance_x, m.distance_y, equal_nan=True)


def test_sssp_property_append_matches_full_recompute():
    va, vb, ab, aa = _labeled_fixture(seed=7)
    # hold back 30% of the ab edges as the appended batch
    cut = len(ab) * 7 // 10
    base_ab, new_ab = ab.iloc[:cut], ab.iloc[cut:]

    pg0 = _build(va, vb, base_ab, aa)
    prev = sssp_property(pg0, "a", 0)[0]

    pg1 = _build(va, vb, ab, aa)
    appended = {"ab": {"ds": ray.data.from_pandas(new_ab),
                       "src_label": "a", "dst_label": "b", "weight": "w"}}
    # undirected graph: the reversed arcs' sources are the dst side
    appended_rev = {"ab_rev": {
        "ds": ray.data.from_pandas(
            new_ab.rename(columns={"src": "dst", "dst": "src"})),
        "src_label": "b", "dst_label": "a", "weight": "w"}}
    inc, metrics = sssp_property_append(
        pg1, prev, {**appended, **appended_rev})
    full = sssp_property(pg1, "a", 0)[0].to_pandas()
    k = ["label", "vid"]
    m = full.sort_values(k).reset_index(drop=True).merge(
        inc.to_pandas().sort_values(k).reset_index(drop=True), on=k)
    assert len(m) == len(full)
    assert np.allclose(m.distance_x, m.distance_y, equal_nan=True)
    # warm start must do real incremental work, not a from-root rerun
    assert metrics["rounds"] >= 1
