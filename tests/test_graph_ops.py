"""Graph-management ops + readers vs pandas/networkx checks."""

import numpy as np
import pandas as pd
import ray.data

from graphscope_ray.sources.readers import (
    from_numpy_edges,
    read_edge_list,
)
from graphscope_ray.stages.graph_ops import (
    add_column,
    consolidate_columns,
    induce_subgraph,
    report_graph,
    reverse_view,
    to_directed,
    to_undirected,
)


def _edges():
    return ray.data.from_pandas(pd.DataFrame(
        {"src": [1, 2, 2, 3, 3, 1], "dst": [2, 1, 3, 2, 4, 1]}))


def test_orientation_ops():
    und = to_undirected(_edges()).to_pandas()
    assert sorted(map(tuple, und[["src", "dst"]].to_numpy())) == [
        (1, 2), (2, 3), (3, 4)]  # dedup + canon + self-loop dropped
    dirr = to_directed(ray.data.from_pandas(und)).to_pandas()
    assert len(dirr) == 6
    rev = reverse_view(_edges()).to_pandas()
    assert list(rev.columns[:2]) in (["dst", "src"], ["src", "dst"])
    assert sorted(rev["src"]) == sorted(_edges().to_pandas()["dst"])


def test_induce_and_report():
    sub = induce_subgraph(_edges(), [1, 2, 3]).to_pandas()
    assert 4 not in set(sub["src"]) | set(sub["dst"])
    rep = report_graph(_edges())
    assert rep == {"n_edges": 6, "n_vertices": 4}


def test_add_column_and_consolidate():
    verts = ray.data.from_pandas(pd.DataFrame({"vid": [1, 2, 3, 4]}))
    res = ray.data.from_pandas(pd.DataFrame({"vid": [1, 2], "score": [0.5, 0.7]}))
    out = add_column(verts, res).to_pandas().sort_values("vid")
    assert len(out) == 4 and out["score"].notna().sum() == 2
    cds = ray.data.from_pandas(pd.DataFrame({"a": ["x", "y"], "b": [1, 2]}))
    c = consolidate_columns(cds, ["a", "b"], "ab").to_pandas()
    assert sorted(c["ab"]) == ["x|1", "y|2"]


def test_edge_list_reader(tmp_path):
    p = tmp_path / "g.e"
    p.write_text("# comment\n1 2 0.5\n2 3 1.5\n\n3 1 2.0\n")
    ds = read_edge_list(str(p)).to_pandas().sort_values(["src", "dst"])
    assert list(ds["src"]) == [1, 2, 3]
    assert list(ds["weight"]) == [0.5, 1.5, 2.0]
    nds = from_numpy_edges(np.array([1, 2]), np.array([2, 3]))
    assert nds.count() == 2


def test_modify_edges():
    from graphscope_ray.stages.graph_ops import modify_edges

    base = ray.data.from_pandas(pd.DataFrame(
        {"src": [1, 2, 3], "dst": [2, 3, 4], "weight": [1.0, 1.0, 1.0]}))
    ups = ray.data.from_pandas(pd.DataFrame(
        {"src": [2, 5], "dst": [3, 6], "weight": [9.0, 2.0]}))
    out = modify_edges(base, ups).to_pandas().sort_values(["src", "dst"])
    assert len(out) == 4
    assert float(out[(out.src == 2) & (out.dst == 3)]["weight"].iloc[0]) == 9.0
    dele = modify_edges(base, ray.data.from_pandas(
        pd.DataFrame({"src": [1], "dst": [2]})), delete=True).to_pandas()
    assert sorted(map(tuple, dele[["src", "dst"]].to_numpy())) == [(2, 3), (3, 4)]


def test_sssp_helpers():
    from graphscope_ray.pipelines.algorithms import sssp_average_length, sssp_has_path
    from graphscope_ray.sources.generator import MICRO_EDGES, MICRO_VERTICES, micro_edge_table
    from graphscope_ray.state.graph import build_graph

    import networkx as nx
    verts = ray.data.from_items([{"vid": v} for v in MICRO_VERTICES])

    def g():
        return build_graph(ray.data.from_arrow(micro_edge_table()),
                           num_partitions=2, directed=True, extra_vertices=verts)

    nxg = nx.DiGraph(MICRO_EDGES)
    nxg.add_nodes_from(MICRO_VERTICES)
    want = nx.single_source_dijkstra_path_length(nxg, 0)
    assert sssp_average_length(g(), 0) == sum(want.values()) / len(want)
    assert sssp_has_path(g(), 0, 10) is True
    assert sssp_has_path(g(), 0, 11) is False


def test_modify_vertices_upsert_and_delete():
    from graphscope_ray.stages.graph_ops import modify_vertices

    base = ray.data.from_pandas(pd.DataFrame(
        {"vid": [1, 2, 3], "w": [1.0, 2.0, 3.0]}))
    upd = ray.data.from_pandas(pd.DataFrame(
        {"vid": [2, 4], "w": [20.0, 40.0]}))
    got = modify_vertices(base, upd).to_pandas().sort_values(
        "vid").reset_index(drop=True)
    assert got["vid"].tolist() == [1, 2, 3, 4]
    assert got["w"].tolist() == [1.0, 20.0, 3.0, 40.0]   # last-write-wins
    dele = modify_vertices(base, upd, delete=True).to_pandas()
    assert sorted(dele["vid"]) == [1, 3]


def test_add_labels():
    import pytest as _pytest

    from graphscope_ray.stages.graph_ops import add_labels

    cat = {"person": ray.data.from_items([{"vid": 1}])}
    out = add_labels(cat, {"company": ray.data.from_items([{"vid": 9}])})
    assert set(out) == {"person", "company"}
    assert "company" not in cat                    # original untouched
    with _pytest.raises(ValueError):
        add_labels(out, {"person": ray.data.from_items([{"vid": 2}])})


def test_read_edges_orc(tmp_path):
    import pyarrow as pa
    from pyarrow import orc

    from graphscope_ray.sources.readers import read_edges_orc

    tbl = pa.table({"from": pa.array([1, 2, 3], pa.int64()),
                    "to": pa.array([2, 3, 1], pa.int64()),
                    "w": pa.array([0.5, 1.5, 2.5], pa.float64())})
    p = str(tmp_path / "edges.orc")
    orc.write_table(tbl, p)
    ds = read_edges_orc(p, src="from", dst="to", weight="w")
    df = ds.to_pandas().sort_values("src").reset_index(drop=True)
    assert list(df.columns) == ["src", "dst", "weight"]
    assert df["src"].tolist() == [1, 2, 3]
    assert df["weight"].tolist() == [0.5, 1.5, 2.5]
