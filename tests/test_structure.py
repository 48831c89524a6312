"""Structural metrics + spectral algorithms vs networkx oracles."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.pipelines import algorithms
from graphscope_ray.pipelines.structure import (
    average_degree_connectivity,
    average_clustering,
    clustering_coefficient,
    degree_assortativity,
    edge_boundary,
    kcore,
    kshell,
    node_boundary,
    transitivity,
)
from graphscope_ray.sources.generator import MICRO_EDGES, MICRO_VERTICES, micro_edge_table
from graphscope_ray.state.graph import build_graph


@pytest.fixture(scope="module")
def rgraph():
    rng = np.random.default_rng(9)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 40, (160, 2))
                  if a != b})
    g = nx.Graph()
    g.add_edges_from(edges)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}))
    return g, ds


def test_clustering(rgraph):
    g, ds = rgraph
    got = clustering_coefficient(ds).to_pandas()
    want = nx.clustering(g)
    for vid, c in zip(got["vid"], got["clustering"]):
        assert c == pytest.approx(want[vid], abs=1e-12)
    assert average_clustering(ds) == pytest.approx(nx.average_clustering(g), abs=1e-12)
    assert transitivity(ds) == pytest.approx(nx.transitivity(g), abs=1e-12)


@pytest.mark.parametrize("broadcast", [None, False])
def test_assortativity(rgraph, broadcast):
    # broadcast=False exercises the vertex-scale-safe bucketed
    # co-group join path (no driver degree table)
    g, ds = rgraph
    got = degree_assortativity(ds, broadcast=broadcast)
    want = nx.degree_assortativity_coefficient(g)
    assert got == pytest.approx(want, abs=1e-9)


@pytest.mark.parametrize("broadcast", [None, False])
def test_avg_degree_connectivity(rgraph, broadcast):
    g, ds = rgraph
    got = dict(zip(*(average_degree_connectivity(ds, broadcast=broadcast)
                     .to_pandas()[c] for c in ("k", "avg_nbr_degree"))))
    want = nx.average_degree_connectivity(g)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_tri_deg_shuffle_path_matches_broadcast(rgraph):
    from graphscope_ray.pipelines.structure import _tri_deg

    _, ds = rgraph
    a = _tri_deg(ds, broadcast=True).to_pandas().sort_values("vid")
    b = _tri_deg(ds, broadcast=False).to_pandas().sort_values("vid")
    b = b[a.columns]
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_boundaries(rgraph):
    g, ds = rgraph
    s = [v for v in g.nodes if v < 10]
    got = sorted(node_boundary(ds, s).to_pandas()["vid"])
    want = sorted(nx.node_boundary(g, s))
    assert got == want
    got_e = {tuple(sorted(p)) for p in
             edge_boundary(ds, s).to_pandas()[["u", "v"]].to_numpy()}
    want_e = {tuple(sorted(p)) for p in nx.edge_boundary(g, s)}
    assert got_e == want_e


@pytest.mark.parametrize("k", [2, 3])
def test_kcore_kshell(rgraph, k):
    g, ds = rgraph
    def vids(ds_out):
        df = ds_out.to_pandas()
        # Ray's to_pandas drops the schema on 0-row datasets
        return sorted(df["vid"]) if "vid" in df.columns else []

    assert vids(kcore(ds, k)) == sorted(nx.k_core(g, k).nodes)
    assert vids(kshell(ds, k)) == sorted(nx.k_shell(g, k).nodes)


def _micro(directed, reverse=False):
    tab = micro_edge_table()
    df = tab.to_pandas()
    if reverse:
        df = df.rename(columns={"src": "dst", "dst": "src"})
    edges = ray.data.from_pandas(df)
    verts = ray.data.from_items([{"vid": v} for v in MICRO_VERTICES])
    return build_graph(edges, num_partitions=3, directed=directed,
                       extra_vertices=verts)


def test_hits_micro():
    from .oracles import oracle_hits

    want_h, want_a = oracle_hits(MICRO_EDGES, MICRO_VERTICES,
                                 max_iter=500, tol=1e-12)
    fwd, rev = _micro(True), _micro(True, reverse=True)
    hub, auth, _ = algorithms.hits(fwd, rev, max_iter=500, tol=1e-10)
    hdf, adf = hub.to_pandas(), auth.to_pandas()
    for vid, h in zip(hdf["vid"], hdf["hub"]):
        assert h == pytest.approx(want_h[vid], abs=1e-6), ("hub", vid)
    for vid, a in zip(adf["vid"], adf["authority"]):
        assert a == pytest.approx(want_a[vid], abs=1e-6), ("auth", vid)


def test_katz_micro():
    g = nx.DiGraph(MICRO_EDGES)
    g.add_nodes_from(MICRO_VERTICES)
    want = nx.katz_centrality(g, alpha=0.1, beta=1.0, tol=1e-10)
    graph = _micro(True)
    res, _ = algorithms.katz_centrality(graph, alpha=0.1, beta=1.0, tol=1e-10)
    df = res.to_pandas()
    for vid, x in zip(df["vid"], df["katz"]):
        assert x == pytest.approx(want[vid], abs=1e-6), vid


def test_eigenvector_micro():
    g = nx.Graph(MICRO_EDGES)  # undirected: symmetric adjacency
    want = nx.eigenvector_centrality(g, max_iter=500, tol=1e-10)
    graph = _micro(False)
    res, _ = algorithms.eigenvector_centrality(graph, max_iter=500, tol=1e-10)
    df = res.to_pandas()
    got = {v: x for v, x in zip(df["vid"], df["eigenvector"]) if v in want}
    for vid in want:
        assert got[vid] == pytest.approx(want[vid], abs=1e-5), vid


def test_voterank_micro():
    import networkx as nx

    # undirected micro graph; nodes added in sorted order so networkx's
    # first-max tie-break equals our min-vid tie-break
    g = nx.Graph()
    g.add_nodes_from(sorted(MICRO_VERTICES))
    g.add_edges_from(MICRO_EDGES)
    want = nx.voterank(g, 5)
    graph = _micro(False)
    got = algorithms.voterank(graph, 5)
    assert got == want


def test_voterank_random():
    import networkx as nx

    rng = np.random.default_rng(21)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 30, (90, 2))
                    if a != b})
    g = nx.Graph()
    g.add_nodes_from(range(30))
    g.add_edges_from(edges)
    want = nx.voterank(g, 8)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}))
    verts = ray.data.from_items([{"vid": v} for v in range(30)])
    graph = build_graph(ds, num_partitions=3, directed=False,
                        extra_vertices=verts, dedup_arcs=True)
    got = algorithms.voterank(graph, 8)
    assert got == want


def test_closeness_and_harmonic_micro():
    import networkx as nx

    g = nx.Graph(MICRO_EDGES)
    g.add_nodes_from(MICRO_VERTICES)
    want = nx.closeness_centrality(g)          # WF-improved by default
    want_h = nx.harmonic_centrality(g)
    graph = _micro(False)
    got = algorithms.closeness_centrality(graph, batch_size=5)
    gm = dict(zip(got["vid"], got["closeness"]))
    for v in want:
        assert gm[v] == pytest.approx(want[v], abs=1e-12), v
    got_h = algorithms.closeness_centrality(_micro(False), harmonic=True)
    hm = dict(zip(got_h["vid"], got_h["harmonic"]))
    for v in want_h:
        assert hm[v] == pytest.approx(want_h[v], abs=1e-12), v


def test_closeness_random():
    import networkx as nx

    rng = np.random.default_rng(31)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 50, (120, 2))
                    if a != b})
    g = nx.Graph()
    g.add_nodes_from(range(50))
    g.add_edges_from(edges)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}))
    verts = ray.data.from_items([{"vid": v} for v in range(50)])
    graph = build_graph(ds, num_partitions=4, directed=False,
                        extra_vertices=verts, dedup_arcs=True)
    got = algorithms.closeness_centrality(graph, batch_size=17)
    gm = dict(zip(got["vid"], got["closeness"]))
    want = nx.closeness_centrality(g)
    for v in want:
        assert gm[v] == pytest.approx(want[v], abs=1e-12), v


@pytest.mark.parametrize("k", [2, 3])
def test_kcore_pool_matches_dataset_peeling(rgraph, k):
    from graphscope_ray.pipelines.algorithms import kcore_pool
    from graphscope_ray.state.graph import build_graph

    g, ds = rgraph
    want = sorted(nx.k_core(g, k).nodes)
    sg = build_graph(ds, num_partitions=3, directed=False)
    got = sorted(kcore_pool(sg, k).to_pandas()["vid"])
    assert got == want


@pytest.mark.parametrize("k", [2, 3])
def test_kshell_pool(rgraph, k):
    from graphscope_ray.pipelines.algorithms import kshell_pool
    from graphscope_ray.state.graph import build_graph

    g, ds = rgraph
    want = sorted(nx.k_shell(g, k).nodes)
    sg = build_graph(ds, num_partitions=3, directed=False)
    df = kshell_pool(sg, k).to_pandas()
    got = sorted(df["vid"]) if "vid" in df.columns else []
    assert got == want


# ------------------------------------------------------------------ MSF


def test_msf_distinct_weights_exact():
    """Distinct weights => the MSF edge set is unique: exact parity vs
    networkx Kruskal, including across a disconnected forest."""
    from graphscope_ray.pipelines.msf import minimum_spanning_forest, msf_weight

    rng = np.random.default_rng(11)
    # two disjoint components (0-19, 100-119) => a true forest;
    # canonical (min,max) pairs so nx.Graph and the engine see the
    # same simple graph (a (b,a) twin with another weight would be a
    # multigraph nx.Graph silently collapses last-write-wins)
    edges = list({(min(int(a), int(b)), max(int(a), int(b)))
                  for a, b in rng.integers(0, 20, (80, 2)) if a != b})
    edges += [(a + 100, b + 100) for a, b in edges]
    w = rng.permutation(len(edges)) + 1.0  # distinct integer weights
    g = nx.Graph()
    for (a, b), ww in zip(edges, w):
        g.add_edge(a, b, weight=float(ww))
    want = {(min(a, b), max(a, b)): d["weight"]
            for a, b, d in nx.minimum_spanning_edges(g, algorithm="kruskal",
                                                     data=True)}
    ds = ray.data.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges],
         "weight": w})).repartition(7)
    got = minimum_spanning_forest(ds).to_pandas()
    gset = {(int(r.src), int(r.dst)): float(r.weight)
            for r in got.itertuples()}
    assert gset == want
    assert msf_weight(ds) == pytest.approx(sum(want.values()))


def test_msf_ties_partition_invariant():
    """Equal weights: total weight always matches networkx, and the
    chosen forest is identical at any partitioning (deterministic
    (w, min, max) tie order)."""
    from graphscope_ray.pipelines.msf import minimum_spanning_forest

    rng = np.random.default_rng(5)
    edges = list({(min(int(a), int(b)), max(int(a), int(b)))
                  for a, b in rng.integers(0, 30, (150, 2)) if a != b})
    w = rng.integers(1, 4, len(edges)).astype(float)  # many ties
    g = nx.Graph()
    for (a, b), ww in zip(edges, w):
        g.add_edge(a, b, weight=float(ww))
    want_total = sum(d["weight"] for _, _, d in nx.minimum_spanning_edges(
        g, algorithm="kruskal", data=True))
    df = pd.DataFrame({"src": [a for a, _ in edges],
                       "dst": [b for _, b in edges], "weight": w})
    outs = []
    for parts in (1, 4, 13):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = minimum_spanning_forest(ds).to_pandas().sort_values(
            ["src", "dst"]).reset_index(drop=True)
        outs.append(out)
        assert out["weight"].sum() == pytest.approx(want_total)
        assert len(out) == sum(1 for _ in nx.minimum_spanning_edges(g))
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])


def test_msf_unweighted_defaults_to_unit(rgraph):
    from graphscope_ray.pipelines.msf import minimum_spanning_forest

    g, ds = rgraph
    got = minimum_spanning_forest(ds).to_pandas()
    assert len(got) == g.number_of_nodes() - nx.number_connected_components(g)
    assert (got["weight"] == 1.0).all()
