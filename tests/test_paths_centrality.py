"""Betweenness / APSP / sssp_path / attribute assortativity vs
networkx oracles (the round-2 additions), on random graphs at several
partition counts — partition invariance is part of the contract."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.pipelines import algorithms
from graphscope_ray.pipelines.structure import attribute_assortativity
from graphscope_ray.state.graph import build_graph


@pytest.fixture(scope="module")
def wgraph():
    """Random weighted graph (two components + isolated vertex)."""
    rng = np.random.default_rng(17)
    edges = sorted({(int(min(a, b)), int(max(a, b)))
                    for a, b in rng.integers(0, 30, (90, 2))
                    if a != b} | {(40, 41), (41, 42)})
    w = {e: float(rng.integers(1, 6)) for e in edges}
    g = nx.Graph()
    for (a, b), wt in w.items():
        g.add_edge(a, b, weight=wt)
    g.add_node(50)
    verts = sorted(g.nodes)
    ds = ray.data.from_pandas(pd.DataFrame({
        "src": [a for a, _ in edges], "dst": [b for _, b in edges],
        "weight": [w[e] for e in edges]}))
    vds = ray.data.from_items([{"vid": int(v)} for v in verts])
    return g, ds, vds, verts


@pytest.mark.parametrize("P", [1, 3])
def test_betweenness_vs_networkx(wgraph, P):
    g, ds, vds, verts = wgraph
    sg = build_graph(ds, num_partitions=P, directed=False, extra_vertices=vds)
    for normalized in (True, False):
        got = algorithms.betweenness_centrality(
            sg, batch_size=7, normalized=normalized
        ).to_pandas().set_index("vid")["betweenness"].to_dict()
        want = nx.betweenness_centrality(g, normalized=normalized)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9), (v, normalized)


def test_betweenness_sampled_sources(wgraph):
    g, ds, vds, verts = wgraph
    sg = build_graph(ds, num_partitions=2, directed=False, extra_vertices=vds)
    srcs = verts[::3]
    got = algorithms.betweenness_centrality(
        sg, batch_size=5, sources=srcs
    ).to_pandas().set_index("vid")["betweenness"].to_dict()
    # oracle: restrict Brandes accumulation to the sampled sources and
    # apply the networkx k-sample rescale (×n/k)
    n = len(verts)
    want = {v: 0.0 for v in verts}
    for s in srcs:
        dist = nx.single_source_shortest_path_length(g, s)
        # sigma + dependency via networkx internals-free recompute
        sigma = {v: 0.0 for v in verts}
        sigma[s] = 1.0
        order = sorted(dist, key=lambda v: dist[v])
        for v in order:
            for u in g.neighbors(v):
                if dist.get(u, -2) == dist[v] - 1:
                    sigma[v] += sigma[u]
        delta = {v: 0.0 for v in verts}
        for v in reversed(order):
            for u in g.neighbors(v):
                if dist.get(u, -2) == dist[v] - 1:
                    delta[u] += sigma[u] / sigma[v] * (1.0 + delta[v])
            if v != s:
                want[v] += delta[v]
    scale = 1.0 / ((n - 1) * (n - 2)) * (n / len(srcs))
    for v in want:
        assert got[v] == pytest.approx(want[v] * scale, abs=1e-9), v


@pytest.mark.parametrize("P", [1, 4])
def test_apsp_lengths(wgraph, P):
    g, ds, vds, verts = wgraph
    sg = build_graph(ds, num_partitions=P, directed=False, extra_vertices=vds)
    ap = algorithms.all_pairs_shortest_path_length(sg, batch_size=11).to_pandas()
    got = {}
    for r in ap.itertuples():
        got.setdefault(r.src, {})[r.dst] = r.length
    want = {s: dict(d) for s, d in nx.all_pairs_shortest_path_length(g)}
    assert got == want


@pytest.mark.parametrize("P", [1, 3])
def test_sssp_path_weighted(wgraph, P):
    g, ds, vds, verts = wgraph
    sg = build_graph(ds, num_partitions=P, directed=False, extra_vertices=vds)
    src = verts[0]
    dist_want = nx.single_source_dijkstra_path_length(g, src)
    table, path = algorithms.sssp_path(sg, source=src, target=verts[5],
                                       weighted=True)
    df = table.to_pandas().set_index("vid")
    # distances exact vs dijkstra
    for v, d in dist_want.items():
        assert df.loc[v, "distance"] == pytest.approx(d, abs=1e-12)
    # path validity + optimality (edge-by-edge, total = dijkstra dist)
    assert path is not None and path[0] == src and path[-1] == verts[5]
    tot = 0.0
    for a, b in zip(path, path[1:]):
        assert g.has_edge(a, b)
        tot += g[a][b]["weight"]
    assert tot == pytest.approx(dist_want[verts[5]], abs=1e-12)
    # parent array: every finite non-source vertex has an optimal,
    # minimal predecessor
    for v, d in dist_want.items():
        if v == src:
            continue
        p = int(df.loc[v, "parent"])
        opt = [u for u in g.neighbors(v)
               if dist_want.get(u, np.inf) + g[u][v]["weight"]
               == pytest.approx(d, abs=1e-12)]
        assert p == min(opt), v
    # unreachable target
    _, nopath = algorithms.sssp_path(sg, source=src, target=50, weighted=True)
    assert nopath is None


def test_attribute_assortativity_vs_networkx(wgraph):
    g, ds, vds, verts = wgraph
    attr = {v: ("red" if v % 3 == 0 else "blue" if v % 3 == 1 else "green")
            for v in verts}
    nx.set_node_attributes(g, attr, "color")
    adf = ray.data.from_pandas(pd.DataFrame({
        "vid": verts, "color": [attr[v] for v in verts]}))
    got = attribute_assortativity(ds, adf, "color")
    want = nx.attribute_assortativity_coefficient(g, "color")
    assert got == pytest.approx(want, abs=1e-12)


@pytest.mark.parametrize("P", [1, 3])
def test_betweenness_directed_bidi(P):
    rng = np.random.default_rng(29)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 25, (90, 2))
                    if a != b})
    G = nx.DiGraph()
    G.add_edges_from(edges)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}
    )).map_batches(lambda t: t.replace_schema_metadata(None),
                   batch_format="pyarrow")
    sg = build_graph(ds, num_partitions=P, directed=True, with_reverse=True)
    for normalized in (True, False):
        got = algorithms.betweenness_centrality(
            sg, batch_size=9, normalized=normalized
        ).to_pandas().set_index("vid")["betweenness"].to_dict()
        want = nx.betweenness_centrality(G, normalized=normalized)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9), (v, normalized)


@pytest.mark.parametrize("P", [1, 3])
def test_scc_vs_networkx(P):
    rng = np.random.default_rng(31)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 40, (120, 2))
                    if a != b})
    G = nx.DiGraph()
    G.add_nodes_from(range(40))
    G.add_edges_from(edges)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}
    )).map_batches(lambda t: t.replace_schema_metadata(None),
                   batch_format="pyarrow")
    vds = ray.data.from_items([{"vid": int(v)} for v in G.nodes])
    sg = build_graph(ds, num_partitions=P, directed=True, with_reverse=True,
                     extra_vertices=vds)
    got = algorithms.scc(sg).to_pandas()
    gm = dict(zip(got["vid"], got["scc"]))
    want = {v: max(c) for c in nx.strongly_connected_components(G) for v in c}
    assert gm == want


@pytest.mark.parametrize("P", [1, 3])
def test_scc_simultaneous_color_collision(P):
    """Regression: the micro-graph topology where the cycle
    {0..4}'s root (color 4) and a LARGER color root (10) both reach
    vertex 3 in the same backward wave. A per-destination max-combine
    of the sweep messages swallows the matching color and the whole
    cycle degrades to singletons — messages must stay raw and the
    receiver must match ANY incoming color."""
    src = [0, 1, 0, 2, 1, 3, 4, 5, 5, 6, 5, 5, 8, 4, 3, 7]
    dst = [1, 2, 2, 3, 3, 4, 0, 6, 7, 7, 8, 9, 9, 5, 10, 10]
    G = nx.DiGraph(list(zip(src, dst)))
    ds = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    sg = build_graph(ds, num_partitions=P, directed=True,
                     with_reverse=True)
    got = algorithms.scc(sg).to_pandas()
    want = {v: max(c) for c in nx.strongly_connected_components(G)
            for v in c}
    assert dict(zip(got["vid"], got["scc"])) == want
    # nested cycles sharing a vertex, plus a chain of 2-cycles
    src2 = [0, 1, 2, 1, 3, 4, 5, 6, 5, 7]
    dst2 = [1, 2, 0, 3, 1, 5, 4, 5, 6, 4]
    G2 = nx.DiGraph(list(zip(src2, dst2)))
    ds2 = ray.data.from_pandas(pd.DataFrame({"src": src2, "dst": dst2}))
    sg2 = build_graph(ds2, num_partitions=P, directed=True,
                      with_reverse=True)
    got2 = algorithms.scc(sg2).to_pandas()
    want2 = {v: max(c) for c in nx.strongly_connected_components(G2)
             for v in c}
    assert dict(zip(got2["vid"], got2["scc"])) == want2


@pytest.mark.parametrize("P,directed", [(1, False), (3, False), (3, True)])
def test_personalized_pagerank(wgraph, P, directed):
    g, ds, vds, verts = wgraph
    sg = build_graph(ds, num_partitions=P, directed=directed,
                     extra_vertices=vds)
    seeds = [verts[0], verts[4], verts[9]]
    got = algorithms.personalized_pagerank(
        sg, seeds, alpha=0.85, tol=1e-10
    )[0].to_pandas().set_index("vid")["ppr"].to_dict()
    # pure-python replica of networkx._pagerank_python with
    # personalization (scipy is absent in this container)
    G = nx.DiGraph() if directed else nx.Graph()
    G.add_nodes_from(verts)
    # the undirected fixture's g.edges view flips some orientations;
    # the engine consumed the canonical (a<b) rows — rebuild from those
    G.add_edges_from(
        (int(a), int(b))
        for a, b in zip(ds.to_pandas()["src"], ds.to_pandas()["dst"]))
    N = len(verts)
    pvec = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in verts}
    x = dict.fromkeys(verts, 1.0 / N)
    out = {v: (G.out_degree(v) if directed else G.degree(v)) for v in verts}
    succ = {v: (list(G.successors(v)) if directed else list(G.neighbors(v)))
            for v in verts}
    alpha = 0.85
    for _ in range(200):
        xlast = x
        x = dict.fromkeys(verts, 0.0)
        danglesum = alpha * sum(xlast[v] for v in verts if out[v] == 0)
        for v in verts:
            if out[v]:
                share = alpha * xlast[v] / out[v]
                for u in succ[v]:
                    x[u] += share
        for v in verts:
            x[v] += danglesum * pvec[v] + (1 - alpha) * pvec[v]
        if sum(abs(x[v] - xlast[v]) for v in verts) < N * 1e-12:
            break
    for v in verts:
        assert got[v] == pytest.approx(x[v], abs=1e-6), v
