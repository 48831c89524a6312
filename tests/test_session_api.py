"""Eager-session façade + nx-compat surface vs real networkx.

The reference's primary user path (session → g() → app → context,
SURVEY §3.1) and its nx drop-in (§3.3) re-expressed on the Ray engine
must return networkx-correct values on arbitrary small graphs."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest

import graphscope_ray.session as gs
from graphscope_ray import nx_compat as gnx
from tests.oracles import oracle_hits, oracle_pagerank


@pytest.fixture(scope="module")
def karate_like():
    G = nx.gnm_random_graph(30, 90, seed=7)
    G.remove_nodes_from(list(nx.isolates(G)))
    return G


@pytest.fixture(scope="module")
def sess():
    s = gs.session(num_partitions=2)
    yield s
    s.close()


@pytest.fixture(scope="module")
def g(sess, karate_like):
    edf = pd.DataFrame(karate_like.edges(), columns=["u", "v"])
    vdf = pd.DataFrame({"id": list(karate_like.nodes())})
    return (sess.g(directed=False)
            .add_vertices(vdf, vid_field="id")
            .add_edges(edf, src_field="u", dst_field="v"))


def test_session_pagerank_matches_networkx(g, karate_like):
    got = gs.pagerank_nx(g, alpha=0.85, max_iter=100, tol=1e-10).to_dict()
    want = oracle_pagerank(list(karate_like.edges()),
                           list(karate_like.nodes()), directed=False,
                           tol=1e-10)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, k


def test_session_wcc_and_context_shapes(g, karate_like):
    ctx = gs.wcc(g)
    df = ctx.to_dataframe()
    assert list(df.columns) == ["vid", "component"]
    comp = ctx.to_dict()
    want = {frozenset(c) for c in nx.connected_components(karate_like)}
    groups = {}
    for v, c in comp.items():
        groups.setdefault(c, set()).add(v)
    assert {frozenset(s) for s in groups.values()} == want
    # to_numpy selector forms
    ids = ctx.to_numpy("v.id")
    assert sorted(ids) == sorted(karate_like.nodes())


def test_session_sssp_bfs(g, karate_like):
    src = min(karate_like.nodes())
    got = gs.bfs(g, src=src).to_dict()
    want = nx.single_source_shortest_path_length(karate_like, src)
    got = {k: int(v) for k, v in got.items() if np.isfinite(v)}
    assert got == want


def test_session_sssp_delta_stepping(g, karate_like):
    src = min(karate_like.nodes())
    got = gs.sssp_delta_stepping(g, src=src).to_dict()
    want = nx.single_source_shortest_path_length(karate_like, src)
    got = {k: v for k, v in got.items() if np.isfinite(v)}
    assert {k: int(v) for k, v in got.items()} == want


def test_session_triangles_clustering(g, karate_like):
    tri = gs.triangles(g).to_dict()
    want = nx.triangles(karate_like)
    assert {k: int(v) for k, v in tri.items()} == want
    cl = gs.clustering(g).to_dict("clustering")
    wcl = nx.clustering(karate_like)
    for k, v in wcl.items():
        assert abs(cl.get(k, 0.0) - v) < 1e-9, k


def test_session_string_nodes_relabel(sess):
    """Non-int node ids round-trip through the hash relabel + join."""
    edges = pd.DataFrame({"s": ["a", "b", "c", "a"],
                          "t": ["b", "c", "d", "c"]})
    g = sess.g(directed=False).add_edges(edges, src_field="s",
                                         dst_field="t")
    got = gs.pagerank_nx(g, tol=1e-10).to_dict()
    want = oracle_pagerank([("a", "b"), ("b", "c"), ("c", "d"),
                            ("a", "c")], ["a", "b", "c", "d"],
                           directed=False, tol=1e-10)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, k


def test_session_directed_pagerank(sess):
    edges = pd.DataFrame({"src": [1, 2, 3, 4, 1], "dst": [2, 3, 1, 1, 3]})
    verts = pd.DataFrame({"id": [1, 2, 3, 4, 5]})
    g = (sess.g(directed=True)
         .add_vertices(verts, vid_field="id")
         .add_edges(edges))
    got = gs.pagerank_nx(g, tol=1e-10).to_dict()
    want = oracle_pagerank([(1, 2), (2, 3), (3, 1), (4, 1), (1, 3)],
                           [1, 2, 3, 4, 5], directed=True, tol=1e-10)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, k


def test_nx_compat_builtins(karate_like):
    G = gnx.Graph()
    G.add_edges_from(karate_like.edges())
    assert G.number_of_nodes() == karate_like.number_of_nodes()
    assert G.number_of_edges() == karate_like.number_of_edges()

    pr = gnx.builtin.pagerank(G, tol=1e-10)
    want = oracle_pagerank(list(karate_like.edges()),
                           list(karate_like.nodes()), directed=False,
                           tol=1e-10)
    for k in want:
        assert abs(pr[k] - want[k]) < 1e-6

    comps = {frozenset(c) for c in gnx.connected_components(G)}
    assert comps == {frozenset(c)
                     for c in nx.connected_components(karate_like)}

    assert gnx.triangles(G) == nx.triangles(karate_like)

    dc = gnx.degree_centrality(G)
    for k, v in nx.degree_centrality(karate_like).items():
        assert abs(dc[k] - v) < 1e-12

    src = min(karate_like.nodes())
    assert (gnx.single_source_shortest_path_length(G, src)
            == nx.single_source_shortest_path_length(karate_like, src))

    kc = gnx.k_core(G, k=3)
    assert kc == set(nx.k_core(karate_like, 3).nodes())

    assert gnx.core_number(G) == nx.core_number(karate_like)


def test_nx_compat_weighted_digraph():
    G = gnx.DiGraph()
    G.add_edge(1, 2, weight=2.0)
    G.add_edges_from([(2, 3, 1.0), (1, 3, 5.0), (3, 4, 0.5)])
    got = gnx.single_source_dijkstra_path_length(G, 1)
    H = nx.DiGraph()
    H.add_weighted_edges_from([(1, 2, 2.0), (2, 3, 1.0), (1, 3, 5.0),
                               (3, 4, 0.5)])
    assert got == nx.single_source_dijkstra_path_length(H, 1)


def test_nx_compat_mutation_invalidates_cache():
    G = gnx.Graph([(1, 2), (2, 3)])
    before = gnx.wcc(G)
    assert len({before[1], before[2], before[3]}) == 1
    G.add_edge(4, 5)
    after = gnx.wcc(G)
    assert after[4] == after[5] != after[1]


def test_session_ppr_mass_and_seed_bias(g, karate_like):
    src = min(karate_like.nodes())
    d = gs.personalized_pagerank(g, seeds=[src], tol=1e-10).to_dict()
    assert abs(sum(d.values()) - 1.0) < 1e-9
    assert d[src] == max(d.values())


def test_session_structure_metrics(g, karate_like):
    r = gs.degree_assortativity_coefficient(g)
    assert abs(r - nx.degree_assortativity_coefficient(karate_like)) < 1e-9
    adc = gs.average_degree_connectivity(g).to_dataframe()
    want = nx.average_degree_connectivity(karate_like)
    got = dict(zip(adc["k"].astype(int), adc["avg_nbr_degree"]))
    assert got.keys() == want.keys()
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, k


def test_session_path_apis(sess, karate_like):
    G = max(nx.connected_components(karate_like), key=len)
    H = karate_like.subgraph(G)
    edf = pd.DataFrame(H.edges(), columns=["u", "v"])
    g = sess.g(directed=False).add_edges(edf, src_field="u",
                                         dst_field="v")
    got = gs.average_shortest_path_length(g)
    assert abs(got - nx.average_shortest_path_length(H)) < 1e-9
    p = nx.shortest_path(H, min(H.nodes()), max(H.nodes()))
    assert gs.is_simple_path(g, p) is True
    assert gs.is_simple_path(g, p + [p[0]]) is False


def test_session_attribute_assortativity(sess):
    edges = pd.DataFrame({"s": [1, 2, 3, 4, 1], "t": [2, 3, 4, 1, 3]})
    verts = pd.DataFrame({"id": [1, 2, 3, 4],
                          "color": ["r", "r", "b", "b"]})
    g = (sess.g(directed=False)
         .add_vertices(verts, vid_field="id")
         .add_edges(edges, src_field="s", dst_field="t"))
    got = gs.attribute_assortativity_coefficient(g, "color")
    H = nx.Graph([(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)])
    nx.set_node_attributes(
        H, {1: "r", 2: "r", 3: "b", 4: "b"}, "color")
    want = nx.attribute_assortativity_coefficient(H, "color")
    assert abs(got - want) < 1e-9


def test_nx_compat_structure_metrics(karate_like):
    G = gnx.Graph()
    G.add_edges_from(karate_like.edges())
    r = gnx.degree_assortativity_coefficient(G)
    assert abs(r - nx.degree_assortativity_coefficient(karate_like)) < 1e-9
    got = gnx.average_degree_connectivity(G)
    for k, v in nx.average_degree_connectivity(karate_like).items():
        assert abs(got[k] - v) < 1e-9, k


def test_nx_compat_builtin_parity_batch(karate_like):
    """The remaining reference nx/algorithms/builtin.py wrappers:
    structure scalars, boundaries, paths, BFS trees, APSP,
    betweenness — all vs networkx."""
    G = gnx.Graph()
    G.add_edges_from(karate_like.edges())
    H = karate_like

    assert abs(gnx.transitivity(G) - nx.transitivity(H)) < 1e-12
    assert abs(gnx.average_clustering(G)
               - nx.average_clustering(H)) < 1e-12

    nbunch = sorted(H.nodes())[:8]
    assert gnx.node_boundary(G, nbunch) == nx.node_boundary(H, nbunch)
    want_eb = {tuple(sorted(e)) for e in nx.edge_boundary(H, nbunch)}
    assert {tuple(sorted(e))
            for e in gnx.edge_boundary(G, nbunch)} == want_eb

    s = min(H.nodes())
    comp = nx.node_connected_component(H, s)
    t = max(comp)
    assert gnx.has_path(G, s, t) is True
    p = gnx.shortest_path(G, s, t)
    assert len(p) - 1 == nx.shortest_path_length(H, s, t)
    assert all(H.has_edge(a, b) for a, b in zip(p, p[1:]))

    pred = gnx.bfs_predecessors(G, s)
    dist = nx.single_source_shortest_path_length(H, s)
    assert set(pred) == set(dist) - {s}
    for v, pr in pred.items():
        assert H.has_edge(pr, v) and dist[pr] == dist[v] - 1
    tree = gnx.bfs_tree(G, s)
    assert tree.number_of_edges() == len(pred)
    assert gnx.bfs_edges(G, s) == sorted((p, c) for c, p in pred.items())
    succ = gnx.bfs_successors(G, s)
    assert sorted(c for cs in succ.values() for c in cs) == sorted(pred)

    apsp = gnx.all_pairs_shortest_path_length(G)
    want = dict(nx.all_pairs_shortest_path_length(H))
    assert {k: dict(v) for k, v in want.items()} == apsp

    paths = gnx.all_simple_paths(G, s, t, cutoff=3)
    assert paths == sorted(nx.all_simple_paths(H, s, t, cutoff=3))

    bc = gnx.betweenness_centrality(G)
    for k, v in nx.betweenness_centrality(H).items():
        assert abs(bc[k] - v) < 1e-9, k


def test_nx_compat_in_out_degree():
    D = nx.gnp_random_graph(20, 0.2, seed=6, directed=True)
    G = gnx.DiGraph()
    G.add_nodes_from(D.nodes())
    G.add_edges_from(D.edges())
    for k, v in nx.in_degree_centrality(D).items():
        assert abs(gnx.in_degree_centrality(G)[k] - v) < 1e-12, k
    for k, v in nx.out_degree_centrality(D).items():
        assert abs(gnx.out_degree_centrality(G)[k] - v) < 1e-12, k


def test_nx_compat_closeness_harmonic(karate_like):
    G = gnx.Graph()
    G.add_edges_from(karate_like.edges())
    cl = gnx.closeness_centrality(G)
    for k, v in nx.closeness_centrality(karate_like).items():
        assert abs(cl[k] - v) < 1e-12, k
    hm = gnx.harmonic_centrality(G)
    for k, v in nx.harmonic_centrality(karate_like).items():
        assert abs(hm[k] - v) < 1e-12, k


def test_nx_compat_digraph_components():
    D = nx.gnp_random_graph(25, 0.12, seed=4, directed=True)
    G = gnx.DiGraph()
    G.add_nodes_from(D.nodes())
    G.add_edges_from(D.edges())
    weak = {frozenset(c) for c in gnx.weakly_connected_components(G)}
    assert weak == {frozenset(c)
                    for c in nx.weakly_connected_components(D)}
    strong = {frozenset(c) for c in gnx.strongly_connected_components(G)}
    assert strong == {frozenset(c)
                      for c in nx.strongly_connected_components(D)}


def test_nx_compat_flash_family(karate_like):
    """articlerank / MIS / diameter via the nx-compat surface."""
    G = gnx.Graph()
    G.add_edges_from(karate_like.edges())
    ar = gnx.articlerank(G, max_iters=5)
    assert set(ar) == set(karate_like.nodes())
    assert all(v >= 0.15 - 1e-9 for v in ar.values())
    mis = gnx.maximal_independent_set(G)
    for u, w in karate_like.edges():
        assert not (u in mis and w in mis)
    H = karate_like.subgraph(
        max(nx.connected_components(karate_like), key=len))
    G2 = gnx.Graph()
    G2.add_edges_from(H.edges())
    assert 1 <= gnx.diameter_approximation(G2, k=6) <= nx.diameter(H)


def test_nx_compat_minimum_spanning_edges(karate_like):
    """Kruskal MSF via the nx-compat surface: same total weight and
    edge count as networkx on a weighted copy (string node labels
    exercise the relabel map)."""
    G = gnx.Graph()
    H = nx.Graph()
    rng = np.random.default_rng(13)
    for u, w in karate_like.edges():
        wt = float(rng.integers(1, 10))
        G.add_edge(f"n{u}", f"n{w}", weight=wt)
        H.add_edge(f"n{u}", f"n{w}", weight=wt)
    got = gnx.minimum_spanning_edges(G)
    want = list(nx.minimum_spanning_edges(H, algorithm="kruskal", data=True))
    assert len(got) == len(want)
    assert sum(w for _, _, w in got) == pytest.approx(
        sum(d["weight"] for _, _, d in want))
    nodes = set(H.nodes())
    for u, w, _ in got:
        assert u in nodes and w in nodes


def test_nx_compat_hits_eigen_katz(karate_like):
    G = gnx.Graph()
    G.add_edges_from(karate_like.edges())
    h, a = gnx.hits(G, tol=1e-12)
    bidi = list(karate_like.edges()) + [(v, u) for u, v
                                        in karate_like.edges()]
    wh, wa = oracle_hits(bidi, list(karate_like.nodes()), tol=1e-12)
    for k in wh:
        assert abs(h[k] - wh[k]) < 1e-6
        assert abs(a[k] - wa[k]) < 1e-6
    ec = gnx.eigenvector_centrality(G, max_iter=200, tol=1e-10)
    wec = nx.eigenvector_centrality(karate_like, max_iter=500, tol=1e-10)
    for k in wec:
        assert abs(ec[k] - wec[k]) < 1e-4
    kz = gnx.katz_centrality(G, alpha=0.05, tol=1e-10)
    wkz = nx.katz_centrality(karate_like, alpha=0.05, tol=1e-10)
    for k in wkz:
        assert abs(kz[k] - wkz[k]) < 1e-5


def test_nx_compat_assortativity_with_attrs():
    H = nx.gnm_random_graph(24, 60, seed=12)
    colors = {v: ("r" if v % 3 == 0 else "b") for v in H}
    sizes = {v: float(v % 7) for v in H}
    nx.set_node_attributes(H, colors, "color")
    nx.set_node_attributes(H, sizes, "size")
    G = gnx.Graph()
    G.add_edges_from(H.edges())
    G.set_node_attributes(colors, "color")
    G.set_node_attributes(sizes, "size")
    got = gnx.attribute_assortativity_coefficient(G, "color")
    want = nx.attribute_assortativity_coefficient(H, "color")
    assert abs(got - want) < 1e-9
    gotn = gnx.numeric_assortativity_coefficient(G, "size")
    wantn = nx.numeric_assortativity_coefficient(H, "size")
    assert abs(gotn - wantn) < 1e-9


class TestInteractive:
    """sess.interactive(graph) — the reference InteractiveQuery bridge
    from the analytical Graph to the Cypher/Gremlin frontends."""

    def test_execute_read_and_write(self, ray_session):
        import graphscope_ray.session as gss
        verts = pd.DataFrame({"vid": [1, 2, 3], "size": [5, 6, 7]})
        edges = pd.DataFrame({"src": [1, 2], "dst": [2, 3]})
        with gss.session(num_partitions=2) as sess:
            g = (sess.g(directed=True)
                 .add_vertices(verts).add_edges(edges))
            iq = sess.interactive(g)
            out = (iq.execute("MATCH (a:V)-[:E]->(b:V) "
                              "RETURN a AS a, b AS b")
                   .to_pandas().sort_values("a").reset_index(drop=True))
            assert list(map(tuple, out.to_numpy())) == [(1, 2), (2, 3)]
            s = iq.execute("MATCH (a:V) WHERE a = 3 DETACH DELETE a")
            assert s.nodes_deleted[0] == 1
            left = iq.execute("MATCH (a:V) RETURN a AS a").to_pandas()
            assert set(left["a"]) == {1, 2}

    def test_traversal_source(self, ray_session):
        import graphscope_ray.session as gss
        verts = pd.DataFrame({"vid": [1, 2, 3], "size": [5, 6, 7]})
        edges = pd.DataFrame({"src": [1, 2], "dst": [2, 3]})
        with gss.session(num_partitions=2) as sess:
            g = (sess.g(directed=True)
                 .add_vertices(verts).add_edges(edges))
            tr = sess.interactive(g).traversal()
            n = tr.V("V").out("E").count().toDataset().to_pandas()
            assert int(n.iloc[0, 0]) == 2

    def test_string_oid_refused(self, ray_session):
        import graphscope_ray.session as gss
        edges = pd.DataFrame({"src": ["a", "b"], "dst": ["b", "c"]})
        with gss.session(num_partitions=2) as sess:
            g = sess.g(directed=True).add_edges(edges)
            with pytest.raises(ValueError, match="integer"):
                sess.interactive(g)
