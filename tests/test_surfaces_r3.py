"""Session + nx-compat wrappers for the round-3 FLASH families
(matching, orderings, connectivity, motifs) vs networkx / replica
oracles — including string-node relabeling through the node map."""

import networkx as nx
import pytest

import graphscope_ray.nx_compat as gnx
import graphscope_ray.session as gs

from .oracles import (
    oracle_maximal_matching,
    oracle_min_dominating_set,
    oracle_min_vertex_cover,
)

EDGES = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5), (5, 6),
         (6, 7), (7, 8), (6, 8)]
NODES = list(range(9))


def _nx():
    g = nx.Graph()
    g.add_nodes_from(NODES)
    g.add_edges_from(EDGES)
    return g


def _G():
    G = gnx.Graph()
    G.add_nodes_from(NODES)
    G.add_edges_from(EDGES)
    return G


def test_nx_bridges_articulation_bcc():
    g = _nx()
    G = _G()
    assert gnx.bridges(G) == sorted(
        (min(a, b), max(a, b)) for a, b in nx.bridges(g))
    assert gnx.articulation_points(G) == set(nx.articulation_points(g))
    got = {frozenset(c) for c in gnx.biconnected_components(G)}
    want = {frozenset(c) for c in nx.biconnected_components(g)}
    assert got == want


def test_nx_matching_family():
    G = _G()
    mm = gnx.maximal_matching(G)
    want = oracle_maximal_matching(EDGES, NODES)
    assert {frozenset(p) for p in mm} == \
        {frozenset((v, u)) for v, u in want.items() if u >= 0}
    cover = gnx.min_vertex_cover(G)
    wc = oracle_min_vertex_cover(EDGES, NODES)
    assert cover == {v for v, c in wc.items() if c}
    dom = gnx.dominating_set(G)
    wd = oracle_min_dominating_set(EDGES, NODES)
    assert dom == {v for v, c in wd.items() if c}
    assert gnx.min_edge_cover_size(G) >= len(NODES) // 2


def test_nx_string_nodes_bridges():
    """Relabeled (string) nodes map back through the node table."""
    G = gnx.Graph()
    G.add_edges_from([("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    assert gnx.bridges(G) == [tuple(sorted(("c", "d")))]
    assert gnx.articulation_points(G) == {"c"}


def test_session_motifs_and_orderings():
    import pandas as pd

    sess = gs.session(num_partitions=2)
    g = sess.g(directed=False).add_edges(pd.DataFrame(
        EDGES, columns=["src", "dst"]))
    nxg = _nx()
    assert gs.k_clique_count(g, 3) == sum(
        1 for c in nx.enumerate_all_cliques(nxg) if len(c) == 3)
    assert gs.diamond_count(g) == 0
    assert gs.three_path_count(g) > 0
    ranks = gs.degeneracy_ordering(g).to_dict()
    assert set(ranks) == set(n for n in NODES)
    layers = gs.onion_layers(g).to_dataframe()
    assert set(layers.columns) >= {"core", "layer"}
    sess.close()


def test_nx_coloring_and_fluid():
    G = _G()
    colors = gnx.greedy_color(G)
    for a, b in EDGES:
        assert colors[a] != colors[b]
    comms = gnx.asyn_fluidc(G, 2)
    assert len(comms) == 2
    covered = set().union(*comms)
    assert covered <= set(NODES)
