"""random_multi_bfs (flash/traversal/random-multi-bfs.h) and
k_core_search (flash/core/k-core-search.h) vs networkx oracles."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.pipelines.algorithms import k_core_search, random_multi_bfs
from graphscope_ray.state.graph import build_graph


def _rand_graph(seed=7, n=40, m=120):
    rng = np.random.default_rng(seed)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (m, 2))
                    if a != b})
    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from(edges)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}))
    verts = ray.data.from_items([{"vid": v} for v in range(n)])
    return G, ds, verts


def _oracle_rmb(G, sources):
    res = {}
    dists = [nx.single_source_shortest_path_length(G, s) for s in sources]
    for v in G.nodes:
        hits = [d[v] for d in dists if v in d]
        res[v] = max(hits) if hits else -1
    return res


@pytest.mark.parametrize("P", [1, 4])
def test_random_multi_bfs_explicit_sources(P):
    G, ds, verts = _rand_graph()
    g = build_graph(ds, num_partitions=P, directed=False,
                    extra_vertices=verts)
    sources = [0, 7, 19]
    out = random_multi_bfs(g, sources=sources).to_pandas()
    got = dict(zip(out["vid"], out["res"]))
    assert got == _oracle_rmb(G, sources)


def test_random_multi_bfs_hash_pick_partition_invariant():
    _, ds, verts = _rand_graph(seed=9)
    a = build_graph(ds, num_partitions=2, directed=False,
                    extra_vertices=verts)
    b = build_graph(ds, num_partitions=5, directed=False,
                    extra_vertices=verts)
    ra = random_multi_bfs(a, k=5, seed=3).to_pandas().sort_values("vid")
    rb = random_multi_bfs(b, k=5, seed=3).to_pandas().sort_values("vid")
    assert list(ra["vid"]) == list(rb["vid"])
    assert list(ra["res"]) == list(rb["res"])


@pytest.mark.parametrize("k", [2, 3, 4])
def test_k_core_search_counts(k):
    G, ds, verts = _rand_graph(seed=11)
    g = build_graph(ds, num_partitions=3, directed=False,
                    extra_vertices=verts)
    assert k_core_search(g, k) == len(nx.k_core(G, k))
