"""Motif-counting tests vs independent structural enumeration
(itertools / networkx), not the counting formulas themselves — the
pipelines replicate FLASH subgraph-family semantics
(apps/flash/subgraph/*.h), the oracles enumerate subgraphs directly."""

import random
from itertools import combinations

import networkx as nx
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.pipelines.motifs import (
    diamond_count,
    edge_codegree,
    k_clique_count,
    rectangle_count,
    tailed_triangle_count,
    three_path_count,
)
from graphscope_ray.sources.generator import MICRO_EDGES


def _rand_edges(seed, n=30, m=120):
    rng = np.random.default_rng(seed)
    pairs = {(min(a, b), max(a, b))
             for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
             if a != b}
    return sorted(pairs)


def _ds(edges):
    return ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())}))


def _nx(edges):
    g = nx.Graph()
    g.add_edges_from(edges)
    return g


def oracle_rectangles(g):
    """Count distinct 4-cycles: for each 4-subset, each of the 3
    diagonal pairings that closes a cycle is one rectangle."""
    cnt = 0
    for quad in combinations(sorted(g.nodes), 4):
        a, b, c, d = quad
        for cyc in ((a, b, c, d), (a, b, d, c), (a, c, b, d)):
            if all(g.has_edge(cyc[i], cyc[(i + 1) % 4]) for i in range(4)):
                cnt += 1
    return cnt


def oracle_diamonds(g):
    """Pairs of distinct common neighbors per edge (the reference's
    diamond convention — K4s contribute per chord pair)."""
    cnt = 0
    for u, v in g.edges:
        w = len(set(g[u]) & set(g[v]))
        cnt += w * (w - 1) // 2
    return cnt


def oracle_tailed(g):
    """(triangle, pendant edge) pairs: for each triangle, each corner
    contributes deg−2 tails."""
    cnt = 0
    for tri in (c for c in nx.enumerate_all_cliques(g) if len(c) == 3):
        cnt += sum(g.degree(x) - 2 for x in tri)
    return cnt


def oracle_three_paths(g):
    """Simple paths on 4 distinct vertices, undirected (each counted
    once)."""
    cnt = 0
    for w in g.nodes:
        for x in g[w]:
            for y in g[x]:
                if y in (w, x):
                    continue
                for z in g[y]:
                    if z not in (w, x, y):
                        cnt += 1
    return cnt // 2


@pytest.mark.parametrize("edges", [MICRO_EDGES, _rand_edges(3),
                                   _rand_edges(11, n=25, m=160)],
                         ids=["micro", "rand3", "rand11"])
def test_codegree_family(edges):
    g = _nx(edges)
    ds = _ds(edges)
    codeg = edge_codegree(ds).materialize()
    df = codeg.to_pandas()
    # per-edge codegree exact vs set intersection
    want = {(min(u, v), max(u, v)): len(set(g[u]) & set(g[v]))
            for u, v in g.edges}
    got = {(r.u, r.v): r.codeg for r in df.itertuples()}
    assert got == want
    # degree columns exact
    for r in df.itertuples():
        assert r.du == g.degree(r.u) and r.dv == g.degree(r.v)
    assert diamond_count(None, codeg_ds=codeg) == oracle_diamonds(g)
    assert tailed_triangle_count(None, codeg_ds=codeg) == oracle_tailed(g)
    assert three_path_count(None, codeg_ds=codeg) == oracle_three_paths(g)


@pytest.mark.parametrize("edges", [MICRO_EDGES, _rand_edges(3),
                                   _rand_edges(19, n=20, m=100)],
                         ids=["micro", "rand3", "rand19"])
def test_rectangles(edges):
    g = _nx(edges)
    assert rectangle_count(_ds(edges)) == oracle_rectangles(g)


def test_rectangles_shuffle_path_matches_broadcast():
    edges = _rand_edges(5, n=24, m=110)
    a = rectangle_count(_ds(edges), broadcast_degrees=True)
    b = rectangle_count(_ds(edges), broadcast_degrees=False, num_buckets=7)
    assert a == b


@pytest.mark.parametrize("k", [2, 3, 4, 5])
def test_k_clique(k):
    edges = _rand_edges(23, n=18, m=90)
    g = _nx(edges)
    want = sum(1 for c in nx.enumerate_all_cliques(g) if len(c) == k)
    assert k_clique_count(_ds(edges), k) == want


def test_k_clique_triangle_consistency():
    edges = MICRO_EDGES
    g = _nx(edges)
    tri = sum(nx.triangles(g).values()) // 3
    assert k_clique_count(_ds(edges), 3) == tri


def test_motifs_triangle_free():
    # even cycle: rectangles exist, no triangles/diamonds/tails
    edges = [(i, (i + 1) % 8) for i in range(8)]
    ds = _ds(edges)
    codeg = edge_codegree(ds).materialize()
    assert diamond_count(None, codeg_ds=codeg) == 0
    assert tailed_triangle_count(None, codeg_ds=codeg) == 0
    assert rectangle_count(_ds(edges)) == 0  # C8 has no C4
    assert three_path_count(None, codeg_ds=codeg) == 8
    assert k_clique_count(ds, 3) == 0


def oracle_triangle_plus(arcs):
    """Brute force over distinct arcs."""
    arcs = {(a, b) for a, b in arcs if a != b}
    out = {}
    inn = {}
    for a, b in arcs:
        out.setdefault(a, set()).add(b)
        inn.setdefault(b, set()).add(a)
    mutual = {(a, b) for a, b in arcs if (b, a) in arcs}
    inp = outp = cycp = 0
    for a, b in mutual:
        cycp += len(inn.get(a, set()) & out.get(b, set()))
        if a < b:
            inp += len(out.get(a, set()) & out.get(b, set()))
            outp += len(inn.get(a, set()) & inn.get(b, set()))
    return {"in_plus": inp, "out_plus": outp, "cycle_plus": cycp}


@pytest.mark.parametrize("seed", [2, 29, 41])
def test_directed_triangle_plus(seed):
    from graphscope_ray.pipelines.motifs import directed_triangle_plus_census

    rng = np.random.default_rng(seed)
    n, m = 25, 220
    arcs = sorted({(int(a), int(b)) for a, b in
                   zip(rng.integers(0, n, m), rng.integers(0, n, m))
                   if a != b})
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in arcs], pa.int64()),
        "dst": pa.array([b for _, b in arcs], pa.int64())}))
    assert directed_triangle_plus_census(ds) == oracle_triangle_plus(arcs)


def test_directed_triangle_plus_no_mutual():
    from graphscope_ray.pipelines.motifs import directed_triangle_plus_census

    # a DAG has no mutual edges -> all zero
    arcs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in arcs], pa.int64()),
        "dst": pa.array([b for _, b in arcs], pa.int64())}))
    assert directed_triangle_plus_census(ds) == \
        {"in_plus": 0, "out_plus": 0, "cycle_plus": 0}


class TestDirectedClustering:
    """lcc_directed (grape::LCCDirected; networkx DiGraph clustering)."""

    CASES = [
        [(0, 1), (1, 2), (2, 0)],                       # 3-cycle
        [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2)],  # bidir K3
        [(0, 1), (1, 2), (0, 2), (2, 3)],               # transitive+tail
    ]

    @pytest.mark.parametrize("nparts", [1, 3])
    def test_networkx_exact(self, nparts):
        import networkx as nx

        from graphscope_ray.pipelines.motifs import directed_clustering
        rng = random.Random(7)
        cases = self.CASES + [
            [(rng.randrange(14), rng.randrange(14)) for _ in range(60)]]
        for pairs in cases:
            pairs = [(u, v) for u, v in pairs if u != v]
            G = nx.DiGraph(pairs)
            want = nx.clustering(G)
            ds = ray.data.from_pandas(
                pd.DataFrame(pairs, columns=["src", "dst"])
                .astype(np.int64))
            if nparts > 1:
                ds = ds.repartition(nparts)
            got = {int(r["vid"]): r["clustering"]
                   for r in directed_clustering(ds).take_all()}
            assert set(got) == set(want)
            for k in want:
                assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])

    def test_session_digraph_dispatch(self):
        import networkx as nx

        from graphscope_ray import nx_compat as gnx
        pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 2)]
        G = gnx.DiGraph(pairs)
        got = gnx.clustering(G)
        want = nx.clustering(nx.DiGraph(pairs))
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-12
