"""Randomized differential parity sweep: many random graph shapes vs
networkx for the kernels whose acceptance rules are subtle (the
scc-class of bugs — a single lucky seed can mask a message-combine
fault, as the round-4 scc backward-sweep collision proved). Small
graphs, several seeds and densities, P=2 so multi-shard message paths
are always exercised. Undirected builds pass ``dedup_arcs=True``:
the random generator emits both orientations of some pairs, which
networkx collapses to one edge while the engine's default contract is
a multigraph."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.pipelines import algorithms
from graphscope_ray.state.graph import build_graph

SEEDS = [3, 17, 29, 41, 53]


def _rand_edges(seed, n, m):
    rng = np.random.default_rng(seed)
    edges = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, n, (m, 2)) if a != b})
    return edges


def _ds(edges):
    return ray.data.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}))


def _vds(n):
    return ray.data.from_items([{"vid": int(v)} for v in range(n)])


@pytest.mark.parametrize("seed", SEEDS)
def test_scc_random(seed):
    n, m = 24, 40        # sparse → many small SCCs + collisions
    edges = _rand_edges(seed, n, m)
    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    G.add_edges_from(edges)
    sg = build_graph(_ds(edges), num_partitions=2, directed=True,
                     with_reverse=True, extra_vertices=_vds(n))
    got = algorithms.scc(sg).to_pandas()
    want = {v: max(c) for c in nx.strongly_connected_components(G)
            for v in c}
    assert dict(zip(got["vid"], got["scc"])) == want, seed


@pytest.mark.parametrize("seed", SEEDS)
def test_wcc_bfs_kcore_random(seed):
    n, m = 30, 45
    edges = _rand_edges(seed, n, m)
    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from(edges)
    sg = build_graph(_ds(edges), num_partitions=2, directed=False,
                     dedup_arcs=True, extra_vertices=_vds(n))
    got = algorithms.wcc(sg)[0].to_pandas()
    want = {v: min(c) for c in nx.connected_components(G) for v in c}
    assert dict(zip(got["vid"], got["component"])) == want, seed

    src = min(G.nodes)
    gb = algorithms.bfs(sg, source=src)[0].to_pandas()
    wb = nx.single_source_shortest_path_length(G, src)
    gm = {v: d for v, d in zip(gb["vid"], gb["depth"])
          if np.isfinite(d)}
    assert gm == wb, seed

    kc = algorithms.kcore_pool(sg, k=2).to_pandas()
    want_core = set(nx.k_core(G, 2).nodes)
    assert set(kc["vid"]) == want_core, seed


@pytest.mark.parametrize("seed", SEEDS)
def test_bridges_articulation_random(seed):
    n, m = 22, 30
    edges = _rand_edges(seed, n, m)
    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from(edges)
    sg = build_graph(_ds(edges), num_partitions=2, directed=False,
                     dedup_arcs=True, extra_vertices=_vds(n))
    gb = algorithms.bridges(sg).to_pandas()
    got = {(min(u, v), max(u, v)) for u, v in zip(gb["u"], gb["v"])}
    want = {(min(u, v), max(u, v)) for u, v in nx.bridges(G)}
    assert got == want, seed
    ga = algorithms.articulation_points(sg).to_pandas()
    assert set(ga["vid"]) == set(nx.articulation_points(G)), seed


@pytest.mark.parametrize("seed", SEEDS[:3])
def test_matching_mis_random(seed):
    n, m = 20, 32
    edges = _rand_edges(seed, n, m)
    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from(edges)
    sg = build_graph(_ds(edges), num_partitions=2, directed=False,
                     dedup_arcs=True, extra_vertices=_vds(n))
    mm = algorithms.maximal_matching(sg).to_pandas()
    matched = mm[mm["mate"] >= 0]
    pairs = {(min(a, b), max(a, b))
             for a, b in zip(matched["vid"], matched["mate"])}
    # validity: disjoint real edges, mutually consistent mates
    mates = dict(zip(mm["vid"], mm["mate"]))
    canon = {(min(x, y), max(x, y)) for x, y in edges}
    seen = set()
    for a, b in pairs:
        assert (a, b) in canon, (seed, a, b)
        assert mates[a] == b and mates[b] == a, (seed, a, b)
        assert a not in seen and b not in seen
        seen |= {a, b}
    # maximality: no edge with both endpoints unmatched
    for x, y in edges:
        assert x in seen or y in seen, (seed, x, y)

    mis = algorithms.maximal_independent_set(sg).to_pandas()
    s = set(mis["vid"])
    for x, y in edges:
        assert not (x in s and y in s), (seed, x, y)   # independent
    for v in range(n):
        assert v in s or any((x == v and y in s) or (y == v and x in s)
                             for x, y in edges), (seed, v)  # maximal


@pytest.mark.parametrize("seed", SEEDS[:3])
def test_pagerank_core_clustering_random(seed):
    n, m = 26, 50
    edges = _rand_edges(seed, n, m)
    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from(edges)
    sg = build_graph(_ds(edges), num_partitions=2, directed=False,
                     dedup_arcs=True, extra_vertices=_vds(n))
    from tests.oracles import oracle_pagerank
    pr = algorithms.pagerank(sg, tol=1e-12)[0].to_pandas()
    want = oracle_pagerank(edges, range(n), directed=False, tol=1e-12)
    gm = dict(zip(pr["vid"], pr["pagerank"]))
    for v, w in want.items():
        assert abs(gm[v] - w) < 1e-8, (seed, v)

    cores = algorithms.core_decomposition(sg).to_pandas()
    assert dict(zip(cores["vid"], cores["core"])) \
        == nx.core_number(G), seed

    from graphscope_ray.pipelines.structure import clustering_coefficient
    # engine input: canonicalize both orientations to one edge
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges})
    cds = ray.data.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in canon], "dst": [b for _, b in canon]}))
    cc = clustering_coefficient(cds).to_pandas()
    want_cc = nx.clustering(G)
    gm = {v: float(c) for v, c in zip(cc["vid"], cc["clustering"])}
    for v in gm:
        assert abs(gm[v] - want_cc[v]) < 5e-6, (seed, v)


@pytest.mark.parametrize("seed", SEEDS[:3])
def test_apsp_closeness_random(seed):
    n, m = 18, 30
    edges = _rand_edges(seed, n, m)
    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from(edges)
    sg = build_graph(_ds(edges), num_partitions=2, directed=False,
                     dedup_arcs=True, extra_vertices=_vds(n))
    ap = algorithms.all_pairs_shortest_path_length(sg).to_pandas()
    got = {(s, v): int(d) for s, v, d in zip(ap["src"], ap["dst"],
                                             ap["length"])}
    want = {(s, v): d for s in G
            for v, d in nx.single_source_shortest_path_length(G, s).items()}
    assert got == want, seed

    res = algorithms.closeness_centrality(sg)
    cl = res.to_pandas() if hasattr(res, "to_pandas") else res
    want_cl = nx.closeness_centrality(G)
    gm = dict(zip(cl["vid"], cl["closeness"]))
    for v, w in want_cl.items():
        assert abs(gm[v] - w) < 1e-9, (seed, v)


@pytest.mark.parametrize("seed", SEEDS[:3])
def test_directed_kernels_random(seed):
    from tests.oracles import (
        oracle_cdlp,
        oracle_hits,
        oracle_pagerank,
        oracle_sssp,
    )

    n, m = 20, 42
    edges = _rand_edges(seed, n, m)
    rng = np.random.default_rng(seed + 1)
    w = {e: float(rng.integers(1, 9)) for e in edges}
    wds = ray.data.from_pandas(pd.DataFrame({
        "src": [a for a, _ in edges], "dst": [b for _, b in edges],
        "weight": [w[e] for e in edges]}))
    sg = build_graph(wds, num_partitions=2, directed=True,
                     extra_vertices=_vds(n))
    pr = algorithms.pagerank(sg, tol=1e-12)[0].to_pandas()
    want = oracle_pagerank(edges, range(n), directed=True, tol=1e-12)
    gm = dict(zip(pr["vid"], pr["pagerank"]))
    for v, x in want.items():
        assert abs(gm[v] - x) < 1e-8, (seed, v)

    src = min(a for a, _ in edges)
    ss = algorithms.sssp(sg, source=src)[0].to_pandas()
    wel = [(a, b, w[(a, b)]) for a, b in edges]
    want_d = oracle_sssp(wel, range(n), src, directed=True)
    gm = {v: d for v, d in zip(ss["vid"], ss["distance"])
          if np.isfinite(d)}
    assert gm == pytest.approx(want_d), seed

    cd = algorithms.cdlp(sg, max_round=10)[0].to_pandas()
    want_c = oracle_cdlp(edges, range(n), directed=True, max_round=10)
    assert dict(zip(cd["vid"], cd["label"])) == want_c, seed

    grev = build_graph(
        wds.map_batches(lambda df: df.rename(
            columns={"src": "dst", "dst": "src"}),
            batch_format="pandas"),
        num_partitions=2, directed=True, extra_vertices=_vds(n))
    hub_ds, auth_ds, _ = algorithms.hits(sg, grev, max_iter=40,
                                         tol=0.0)
    hdf, adf = hub_ds.to_pandas(), auth_ds.to_pandas()
    wh, wa = oracle_hits(edges, range(n), max_iter=40, tol=0.0)
    gh = dict(zip(hdf["vid"], hdf["hub"]))
    ga = dict(zip(adf["vid"], adf["authority"]))
    for v in range(n):
        assert abs(gh[v] - wh[v]) < 1e-9, (seed, v)
        assert abs(ga[v] - wa[v]) < 1e-9, (seed, v)
