"""FLASH matching-family tests: distributed BSP results vs phase-exact
pure-python replicas of apps/flash/matching/{mm,min-cover-greedy,
min-dominating-set,min-edge-cover}.h, plus combinatorial validity
(matching maximality, cover/dominating feasibility) and partition
invariance."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.pipelines.algorithms import (
    maximal_matching,
    min_dominating_set,
    min_edge_cover,
    min_vertex_cover,
)
from graphscope_ray.sources.generator import (
    MICRO_EDGES,
    MICRO_VERTICES,
    micro_edge_table,
)
from graphscope_ray.state.graph import build_graph

from .oracles import (
    oracle_maximal_matching,
    oracle_min_dominating_set,
    oracle_min_edge_cover,
    oracle_min_vertex_cover,
)


def _random_graph(seed, n=40, m=90):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst  # simple graph: no self loops
    pairs = {(min(a, b), max(a, b)) for a, b in zip(src[keep], dst[keep])}
    edges = sorted(pairs)
    return edges, list(range(n))


def _build(edges, vertices, P):
    et = pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
    })
    verts = ray.data.from_items([{"vid": int(v)} for v in vertices])
    return build_graph(ray.data.from_arrow(et), num_partitions=P,
                       directed=False, extra_vertices=verts)


def _micro(P):
    edges = ray.data.from_arrow(micro_edge_table())
    verts = ray.data.from_items([{"vid": v} for v in MICRO_VERTICES])
    return build_graph(edges, num_partitions=P, directed=False,
                       extra_vertices=verts)


def _col_map(ds, col):
    df = ds.to_pandas()
    return dict(zip(df["vid"], df[col]))


GRAPHS = [
    ("micro", MICRO_EDGES, MICRO_VERTICES),
    ("rand7", *_random_graph(7)),
    ("rand13", *_random_graph(13, n=60, m=150)),
    ("path", [(0, 1), (1, 2), (2, 3), (3, 4)], [0, 1, 2, 3, 4]),
    ("star", [(0, i) for i in range(1, 7)], list(range(7))),
]


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("name,edges,verts", GRAPHS, ids=[g[0] for g in GRAPHS])
def test_maximal_matching_exact(P, name, edges, verts):
    g = _build(edges, verts, P) if name != "micro" else _micro(P)
    got = _col_map(maximal_matching(g), "mate")
    want = oracle_maximal_matching(edges, verts)
    assert got == want
    # validity: symmetric, over real edges, maximal
    eset = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    for v, u in got.items():
        if u >= 0:
            assert got[u] == v
            assert (min(u, v), max(u, v)) in eset
    for a, b in eset:
        assert got[a] >= 0 or got[b] >= 0, f"edge ({a},{b}) both unmatched"


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("name,edges,verts", GRAPHS, ids=[g[0] for g in GRAPHS])
def test_min_vertex_cover_exact(P, name, edges, verts):
    g = _build(edges, verts, P) if name != "micro" else _micro(P)
    got = _col_map(min_vertex_cover(g), "in_cover")
    want = oracle_min_vertex_cover(edges, verts)
    assert got == want
    for a, b in edges:
        if a != b:
            assert got[a] or got[b], f"edge ({a},{b}) uncovered"


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("name,edges,verts", GRAPHS, ids=[g[0] for g in GRAPHS])
def test_min_dominating_set_exact(P, name, edges, verts):
    g = _build(edges, verts, P) if name != "micro" else _micro(P)
    got = _col_map(min_dominating_set(g), "in_set")
    want = oracle_min_dominating_set(edges, verts)
    assert got == want
    adj = {v: set() for v in verts}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    for v in verts:
        assert got[v] or any(got[u] for u in adj[v]), f"{v} undominated"


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("name,edges,verts", GRAPHS, ids=[g[0] for g in GRAPHS])
def test_min_edge_cover_exact(P, name, edges, verts):
    g = _build(edges, verts, P) if name != "micro" else _micro(P)
    ds, size = min_edge_cover(g)
    got = _col_map(ds, "mate")
    want, want_size = oracle_min_edge_cover(edges, verts)
    assert got == want
    assert size == want_size
    # mates are real edges; every non-isolated vertex is covered
    # (matched, or counted toward an arbitrary incident edge)
    eset = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    for v, u in got.items():
        if u >= 0:
            assert (min(u, v), max(u, v)) in eset


def test_matching_empty_graph():
    g = _build([], [0, 1, 2], P=2)
    assert set(_col_map(maximal_matching(g), "mate").values()) == {-1}
    assert set(_col_map(min_vertex_cover(g), "in_cover").values()) == {False}
    # isolated vertices must each join the dominating set
    assert set(_col_map(min_dominating_set(g), "in_set").values()) == {True}
    _, size = min_edge_cover(g)
    assert size == 0


@pytest.mark.parametrize("P", [1, 2])
def test_matching_huge_and_negative_vids(P):
    """Hashed string-node vids are arbitrary signed 64-bit — the
    lexicographic two-column combine must stay exact above 2^53 and
    below zero (regression: packed int64 keys overflowed)."""
    base = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    big = np.int64(2**62)
    vmap = {0: -big + 7, 1: -3, 2: 5, 3: big - 11, 4: big - 2}
    edges = [(int(vmap[a]), int(vmap[b])) for a, b in base]
    verts = [int(vmap[v]) for v in range(5)]
    g = _build(edges, verts, P)
    assert _col_map(maximal_matching(g), "mate") == \
        oracle_maximal_matching(edges, verts)
    assert _col_map(min_vertex_cover(g), "in_cover") == \
        oracle_min_vertex_cover(edges, verts)
    assert _col_map(min_dominating_set(g), "in_set") == \
        oracle_min_dominating_set(edges, verts)
    ds, size = min_edge_cover(g)
    want, want_size = oracle_min_edge_cover(edges, verts)
    assert _col_map(ds, "mate") == want and size == want_size
