"""Tarjan–Vishkin biconnectivity vs networkx: the per-edge BCC
partition (nx.biconnected_component_edges) and articulation points
(nx.articulation_points), across trees, cycles, cliques, barbells and
random multi-component graphs at P=1/3."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.pipelines.algorithms import (
    articulation_points,
    biconnected_components,
)
from graphscope_ray.sources.generator import MICRO_EDGES, MICRO_VERTICES
from graphscope_ray.state.graph import build_graph


def _rand(seed, n=30, m=55):
    rng = np.random.default_rng(seed)
    pairs = {(min(a, b), max(a, b))
             for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
             if a != b}
    return sorted(pairs), list(range(n))


def _build(edges, vertices, P):
    et = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                   "dst": pa.array([e[1] for e in edges], pa.int64())})
    verts = ray.data.from_items([{"vid": int(v)} for v in vertices])
    return build_graph(ray.data.from_arrow(et), num_partitions=P,
                       directed=False, extra_vertices=verts)


CASES = [
    ("micro", MICRO_EDGES, MICRO_VERTICES),
    ("tree", [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5)], list(range(6))),
    ("cycle", [(i, (i + 1) % 9) for i in range(9)], list(range(9))),
    ("clique", [(i, j) for i in range(5) for j in range(i + 1, 5)],
     list(range(5))),
    ("barbell", [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)],
     list(range(6))),
    ("rand83", *_rand(83)),
    ("rand97", *_rand(97, n=40, m=50)),   # sparse: many cut vertices
    ("rand101", *_rand(101, n=25, m=90)),  # dense: few
]


def _edge_partition(pairs_with_label):
    comp = {}
    for u, v, lab in pairs_with_label:
        comp.setdefault(lab, set()).add((min(u, v), max(u, v)))
    return {frozenset(s) for s in comp.values()}


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("name,edges,verts", CASES, ids=[c[0] for c in CASES])
def test_biconnected_components(P, name, edges, verts):
    g = nx.Graph()
    g.add_nodes_from(verts)
    g.add_edges_from(edges)
    want = {frozenset((min(u, v), max(u, v)) for u, v in comp)
            for comp in nx.biconnected_component_edges(g)}
    gr = _build(edges, verts, P)
    df = biconnected_components(gr).to_pandas()
    rows = (list(zip(df["u"], df["v"], df["bcc"]))
            if len(df) else [])
    got = _edge_partition(rows)
    assert got == want
    # every distinct edge labeled exactly once
    assert len(rows) == g.number_of_edges()


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("name,edges,verts", CASES, ids=[c[0] for c in CASES])
def test_articulation_points(P, name, edges, verts):
    g = nx.Graph()
    g.add_nodes_from(verts)
    g.add_edges_from(edges)
    want = set(nx.articulation_points(g))
    gr = _build(edges, verts, P)
    df = articulation_points(gr).to_pandas()
    got = set(df["vid"]) if len(df) else set()
    assert got == want
