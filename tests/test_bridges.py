"""Bridges vs networkx.bridges (exact edge sets) over assorted graphs:
trees (all edges bridges), cycles (none), random sparse graphs with
multiple components, and the micro fixture."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.pipelines.algorithms import bridges
from graphscope_ray.sources.generator import MICRO_EDGES, MICRO_VERTICES
from graphscope_ray.state.graph import build_graph


def _rand(seed, n=40, m=60):
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
    # sparse random: low m/n ratio → many bridges, several components
    ("rand61", *_rand(61, n=50, m=45)),
    ("rand71", *_rand(71, n=40, m=80)),
    # two blocks joined by a single bridge edge
    ("barbell", [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)],
     list(range(6))),
]


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("name,edges,verts", CASES, ids=[c[0] for c in CASES])
def test_bridges_exact(P, name, edges, verts):
    g = nx.Graph()
    g.add_nodes_from(verts)
    g.add_edges_from(edges)
    want = {(min(a, b), max(a, b)) for a, b in nx.bridges(g)}
    gr = _build(edges, verts, P)
    df = bridges(gr).to_pandas()
    got = set(zip(df["u"], df["v"])) if len(df) else set()
    assert got == want
