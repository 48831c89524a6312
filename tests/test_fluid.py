"""Fluid communities vs the BSP replica oracle (deterministic seeds)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.functions.hashing import splitmix64
from graphscope_ray.pipelines.algorithms import fluid_communities
from graphscope_ray.sources.generator import MICRO_EDGES, MICRO_VERTICES
from graphscope_ray.state.graph import build_graph

from .oracles import oracle_fluid_communities


def _rand(seed, n=40, m=110):
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


def _seeds(vertices, k):
    v = np.asarray(vertices, np.int64)
    h = splitmix64(v.astype(np.uint64))
    order = np.lexsort((v, h))[:k]
    return sorted(int(x) for x in v[order])


CASES = [("micro", MICRO_EDGES, MICRO_VERTICES, 3),
         ("rand5", *_rand(5), 4),
         ("rand17", *_rand(17, n=60, m=200), 6)]


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("name,edges,verts,k", CASES,
                         ids=[c[0] for c in CASES])
def test_fluid_communities(P, name, edges, verts, k):
    g = _build(edges, verts, P)
    df = fluid_communities(g, k=k).to_pandas()
    got = dict(zip(df["vid"], df["community"]))
    want = oracle_fluid_communities(edges, verts, _seeds(verts, k))
    assert got == want
    # every seeded community survives with >= 1 member
    assert set(c for c in got.values() if c >= 0) == set(range(k))
