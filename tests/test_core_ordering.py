"""Onion-layer + degeneracy ordering vs pure-python FLASH replicas
(apps/flash/core/onion-layer-ordering.h, degeneracy-ordering.h)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.pipelines.algorithms import (
    degeneracy_ordering,
    onion_layers,
)
from graphscope_ray.sources.generator import MICRO_EDGES, MICRO_VERTICES
from graphscope_ray.state.graph import build_graph

from .oracles import oracle_degeneracy_ordering, oracle_onion_layers


def _rand(seed, n=40, m=120):
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


CASES = [("micro", MICRO_EDGES, MICRO_VERTICES),
         ("rand31", *_rand(31)),
         ("rand47", *_rand(47, n=25, m=150))]


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("name,edges,verts", CASES, ids=[c[0] for c in CASES])
def test_onion_layers(P, name, edges, verts):
    g = _build(edges, verts, P)
    df = onion_layers(g).to_pandas()
    got = {r.vid: (r.core, r.layer) for r in df.itertuples()}
    want = oracle_onion_layers(edges, verts)
    assert got == want
    assert all(layer >= 0 for _, layer in got.values())


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("name,edges,verts", CASES, ids=[c[0] for c in CASES])
def test_degeneracy_ordering(P, name, edges, verts):
    g = _build(edges, verts, P)
    df = degeneracy_ordering(g).to_pandas()
    got = dict(zip(df["vid"], df["rank"]))
    want = oracle_degeneracy_ordering(edges, verts)
    assert got == want
    assert all(r >= 0 for r in got.values())
