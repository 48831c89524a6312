"""Golden tests on the F3 micro graph (p2p-31 analogue) vs oracles.

Mirrors the reference's exact-match golden strategy
(analytical_engine/test/app_tests.sh:115-126): allclose 1e-6 for
PageRank floats, exact for WCC/CDLP/triangle integers, sorted by id.
Runs at several partition counts to prove partition-invariance.
"""

import numpy as np
import pytest
import ray.data

from graphscope_ray.pipelines.algorithms import bfs, cdlp, pagerank, sssp, wcc
from graphscope_ray.sources.generator import MICRO_EDGES, MICRO_VERTICES, micro_edge_table
from graphscope_ray.state.graph import build_graph

from .oracles import (
    oracle_bfs_depth,
    oracle_cdlp,
    oracle_pagerank,
    oracle_sssp,
    oracle_wcc,
)


def _micro_graph(P, directed):
    edges = ray.data.from_arrow(micro_edge_table())
    verts = ray.data.from_items([{"vid": v} for v in MICRO_VERTICES])
    return build_graph(edges, num_partitions=P, directed=directed,
                       extra_vertices=verts)


def _to_map(ds, col):
    df = ds.to_pandas()
    return dict(zip(df["vid"], df[col]))


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("directed", [True, False])
def test_pagerank_micro(P, directed):
    g = _micro_graph(P, directed)
    res, metrics = pagerank(g)
    got = _to_map(res, "pagerank")
    want = oracle_pagerank(MICRO_EDGES, MICRO_VERTICES, directed)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6), f"vertex {v}"
    assert metrics["rounds"] < 100
    assert abs(sum(got.values()) - 1.0) < 1e-9


@pytest.mark.parametrize("P", [1, 4])
def test_wcc_micro(P):
    g = _micro_graph(P, directed=False)
    res, _ = wcc(g)
    got = _to_map(res, "component")
    want = oracle_wcc(MICRO_EDGES, MICRO_VERTICES)
    assert got == want
    # isolated vertex is its own component
    assert got[11] == 11


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("directed", [False, True])
def test_cdlp_micro(P, directed):
    g = _micro_graph(P, directed)
    res, _ = cdlp(g, max_round=10)
    got = _to_map(res, "label")
    want = oracle_cdlp(MICRO_EDGES, MICRO_VERTICES, directed, max_round=10)
    assert got == want


@pytest.mark.parametrize("P", [1, 3])
def test_bfs_micro(P):
    g = _micro_graph(P, directed=True)
    res, _ = bfs(g, source=0)
    got = {v: d for v, d in _to_map(res, "depth").items() if np.isfinite(d)}
    want = oracle_bfs_depth(MICRO_EDGES, MICRO_VERTICES, 0, directed=True)
    assert got == {k: float(v) for k, v in want.items()}


@pytest.mark.parametrize("P", [1, 3])
def test_sssp_micro(P):
    g = _micro_graph(P, directed=False)
    res, _ = sssp(g, source=0)
    got = {v: d for v, d in _to_map(res, "distance").items() if np.isfinite(d)}
    want = oracle_sssp([(s, d, 1.0) for s, d in MICRO_EDGES],
                       MICRO_VERTICES, 0, directed=False)
    assert got == {k: float(v) for k, v in want.items()}
