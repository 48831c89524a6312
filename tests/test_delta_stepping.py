"""Delta-stepping SSSP (flash/traversal/sssp-dlt-step.h) vs the plain
Bellman-Ford dist loop and networkx dijkstra — same fixpoint, bucketed
schedule. Random weighted graphs at two partition counts prove
partition invariance; a custom Δ exercises the bucket clamp."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.pipelines.algorithms import sssp, sssp_delta_stepping
from graphscope_ray.state.graph import build_graph


def _weighted_graph(P, seed=7, n=40, m=120, directed=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = np.round(rng.uniform(0.1, 5.0, len(src)), 3)
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "weight": pa.array(w, pa.float64())})
    verts = ray.data.from_items([{"vid": int(v)} for v in range(n)])
    g = build_graph(ray.data.from_arrow(t), num_partitions=P,
                    directed=directed, extra_vertices=verts)
    return g, list(zip(src.tolist(), dst.tolist(), w.tolist()))


def _dist_map(ds):
    df = ds.to_pandas()
    return {int(v): float(d) for v, d in zip(df["vid"], df["distance"])
            if np.isfinite(d)}


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("directed", [False, True])
def test_delta_stepping_matches_plain_sssp(P, directed):
    g, _ = _weighted_graph(P, seed=11 + P, directed=directed)
    got, metrics = sssp_delta_stepping(g, source=0)
    want, _ = sssp(g, source=0)
    gm, wm = _dist_map(got), _dist_map(want)
    assert set(gm) == set(wm)
    for v in gm:
        assert gm[v] == pytest.approx(wm[v], abs=1e-12), v
    assert metrics["rounds"] >= 1


def test_delta_stepping_vs_networkx_dijkstra():
    nx = pytest.importorskip("networkx")
    g, edges = _weighted_graph(P=2, seed=23)
    got, _ = sssp_delta_stepping(g, source=0)
    gm = _dist_map(got)
    G = nx.Graph()
    G.add_nodes_from(range(40))
    for s, d, w in edges:
        # parallel edges: build_graph keeps the min-weight arc per pair?
        # No — it keeps distinct (src,dst) rows; mirror by min like nx
        if G.has_edge(s, d):
            w = min(w, G[s][d]["weight"])
        G.add_edge(s, d, weight=w)
    want = nx.single_source_dijkstra_path_length(G, 0)
    assert set(gm) == set(want)
    for v in gm:
        assert gm[v] == pytest.approx(want[v], abs=1e-9), v


def test_delta_stepping_custom_delta_and_unreachable():
    """Tiny Δ forces many buckets (clamp path); a disconnected vertex
    stays unreached; Δ larger than the diameter degenerates to plain
    Bellman-Ford in one bucket."""
    t = pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                  "dst": pa.array([1, 2, 3], pa.int64()),
                  "weight": pa.array([1.0, 2.0, 1.5], pa.float64())})
    verts = ray.data.from_items([{"vid": v} for v in range(5)])
    g = build_graph(ray.data.from_arrow(t), num_partitions=2,
                    directed=False, extra_vertices=verts)
    for dlt in (0.5, 100.0):
        res, metrics = sssp_delta_stepping(g, source=0, delta=dlt)
        df = res.to_pandas().set_index("vid")["distance"]
        assert df[0] == 0.0 and df[1] == 1.0 and df[2] == 3.0 \
            and df[3] == 4.5
        assert not np.isfinite(df[4])
    # Δ=100 covers everything in one bucket
    assert metrics["per_round"][0]["bucket_lo"] == 0.0
