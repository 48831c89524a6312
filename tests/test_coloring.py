"""Greedy graph coloring vs the FLASH replica + properness."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.pipelines.algorithms import graph_coloring
from graphscope_ray.sources.generator import MICRO_EDGES, MICRO_VERTICES
from graphscope_ray.state.graph import build_graph

from .oracles import oracle_graph_coloring


def _rand(seed, n=35, m=120):
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
         ("rand3", *_rand(3)),
         ("rand9", *_rand(9, n=50, m=200)),
         ("clique", [(i, j) for i in range(6) for j in range(i + 1, 6)],
          list(range(6)))]


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("name,edges,verts", CASES, ids=[c[0] for c in CASES])
def test_graph_coloring(P, name, edges, verts):
    g = _build(edges, verts, P)
    got = dict(zip(*(lambda df: (df["vid"], df["color"]))(
        graph_coloring(g).to_pandas())))
    want = oracle_graph_coloring(edges, verts)
    assert got == want
    for a, b in edges:
        if a != b:
            assert got[a] != got[b], f"improper edge ({a},{b})"


def _lpa_by_color_replica(edges, vertices):
    """Sequential replica of the engine's lpa_by_color: greedy-color
    (the already-pinned oracle), then sweep color classes in order —
    each class relabels synchronously from CURRENT labels, argmax
    count with min-label tie-break — until a full sweep is quiet."""
    from collections import Counter, defaultdict

    colors = oracle_graph_coloring(edges, vertices)
    nbrs = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    classes = defaultdict(list)
    for v, c in colors.items():
        classes[c].append(v)
    label = {v: v for v in vertices}
    for _ in range(100):
        changed = 0
        for c in sorted(classes):
            snapshot = dict(label)
            for v in classes[c]:
                if not nbrs[v]:
                    continue
                cnt = Counter(snapshot[u] for u in nbrs[v])
                best = max(cnt.values())
                new = min(l for l, k in cnt.items() if k == best)
                if new != label[v]:
                    label[v] = new
                    changed += 1
        if changed == 0:
            break
    return label


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("name,edges,verts", CASES, ids=[c[0] for c in CASES])
def test_lpa_by_color(P, name, edges, verts):
    from graphscope_ray.pipelines.algorithms import lpa_by_color

    g = _build(edges, verts, P)
    res, metrics = lpa_by_color(g)
    df = res.to_pandas()
    got = dict(zip(df["vid"], df["label"]))
    want = _lpa_by_color_replica(edges, verts)
    assert got == want
    assert metrics["rounds"] >= 1
