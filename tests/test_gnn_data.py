"""Composed GNN link-prediction dataset: label correctness, negative
validity, context-arc validity, determinism."""

import numpy as np
import pandas as pd
import ray.data

from graphscope_ray.pipelines.gnn_data import (
    link_prediction_dataset,
    link_prediction_subgraphs,
)
from graphscope_ray.state.graph import build_graph

PAIRS = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 6),
         (6, 0), (1, 4)]


def _setup(P=3):
    df = pd.DataFrame(PAIRS, columns=["src", "dst"]).astype(np.int64)
    edges = ray.data.from_pandas(df)
    g = build_graph(edges, num_partitions=P, directed=False)
    return g, edges


def test_labels_partition_and_validity():
    g, edges = _setup()
    out = link_prediction_dataset(g, edges, neg_k=3, seed=7).to_pandas()
    arcs = {(a, b) for a, b in PAIRS} | {(b, a) for a, b in PAIRS}
    pos = out[out["label"] == 1]
    neg = out[out["label"] == 0]
    assert len(pos) == len(PAIRS)
    assert {(int(r.src), int(r.dst)) for r in pos.itertuples()} == set(
        PAIRS)
    assert len(neg) > 0
    for r in neg.itertuples():
        assert (int(r.src), int(r.dst)) not in arcs
        assert r.src != r.dst


def test_subgraphs_context_arcs_are_real_edges():
    g, edges = _setup()
    pairs, ctx = link_prediction_subgraphs(
        g, edges, fanouts=[2, 2], neg_k=1, seed=7)
    arcs = {(a, b) for a, b in PAIRS} | {(b, a) for a, b in PAIRS}
    rows = ctx.take_all()
    assert rows
    hops = {int(r["hop"]) for r in rows}
    assert hops <= {0, 1}
    for r in rows:
        assert (int(r["src"]), int(r["dst"])) in arcs
    # determinism: same seeds → identical pair set and context set
    pairs2, ctx2 = link_prediction_subgraphs(
        g, edges, fanouts=[2, 2], neg_k=1, seed=7)
    key = lambda ds: sorted(tuple(sorted(r.items())) for r in
                            ds.take_all())
    assert key(pairs) == key(pairs2)
    assert key(ctx) == key(ctx2)


def test_subgraphs_directed_mismatch_raises():
    import pytest as _pytest
    g, edges = _setup()            # pool built undirected
    with _pytest.raises(ValueError, match="directedness"):
        link_prediction_subgraphs(g, edges, fanouts=[2], directed=True)
