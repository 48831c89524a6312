"""GIE operator additions: cogroup_join, Intersect, PathExpand,
Apply/SegmentApply, Pattern — vs pandas/networkx oracles."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.stages.relational import (
    apply_correlate,
    cogroup_join,
    intersect_lists,
    match_pattern,
    path_expand,
    segment_apply,
)


def _arrow(df):
    return ray.data.from_pandas(df).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")


@pytest.fixture(scope="module")
def ggraph():
    rng = np.random.default_rng(11)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 20, (70, 2))
                    if a != b})
    G = nx.DiGraph()
    G.add_edges_from(edges)
    ds = _arrow(pd.DataFrame({"src": [a for a, _ in edges],
                              "dst": [b for _, b in edges]}))
    return G, ds


def test_cogroup_join_tiny_left(ggraph):
    _, ds = ggraph
    left = _arrow(pd.DataFrame({"k": [3], "tagv": ["x"]}))
    out = cogroup_join(left, ds, on="k", right_on="src").to_pandas()
    want = ds.to_pandas()
    want = want[want["src"] == 3]
    assert sorted(out["dst"]) == sorted(want["dst"])
    assert (out["tagv"] == "x").all()


def test_cogroup_join_left_outer_preserves_big_ints():
    # left-outer: unmatched left rows survive with nulls; matched
    # int64 payloads above 2^53 must stay bit-exact (no float64 hop)
    big = (1 << 60) + 12345
    left = _arrow(pd.DataFrame({"k": np.array([1, 2, 3], np.int64),
                                "lv": np.array([10, 20, 30], np.int64)}))
    right = _arrow(pd.DataFrame({"k": np.array([1, 3], np.int64),
                                 "rv": np.array([big, big + 7],
                                                np.int64)}))
    ds = cogroup_join(left, right, on="k", how="left")
    # read ARROW-side (the engine's native format): int64-with-nulls
    # is exact there; a pandas read of a null-carrying int column is
    # the documented float64 caveat
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    got = {}
    for t in tables:
        for k, rv, lv in zip(t.column("k").to_pylist(),
                             t.column("rv").to_pylist(),
                             t.column("lv").to_pylist()):
            got[k] = (rv, lv)
    assert got == {1: (big, 10), 2: (None, 20), 3: (big + 7, 30)}


def test_cogroup_join_right_and_full_outer():
    big = (1 << 59) + 99
    left = _arrow(pd.DataFrame({"k": np.array([1, 2], np.int64),
                                "lv": np.array([big, big + 1],
                                               np.int64)}))
    right = _arrow(pd.DataFrame({"k": np.array([2, 3], np.int64),
                                 "rv": np.array([7, 8], np.int64)}))

    def rows(ds):
        got = {}
        for t in ds.iter_batches(batch_format="pyarrow"):
            for k, lv, rv in zip(t.column("k").to_pylist(),
                                 t.column("lv").to_pylist(),
                                 t.column("rv").to_pylist()):
                got[k] = (lv, rv)
        return got

    r = rows(cogroup_join(left, right, on="k", how="right"))
    assert r == {2: (big + 1, 7), 3: (None, 8)}
    o = rows(cogroup_join(left, right, on="k", how="outer"))
    assert o == {1: (big, None), 2: (big + 1, 7), 3: (None, 8)}
    with pytest.raises(ValueError, match="unsupported how"):
        cogroup_join(left, right, on="k", how="cross")


def test_intersect_lists():
    ds = _arrow(pd.DataFrame({
        "id": [1, 2],
        "xs": [[1, 2, 3], [5, 6]],
        "ys": [[2, 3, 4], [7]],
    }))
    out = intersect_lists(ds, ["xs", "ys"], "both").to_pandas()
    got = {r.id: list(r.both) for r in out.itertuples()}
    assert got == {1: [2, 3], 2: []}


def test_path_expand(ggraph):
    G, ds = ggraph
    starts = _arrow(pd.DataFrame({"vid": [0, 5]}))
    out = path_expand(ds, starts, min_hops=1, max_hops=3).to_pandas()
    got = {(r.start, r.end): r.hops for r in out.itertuples()}
    want = {}
    for s in (0, 5):
        ln = nx.single_source_shortest_path_length(G, s, cutoff=3)
        for v, d in ln.items():
            if 1 <= d <= 3:
                want[(s, v)] = d
    assert got == want


def test_apply_and_segment_apply():
    ds = _arrow(pd.DataFrame({"g": [1, 1, 2], "x": [1, 2, 10]}))

    def explode_twice(b: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([b.assign(rep=0), b.assign(rep=1)])

    out = apply_correlate(ds, explode_twice).to_pandas()
    assert len(out) == 6

    def seg_sum(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": [g["g"].iloc[0]], "s": [g["x"].sum()]})

    out2 = segment_apply(ds, ["g"], seg_sum).to_pandas().sort_values("g")
    assert out2["s"].tolist() == [3, 10]


def test_match_pattern_triangle(ggraph):
    G, ds = ggraph
    out = match_pattern(ds, [("a", "b"), ("b", "c"), ("a", "c")]).to_pandas()
    got = set(map(tuple, out[["a", "b", "c"]].to_numpy()))
    want = {(a, b, c) for a in G for b in G.successors(a)
            for c in G.successors(b) if G.has_edge(a, c)
            and len({a, b, c}) == 3}
    assert got == want


def test_match_pattern_wedge_into_bound(ggraph):
    G, ds = ggraph
    # 2-hop path a->b->c with both ends distinct
    out = match_pattern(ds, [("a", "b"), ("b", "c")]).to_pandas()
    got = set(map(tuple, out[["a", "b", "c"]].to_numpy()))
    want = {(a, b, c) for a in G for b in G.successors(a)
            for c in G.successors(b) if len({a, b, c}) == 3}
    assert got == want


@pytest.fixture(scope="module")
def wgraph():
    rng = np.random.default_rng(23)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 12, (40, 2))
                    if a != b})
    w = {e: float(rng.integers(1, 9)) for e in edges}
    G = nx.DiGraph()
    for (a, b), wt in w.items():
        G.add_edge(a, b, weight=wt)
    ds = _arrow(pd.DataFrame({"src": [a for a, _ in edges],
                              "dst": [b for _, b in edges],
                              "cost": [w[e] for e in edges]}))
    return G, ds


def test_shortest_path_expand_weighted(wgraph):
    from graphscope_ray.stages.relational import shortest_path_expand

    G, ds = wgraph
    starts = _arrow(pd.DataFrame({"vid": [0, 7]}))
    out = shortest_path_expand(ds, starts, weight_col="cost",
                               num_buckets=2).to_pandas()
    got = {(r.start, r.end): r.weight for r in out.itertuples()}
    want = {}
    for s in (0, 7):
        for v, d in nx.single_source_dijkstra_path_length(
                G, s, weight="weight").items():
            if v != s:
                want[(s, v)] = d
    assert got == pytest.approx(want)


def test_shortest_path_expand_hop_default_matches_path_expand(wgraph):
    from graphscope_ray.stages.relational import shortest_path_expand

    G, ds = wgraph
    starts = _arrow(pd.DataFrame({"vid": [0]}))
    out = shortest_path_expand(ds, starts, weight_col=None,
                               max_hops=3, num_buckets=2).to_pandas()
    got = {(r.start, r.end): r.weight for r in out.itertuples()}
    want = {(0, v): float(d) for v, d in
            nx.single_source_shortest_path_length(G, 0, cutoff=3).items()
            if 1 <= d <= 3}
    assert got == pytest.approx(want)


def test_shortest_path_expand_max_agg(wgraph):
    """agg=max: path weight = max edge on the path; minimize over paths
    (minimax / bottleneck shortest path)."""
    from graphscope_ray.stages.relational import shortest_path_expand

    G, ds = wgraph
    starts = _arrow(pd.DataFrame({"vid": [0]}))
    out = shortest_path_expand(ds, starts, weight_col="cost",
                               agg="max", num_buckets=2).to_pandas()
    got = {(r.start, r.end): r.weight for r in out.itertuples()}
    # brute-force minimax via repeated dijkstra substitute: compute with
    # networkx by binary relaxation — do it directly with a modified
    # Bellman-Ford on the small graph
    import itertools
    nodes = list(G.nodes)
    INF = float("inf")
    d = {v: INF for v in nodes}
    d[0] = 0.0
    for _ in nodes:
        for a, b, dat in G.edges(data=True):
            if d[a] < INF:
                cand = max(d[a], dat["weight"]) if d[a] > 0 else dat["weight"]
                if cand < d[b]:
                    d[b] = cand
    want = {(0, v): dv for v, dv in d.items() if v != 0 and dv < INF}
    assert got == pytest.approx(want)


def test_edge_expand_directions(ggraph):
    from graphscope_ray.stages.relational import edge_expand

    G, ds = ggraph
    binds = _arrow(pd.DataFrame({"v": [3, 7, 7], "tagq": ["a", "b", "c"]}))
    for direction, nbrs in (
        ("out", lambda v: list(G.successors(v))),
        ("in", lambda v: list(G.predecessors(v))),
        ("both", lambda v: list(G.successors(v)) + list(G.predecessors(v))),
    ):
        out = edge_expand(binds, ds, "v", direction=direction).to_pandas()
        want = sorted((v, n) for v in [3, 7, 7] for n in nbrs(v))
        got = sorted(zip(out["v"], out["nbr"]))
        assert got == want, direction
        # binding payload survives the shuffle
        assert set(out.loc[out["v"] == 7, "tagq"]) <= {"b", "c"}


def test_edge_expand_edge_opt_carries_props():
    from graphscope_ray.stages.relational import edge_expand

    edges = _arrow(pd.DataFrame(
        {"src": [1, 1, 2], "dst": [2, 3, 3], "w": [0.5, 1.5, 2.5]}))
    binds = _arrow(pd.DataFrame({"v": [1, 2]}))
    out = edge_expand(binds, edges, "v", direction="out",
                      expand_opt="edge", alias="e").to_pandas()
    got = sorted(zip(out["v"], out["e"], out["e_w"]))
    assert got == [(1, 2, 0.5), (1, 3, 1.5), (2, 3, 2.5)]


def test_get_v_attaches_props_and_semijoins():
    from graphscope_ray.stages.relational import get_v

    verts = _arrow(pd.DataFrame(
        {"vid": [1, 2, 3], "name": ["a", "b", "c"], "age": [10, 20, 30]}))
    binds = _arrow(pd.DataFrame({"end": [2, 3, 99], "k": [7, 8, 9]}))
    out = get_v(binds, verts, "end").to_pandas()
    got = sorted(zip(out["end"], out["end_name"], out["end_age"], out["k"]))
    # vid 99 has no vertex row -> dropped (label-filter semantics)
    assert got == [(2, "b", 20, 7), (3, "c", 30, 8)]


def test_event_funnel_edge_cases():
    from graphscope_ray.stages.relational import event_funnel

    T = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    rows = [
        # user 1: full funnel inside the window
        (1, T + 0 * h, "view"), (1, T + 1 * h, "click"),
        (1, T + 2 * h, "purchase"),
        # user 2: completes but outside the 24h window (first-touch)
        (2, T + 0 * h, "view"), (2, T + 1 * h, "click"),
        (2, T + 30 * h, "purchase"),
        # user 3: steps out of order — purchase BEFORE click never chains
        (3, T + 0 * h, "view"), (3, T + 1 * h, "purchase"),
        (3, T + 2 * h, "click"),
        # user 4: reaches step 2 only
        (4, T + 0 * h, "view"), (4, T + 1 * h, "click"),
        # user 5: never starts (no view)
        (5, T + 0 * h, "click"), (5, T + 1 * h, "purchase"),
        # user 6: equal timestamps never chain (strict >)
        (6, T, "view"), (6, T, "click"),
        # user 7: first-touch greedy — earliest view is used even though
        # a later view would complete inside the window
        (7, T + 0 * h, "view"), (7, T + 40 * h, "view"),
        (7, T + 41 * h, "click"), (7, T + 42 * h, "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    for P in (1, 3):
        out = (event_funnel(ray.data.from_pandas(df).repartition(P),
                            ["view", "click", "purchase"],
                            within_seconds=86400)
               .to_pandas().set_index("user_id").sort_index())
        assert set(out.index) == {1, 2, 3, 4, 6, 7}
        assert out.loc[1, "steps_completed"] == 3 and out.loc[1, "completed"]
        # user 2 completes the chain but outside the window
        assert out.loc[2, "steps_completed"] == 3
        assert not out.loc[2, "completed"]
        assert out.loc[3, "steps_completed"] == 2   # view -> click only
        assert pd.isna(out.loc[3, "t3"])
        assert out.loc[4, "steps_completed"] == 2
        assert out.loc[6, "steps_completed"] == 1   # ties never chain
        # first-touch: t1 pins to the earliest view; chain completes via
        # the later click/purchase but exceeds the 24h window from t1
        assert out.loc[7, "steps_completed"] == 3
        assert not out.loc[7, "completed"]
