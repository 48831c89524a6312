"""Randomized differential fuzz for the Cypher frontend: random
property digraphs, pattern/aggregate/var-length/optional queries vs
straight pandas-merge oracles."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.query import CypherGraph

SEEDS = [3, 17, 91]


def _graph(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(8, 28))
    verts = pd.DataFrame({
        "vid": np.arange(n, dtype=np.int64),
        "x": rng.integers(0, 50, n).astype(np.int64),
    })
    def edges(m):
        src = rng.integers(0, n, m).astype(np.int64)
        dst = rng.integers(0, n, m).astype(np.int64)
        keep = src != dst
        df = pd.DataFrame({
            "src": src[keep], "dst": dst[keep],
            "w": rng.integers(0, 20, int(keep.sum())).astype(np.int64),
        }).drop_duplicates(["src", "dst"]).reset_index(drop=True)
        return df
    T = edges(int(rng.integers(10, 4 * n)))
    U = edges(int(rng.integers(10, 4 * n)))
    g = (CypherGraph()
         .add_vertices("V", ray.data.from_pandas(verts))
         .add_edges("T", ray.data.from_pandas(T))
         .add_edges("U", ray.data.from_pandas(U)))
    return g, verts, T, U, rng


@pytest.mark.parametrize("seed", SEEDS)
def test_filtered_hop_count(seed):
    g, verts, T, _, rng = _graph(seed)
    c = int(rng.integers(0, 50))
    d = int(rng.integers(0, 20))
    out = g.query(
        f"MATCH (a:V)-[e:T]->(b:V) WHERE a.x > {c} AND e.w <= {d} "
        "RETURN count(*) AS n").to_pandas()
    m = T.merge(verts, left_on="src", right_on="vid")
    want = int(((m["x"] > c) & (m["w"] <= d)).sum())
    assert int(out["n"].iloc[0]) == want


@pytest.mark.parametrize("seed", SEEDS)
def test_grouped_aggregates(seed):
    g, _verts, T, _, _ = _graph(seed)
    out = g.query("MATCH (a:V)-[e:T]->(b:V) "
                  "RETURN a AS a, count(*) AS deg, sum(e.w) AS sw "
                  "ORDER BY a").to_pandas()
    want = (T.groupby("src").agg(deg=("dst", "size"), sw=("w", "sum"))
            .reset_index().sort_values("src"))
    assert np.array_equal(out["a"].to_numpy(np.int64),
                          want["src"].to_numpy(np.int64))
    assert np.array_equal(out["deg"].to_numpy(np.int64),
                          want["deg"].to_numpy(np.int64))
    assert np.array_equal(out["sw"].to_numpy(np.int64),
                          want["sw"].to_numpy(np.int64))


@pytest.mark.parametrize("seed", SEEDS)
def test_two_hop_homomorphic_count(seed):
    g, verts, T, U, rng = _graph(seed)
    e = int(rng.integers(0, 50))
    out = g.query(
        "MATCH (a:V)-[:T]->(b:V)-[f:U]->(c:V) "
        f"WHERE c.x >= {e} RETURN count(*) AS n").to_pandas()
    m = (T.rename(columns={"src": "a", "dst": "b"})
         .merge(U.rename(columns={"src": "b", "dst": "c"}), on="b")
         .merge(verts, left_on="c", right_on="vid"))
    want = int((m["x"] >= e).sum())
    assert int(out["n"].iloc[0]) == want


@pytest.mark.parametrize("seed", SEEDS)
def test_distinct_endpoints(seed):
    g, _verts, T, _, _ = _graph(seed)
    out = g.query("MATCH (a:V)-[:T]->(b) RETURN DISTINCT b AS b"
                  ).to_pandas()
    assert sorted(out["b"].tolist()) == sorted(set(T["dst"]))


@pytest.mark.parametrize("seed", SEEDS)
def test_var_length_reachability(seed):
    g, verts, T, _, rng = _graph(seed)
    c = int(rng.integers(0, 40))
    out = g.query(
        f"MATCH (a:V)-[:T*1..2]->(b) WHERE a.x > {c} "
        "RETURN count(*) AS n").to_pandas()
    # Cypher path semantics: one binding per distinct 1- or 2-arc walk
    # (distinct intermediates → distinct rows; 2-cycles may return to
    # the start) — at length ≤ 2 walks = relationship-distinct paths
    adj = {}
    for s, d in zip(T["src"], T["dst"]):
        adj.setdefault(int(s), set()).add(int(d))
    starts = verts.loc[verts["x"] > c, "vid"].astype(int)
    want = 0
    distinct_ends = set()
    for a in starts:
        one = adj.get(a, set())
        want += len(one) + sum(len(adj.get(b, set())) for b in one)
        two = set().union(*[adj.get(b, set()) for b in one]) \
            if one else set()
        distinct_ends |= {(a, b) for b in one | two}
    assert int(out["n"].iloc[0]) == want
    # DISTINCT endpoints pin the homomorphic endpoint set too
    dd = g.query(
        f"MATCH (a:V)-[:T*1..2]->(b) WHERE a.x > {c} "
        "RETURN DISTINCT a AS a, b AS b").to_pandas()
    assert set(zip(dd["a"], dd["b"])) == distinct_ends


@pytest.mark.parametrize("seed", SEEDS)
def test_optional_match_degree(seed):
    g, verts, T, _, _ = _graph(seed)
    out = g.query("MATCH (a:V) OPTIONAL MATCH (a)-[e:T]->(b) "
                  "RETURN a AS a, count(b) AS nb ORDER BY a"
                  ).to_pandas()
    deg = T.groupby("src").size()
    want = verts["vid"].map(deg).fillna(0).astype(np.int64)
    assert np.array_equal(out["a"].to_numpy(np.int64),
                          verts["vid"].to_numpy())
    assert np.array_equal(out["nb"].to_numpy(np.int64),
                          want.to_numpy())


# ------------------------------------------------------------------
# Gremlin-style fluent frontend over the same random graphs
# ------------------------------------------------------------------

@pytest.mark.parametrize("seed", SEEDS)
def test_traversal_out_count_and_values(seed):
    from graphscope_ray.query import P, traversal_source
    g, verts, T, _, rng = _graph(seed)
    t = traversal_source(g)
    c = int(rng.integers(0, 50))
    got = t.V("V").has("x", P.gt(c)).out("T").count().toList()
    m = T.merge(verts, left_on="src", right_on="vid")
    assert got[0] == int((m["x"] > c).sum())
    vals = t.V("V").out("T").values("x").toList()
    want = sorted(T.merge(verts, left_on="dst",
                          right_on="vid")["x"].tolist())
    assert sorted(vals) == want


@pytest.mark.parametrize("seed", SEEDS)
def test_traversal_group_count(seed):
    from graphscope_ray.query import traversal_source
    g, verts, T, _, _ = _graph(seed)
    t = traversal_source(g)
    rows = t.V("V").out("T").groupCount().toList()
    want = T.groupby("dst").size().to_dict()
    assert {r[0]: r[1] for r in rows} == {int(k): int(v)
                                          for k, v in want.items()}


@pytest.mark.parametrize("seed", SEEDS)
def test_traversal_both_dedup(seed):
    from graphscope_ray.query import traversal_source
    g, _verts, T, U, _ = _graph(seed)
    t = traversal_source(g)
    rows = t.V("V").both("U").dedup().toList()
    want = set(U["src"]) | set(U["dst"])
    assert sorted(rows) == sorted(want)


@pytest.mark.parametrize("seed", SEEDS)
def test_alternative_rel_types(seed):
    """[:T|U] = union of per-type arc tables (row-per-arc semantics)."""
    g, verts, T, U, rng = _graph(seed)
    c = int(rng.integers(0, 50))
    out = g.query(
        f"MATCH (a:V)-[:T|U]->(b) WHERE a.x > {c} "
        "RETURN count(*) AS n").to_pandas()
    both = pd.concat([T[["src", "dst"]], U[["src", "dst"]]])
    m = both.merge(verts, left_on="src", right_on="vid")
    assert int(out["n"].iloc[0]) == int((m["x"] > c).sum())
    # edge property binding rides each type's own rows
    o2 = g.query("MATCH (a)-[e:T|U]->(b) RETURN sum(e.w) AS s"
                 ).to_pandas()
    assert int(o2["s"].iloc[0]) == int(T["w"].sum() + U["w"].sum())


@pytest.mark.parametrize("seed", SEEDS[:2])
def test_traversal_multi_label_out(seed):
    from graphscope_ray.query import traversal_source
    g, _verts, T, U, _ = _graph(seed)
    t = traversal_source(g)
    got = t.V("V").out("T", "U").count().toList()
    assert got[0] == len(T) + len(U)


@pytest.mark.parametrize("seed", SEEDS)
def test_pattern_predicates_semi_anti(seed):
    """WHERE [NOT] (a)-[:U]->(b): semi/anti pair-join vs pandas,
    original multiplicity preserved."""
    g, verts, T, U, rng = _graph(seed)
    c = int(rng.integers(0, 50))
    semi = g.query(
        f"MATCH (a:V)-[:T]->(b) WHERE (a)-[:U]->(b) AND a.x > {c} "
        "RETURN a AS a, b AS b").to_pandas()
    anti = g.query(
        "MATCH (a:V)-[:T]->(b) WHERE NOT (a)-[:U]->(b) "
        "RETURN a AS a, b AS b").to_pandas()
    upairs = set(zip(U["src"], U["dst"]))
    m = T.merge(verts, left_on="src", right_on="vid")
    tsem = m[(m["x"] > c)
             & [p in upairs for p in zip(m["src"], m["dst"])]]
    tant = T[[p not in upairs for p in zip(T["src"], T["dst"])]]

    def pairs(df):
        # Ray's to_pandas drops columns on an all-empty dataset
        return sorted(zip(df["a"], df["b"])) if len(df) else []

    assert pairs(semi) == sorted(zip(tsem["src"], tsem["dst"]))
    assert pairs(anti) == sorted(zip(tant["src"], tant["dst"]))


def test_pattern_predicate_restrictions():
    import ray.data as rd
    g, *_ = _graph(3)
    with pytest.raises(ValueError, match="top-level"):
        g.query("MATCH (a:V)-[:T]->(b) "
                "WHERE a.x > 1 OR (a)-[:U]->(b) RETURN a AS a")
    with pytest.raises(ValueError, match="single property-free hop"):
        g.query("MATCH (a:V)-[:T]->(b) "
                "WHERE (a)-[:U*1..2]->(b) RETURN a AS a")


@pytest.mark.parametrize("seed", SEEDS)
def test_existential_pattern_predicates(seed):
    from graphscope_ray.query import traversal_source
    g, verts, T, U, _ = _graph(seed)
    out = g.query("MATCH (a:V) WHERE (a)-[:T]->() RETURN a AS a"
                  ).to_pandas()
    got = sorted(out["a"]) if len(out) else []
    assert got == sorted(set(T["src"]))
    t = traversal_source(g)
    non_src = t.V("V").whereNotOut("T").id_().toList()
    assert sorted(non_src) == sorted(
        set(verts["vid"]) - set(T["src"]))
    both_in = t.V("V").whereIn("T", "U").id_().toList()
    assert sorted(both_in) == sorted(set(T["dst"]) | set(U["dst"]))


def test_review_fix_regressions():
    """Round-4 session-3 review findings, pinned: (1) parenthesized-
    variable arithmetic in WHERE must not be eaten by the pattern-
    predicate lookahead; (2) pattern predicates nested in CASE or
    RETURN raise the clear plan-time error; (3) trailing positional
    int to out() still means `times` (pre-variadic signature)."""
    from graphscope_ray.query import traversal_source
    g, verts, T, U, _ = _graph(3)
    out = g.query("MATCH (a:V)-[:T]->(b) WHERE (a) - 1 > 0 "
                  "RETURN DISTINCT a AS a").to_pandas()
    assert sorted(out["a"]) == sorted(set(T.loc[T["src"] > 1, "src"]))
    for q in ["MATCH (a:V)-[:T]->(b) WHERE CASE WHEN (a)-[:T]->(b) "
              "THEN true ELSE false END RETURN a AS a",
              "MATCH (a:V)-[:T]->(b) "
              "RETURN CASE WHEN (a)-[:T]->(b) THEN 1 ELSE 0 END AS c"]:
        with pytest.raises(ValueError, match="top-level"):
            g.query(q)
    t = traversal_source(g)
    two_hop = t.V("V").out("T", 2).count().toList()
    want = len(T.rename(columns={"dst": "m"}).merge(
        T.rename(columns={"src": "m"}), on="m"))
    assert two_hop[0] == want


def test_minibatch_directed_inference_guard():
    import pandas as pd

    from graphscope_ray.pipelines.gnn_train import (
        sage_minibatch_node_classification,
        train_sage_minibatch,
    )
    from graphscope_ray.state.graph import build_graph
    T = pd.DataFrame({"src": np.array([0, 1, 2], np.int64),
                      "dst": np.array([1, 2, 3], np.int64)})
    gd = build_graph(ray.data.from_pandas(T), num_partitions=2,
                     directed=True)
    feats = ray.data.from_pandas(pd.DataFrame({
        "vid": np.arange(4, dtype=np.int64),
        "feat": [[1.0, 0.0]] * 4,
        "label": np.array([0, 1, 0, -1], np.int64)}))
    with pytest.raises(ValueError, match="undirected"):
        sage_minibatch_node_classification(
            gd, feats, hidden=2, num_classes=2, epochs=1)
    with pytest.raises(ValueError, match="epochs"):
        train_sage_minibatch(gd, feats, epochs=0)


@pytest.mark.parametrize("seed", SEEDS)
def test_write_sequence_differential(seed):
    """Randomized write-statement fuzz: a random SET / DELETE-edges /
    CREATE-edge / DETACH-DELETE sequence replayed against a pandas
    replica, then the surviving graph compared exactly."""
    g, verts, T, U, rng = _graph(seed)
    v = verts.copy()
    t = T.copy()
    # SET with a random threshold
    c = int(rng.integers(0, 50))
    g.query(f"MATCH (a:V) WHERE a.x >= {c} SET a.x = a.x + 1000")
    v.loc[v["x"] >= c, "x"] += 1000
    # DELETE edges above a random weight
    d = int(rng.integers(0, 20))
    g.query(f"MATCH (a:V)-[r:T]->(b:V) WHERE r.w >= {d} DELETE r")
    t = t[t["w"] < d]
    # CREATE one fresh vertex + an edge per surviving T-edge source
    g.query("CREATE (x:V {vid: 999, x: 1})")
    v = pd.concat([v, pd.DataFrame({"vid": [999], "x": [1]})],
                  ignore_index=True)
    g.query("MATCH (a:V)-[:T]->(b:V) CREATE (a)-[:T {w: 0}]->(b)")
    t = pd.concat([t, t.assign(w=0)], ignore_index=True)
    # DETACH DELETE a random existing vertex
    dead = int(rng.integers(0, len(verts)))
    g.query(f"MATCH (a:V) WHERE a = {dead} DETACH DELETE a")
    v = v[v.vid != dead]
    t = t[(t.src != dead) & (t.dst != dead)]
    got_v = (g.query("MATCH (a:V) RETURN a AS vid, a.x AS x")
             .to_pandas().sort_values("vid").reset_index(drop=True))
    want_v = v.sort_values("vid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_v.astype(np.int64), want_v.astype(np.int64))
    got_e = g.query("MATCH (a:V)-[e:T]->(b:V) "
                    "RETURN a AS src, b AS dst, e.w AS w").to_pandas()
    if len(t) == 0:
        # a random d can delete EVERY T-edge (then the per-edge CREATE
        # adds none back) — an empty result has no columns to sort
        assert len(got_e) == 0
    else:
        got_e = (got_e.sort_values(["src", "dst", "w"])
                 .reset_index(drop=True))
        want_e = (t.sort_values(["src", "dst", "w"])
                  .reset_index(drop=True).astype(np.int64))
        pd.testing.assert_frame_equal(got_e.astype(np.int64), want_e)
