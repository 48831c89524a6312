"""Cypher-subset frontend: parser + planner vs pandas oracles on a
small property graph."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.query import CypherGraph

PERSONS = pd.DataFrame({
    "vid": np.array([1, 2, 3, 4, 5], np.int64),
    "name": ["ann", "bob", "cal", "dee", "eve"],
    "age": np.array([30, 25, 35, 28, 40], np.int64),
})
KNOWS = pd.DataFrame({
    "src": np.array([1, 1, 2, 3, 4, 5, 2], np.int64),
    "dst": np.array([2, 3, 3, 4, 5, 1, 5], np.int64),
    "since": np.array([2010, 2012, 2015, 2011, 2018, 2019, 2020],
                      np.int64),
})


@pytest.fixture()
def g():
    return (CypherGraph()
            .add_vertices("Person", ray.data.from_pandas(PERSONS))
            .add_edges("KNOWS", ray.data.from_pandas(KNOWS)))


def _rows(ds):
    df = ds.to_pandas()
    return sorted(map(tuple, df.itertuples(index=False)))


def test_single_hop_projection(g):
    out = g.query("MATCH (a:Person)-[e:KNOWS]->(b:Person) "
                  "RETURN a.name AS an, b.name AS bn, e.since AS y")
    m = KNOWS.merge(PERSONS, left_on="src", right_on="vid").merge(
        PERSONS, left_on="dst", right_on="vid",
        suffixes=("_a", "_b"))
    want = sorted(zip(m["name_a"], m["name_b"], m["since"]))
    assert _rows(out) == want


def test_where_and_inline_props(g):
    out = g.query("MATCH (a:Person {name: 'ann'})-[e:KNOWS]->(b) "
                  "WHERE e.since < 2012 RETURN b.age AS age")
    assert _rows(out) == [(25,)]
    out2 = g.query("MATCH (a:Person)-[e:KNOWS]->(b:Person) "
                   "WHERE a.age >= 30 AND (b.age < 30 OR b.name = 'eve')"
                   " RETURN a.name AS an, b.name AS bn")
    m = KNOWS.merge(PERSONS, left_on="src", right_on="vid").merge(
        PERSONS, left_on="dst", right_on="vid", suffixes=("_a", "_b"))
    m = m[(m["age_a"] >= 30) & ((m["age_b"] < 30) | (m["name_b"] == "eve"))]
    assert _rows(out2) == sorted(zip(m["name_a"], m["name_b"]))


def test_reverse_and_undirected(g):
    fwd = _rows(g.query(
        "MATCH (a)<-[e:KNOWS]-(b) RETURN a AS a, b AS b"))
    want = sorted(zip(KNOWS["dst"], KNOWS["src"]))
    assert fwd == want
    both = _rows(g.query(
        "MATCH (a)-[e:KNOWS]-(b) RETURN a AS a, b AS b"))
    sym = sorted(list(zip(KNOWS["src"], KNOWS["dst"]))
                 + list(zip(KNOWS["dst"], KNOWS["src"])))
    assert both == sym


def test_two_hops_and_cycle(g):
    out = g.query("MATCH (a)-[:KNOWS]->(b)-[:KNOWS]->(c) "
                  "RETURN a AS a, b AS b, c AS c")
    m = KNOWS.merge(KNOWS, left_on="dst", right_on="src",
                    suffixes=("1", "2"))
    want = sorted(zip(m["src1"], m["dst1"], m["dst2"]))
    assert _rows(out) == want
    # directed triangle via a second pattern sharing variables
    tri = g.query("MATCH (a)-[:KNOWS]->(b)-[:KNOWS]->(c), "
                  "(c)-[:KNOWS]->(a) RETURN a AS a, b AS b, c AS c")
    arcs = set(zip(KNOWS["src"], KNOWS["dst"]))
    want_tri = sorted((a, b, c) for a, b in arcs for c in range(1, 6)
                      if (b, c) in arcs and (c, a) in arcs)
    assert _rows(tri) == want_tri


def test_aggregates_and_order(g):
    out = g.query("MATCH (a:Person)-[e:KNOWS]->(b) "
                  "RETURN a.name AS an, count(*) AS deg, "
                  "sum(e.since) AS tot ORDER BY deg DESC, an ASC")
    m = KNOWS.merge(PERSONS, left_on="src", right_on="vid")
    w = (m.groupby("name").agg(deg=("since", "size"),
                               tot=("since", "sum")).reset_index()
         .sort_values(["deg", "name"], ascending=[False, True]))
    got = out.to_pandas()
    assert got["an"].tolist() == w["name"].tolist()
    assert got["deg"].tolist() == w["deg"].tolist()
    assert got["tot"].tolist() == w["tot"].tolist()


def test_global_aggregate_avg_distinct(g):
    out = g.query("MATCH (a)-[e:KNOWS]->(b) RETURN count(*) AS n, "
                  "avg(e.since) AS mean, count(DISTINCT b) AS nb")
    df = out.to_pandas()
    assert df["n"].iloc[0] == len(KNOWS)
    assert abs(df["mean"].iloc[0] - KNOWS["since"].mean()) < 1e-12
    assert df["nb"].iloc[0] == KNOWS["dst"].nunique()


def test_distinct_limit_skip(g):
    out = g.query("MATCH (a)-[:KNOWS]->(b) RETURN DISTINCT a AS a")
    assert _rows(out) == sorted((int(x),)
                                for x in KNOWS["src"].unique())
    top = g.query("MATCH (a:Person)-[e:KNOWS]->(b) "
                  "RETURN a.age AS age, e.since AS y "
                  "ORDER BY y DESC LIMIT 3")
    m = KNOWS.merge(PERSONS, left_on="src", right_on="vid")
    w = m.sort_values("since", ascending=False).head(3)
    assert top.to_pandas()["y"].tolist() == w["since"].tolist()
    mid = g.query("MATCH (a)-[e:KNOWS]->(b) RETURN e.since AS y "
                  "ORDER BY y ASC SKIP 2 LIMIT 2")
    assert mid.to_pandas()["y"].tolist() == sorted(
        KNOWS["since"])[2:4]


def test_variable_length(g):
    out = g.query("MATCH (a {name: 'ann'})-[:KNOWS*1..2]->(b) "
                  "RETURN DISTINCT b AS b")
    arcs = set(zip(KNOWS["src"], KNOWS["dst"]))
    one = {b for a, b in arcs if a == 1}
    two = {c for b in one for (x, c) in arcs if x == b}
    assert _rows(out) == sorted((int(x),) for x in one | two)


def test_parse_errors(g):
    with pytest.raises(ValueError, match="cypher"):
        g.query("MATCH (a RETURN a")
    with pytest.raises(ValueError, match="cypher"):
        g.query("MATCH (a)-[:NOPE*1..99]->(b) RETURN a AS a")
    with pytest.raises(KeyError):
        g.query("MATCH (a:Ghost) RETURN a AS a")


def test_with_having(g):
    # WITH aggregate → WHERE on the aggregate (HAVING) → RETURN
    out = g.query(
        "MATCH (a:Person)-[e:KNOWS]->(b) "
        "WITH a.name AS an, count(*) AS deg WHERE deg >= 2 "
        "RETURN an AS an, deg AS deg ORDER BY an ASC")
    m = KNOWS.merge(PERSONS, left_on="src", right_on="vid")
    w = m.groupby("name").size()
    w = w[w >= 2].sort_index()
    got = out.to_pandas()
    assert got["an"].tolist() == w.index.tolist()
    assert got["deg"].tolist() == w.tolist()


def test_with_two_level_aggregate(g):
    # per-source degree, then the max degree over all sources
    out = g.query(
        "MATCH (a)-[:KNOWS]->(b) WITH a AS a, count(*) AS deg "
        "RETURN max(deg) AS mx, count(*) AS nsrc")
    df = out.to_pandas()
    sizes = KNOWS.groupby("src").size()
    assert df["mx"].iloc[0] == sizes.max()
    assert df["nsrc"].iloc[0] == len(sizes)


def test_with_projection_rename(g):
    out = g.query(
        "MATCH (a:Person) WITH a.age AS age WHERE age > 28 "
        "RETURN count(*) AS n, sum(age) AS tot")
    df = out.to_pandas()
    w = PERSONS[PERSONS["age"] > 28]["age"]
    assert df["n"].iloc[0] == len(w) and df["tot"].iloc[0] == w.sum()


def test_string_predicates(g):
    out = g.query("MATCH (a:Person) WHERE a.name STARTS WITH 'a' "
                  "RETURN a.name AS n")
    assert _rows(out) == [("ann",)]
    out = g.query("MATCH (a:Person) WHERE a.name ENDS WITH 'e' "
                  "RETURN a.name AS n")
    assert _rows(out) == [("dee",), ("eve",)]
    out = g.query("MATCH (a:Person) WHERE a.name CONTAINS 'a' "
                  "AND a.age < 33 RETURN a.name AS n")
    assert _rows(out) == [("ann",)]


def test_optional_match_single_hop(g):
    # only the (2)-[since 2020]->(5) edge satisfies the inline map —
    # every other person must come back with b null (a local filter,
    # NOT a global one: the anchors survive)
    out = g.query(
        "MATCH (a:Person) OPTIONAL MATCH "
        "(a)-[e:KNOWS {since: 2020}]->(b) RETURN a AS a, b AS b")
    got = [(a, None if pd.isna(b) else int(b)) for a, b in _rows(out)]
    want = sorted([(2, 5)] + [(v, None) for v in PERSONS["vid"]
                              if v != 2])
    assert sorted(got) == want


def test_optional_match_props_and_is_null(g):
    # b.name must be null exactly where the optional missed
    out = g.query(
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:KNOWS]->(b:Person) "
        "WHERE b.age > 100 RETURN a.name AS an, b.name AS bn")
    df = out.to_pandas()
    # nobody is older than 100 → WHERE filters every matched row;
    # Cypher ternary logic keeps only rows where b is null… which the
    # comparison also filters. So expect zero rows.
    assert len(df) == 0
    out2 = g.query(
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:KNOWS]->"
        "(b:Person {age: 999}) WHERE b IS NULL RETURN a.name AS an")
    assert _rows(out2) == sorted((n,) for n in PERSONS["name"])
    out3 = g.query(
        "MATCH (a:Person {name: 'dee'}) OPTIONAL MATCH "
        "(a)-[:KNOWS]->(b:Person) "
        "RETURN a.name AS an, b.name AS bn")
    assert _rows(out3) == [("dee", "eve")]


def test_optional_match_two_hop_all_or_nothing(g):
    # the optional pattern matches as a WHOLE or binds nothing: a
    # 2-hop chain through a filtered middle must not leave b bound
    # with c null
    out = g.query(
        "MATCH (a:Person) OPTIONAL MATCH "
        "(a)-[:KNOWS]->(b:Person {age: 999})-[:KNOWS]->(c:Person) "
        "RETURN a AS a, b AS b, c AS c")
    df = out.to_pandas()
    assert len(df) == len(PERSONS)
    assert df["b"].isna().all() and df["c"].isna().all()


def test_optional_count_skips_nulls(g):
    out = g.query(
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:KNOWS]->"
        "(b:Person {name: 'eve'}) "
        "RETURN count(*) AS rows, count(b) AS nb")
    df = out.to_pandas()
    knows_eve = KNOWS[KNOWS["dst"] == 5]
    assert df["rows"].iloc[0] == len(PERSONS)
    assert df["nb"].iloc[0] == len(knows_eve)


def test_unwind_standalone_and_joined(g):
    out = g.query("UNWIND [10, 20, 30] AS x RETURN sum(x) AS s, "
                  "count(*) AS n")
    df = out.to_pandas()
    assert df["s"].iloc[0] == 60 and df["n"].iloc[0] == 3
    # post-MATCH unwind replicates each binding row
    out2 = g.query(
        "MATCH (a:Person {name: 'ann'}) UNWIND [1, 2] AS k "
        "RETURN a.age AS age, k AS k ORDER BY k ASC")
    assert _rows(out2) == [(30, 1), (30, 2)]
    # UNWIND var usable in WHERE
    out3 = g.query(
        "MATCH (a:Person) UNWIND [30, 40] AS t WHERE a.age = t "
        "RETURN a.name AS n ORDER BY n ASC")
    assert out3.to_pandas()["n"].tolist() == ["ann", "eve"]


def test_ternary_null_semantics(g):
    # KNOWS restricted so persons 1,3,4,5 have no outgoing edge
    cg = (CypherGraph()
          .add_vertices("Person", ray.data.from_pandas(PERSONS))
          .add_edges("KNOWS", ray.data.from_pandas(
              KNOWS[KNOWS["src"] == 2])))
    # null <> x is null → filtered (not kept)
    out = cg.query(
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:KNOWS]->(b:Person) "
        "WHERE b.age <> 5 RETURN a AS a, b AS b")
    assert sorted(r[0] for r in _rows(out)) == [2, 2]
    # NOT (null > 100) is null → filtered
    out2 = cg.query(
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:KNOWS]->(b:Person) "
        "WHERE NOT b.age > 100 RETURN a AS a, b AS b")
    assert sorted(r[0] for r in _rows(out2)) == [2, 2]
    # IS NULL still selects exactly the misses
    out3 = cg.query(
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:KNOWS]->(b:Person) "
        "WHERE b IS NULL RETURN a AS a")
    assert sorted(r[0] for r in _rows(out3)) == [1, 3, 4, 5]
    # avg/collect skip nulls (Cypher aggregate contract)
    df = cg.query(
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:KNOWS]->(b:Person) "
        "RETURN avg(b.age) AS m, collect(b.name) AS ns").to_pandas()
    # matches: 2->3 (35), 2->5 (40)
    assert abs(df["m"].iloc[0] - 37.5) < 1e-12
    assert sorted(df["ns"].iloc[0]) == ["cal", "eve"]


def test_optional_start_node_inline_props(g):
    # inline map on the BOUND start node filters the sub-pattern
    # locally: non-matching anchors keep their row with b null
    out = g.query(
        "MATCH (a:Person) OPTIONAL MATCH "
        "(a {name: 'ann'})-[:KNOWS]->(b:Person) "
        "RETURN a AS a, b AS b")
    rows = [(a, None if pd.isna(b) else int(b)) for a, b in _rows(out)]
    want = sorted([(1, 2), (1, 3)]
                  + [(v, None) for v in PERSONS["vid"] if v != 1])
    assert sorted(rows) == want


def test_named_plain_path_rejected(g):
    with pytest.raises(ValueError, match="named paths"):
        g.query("MATCH p = (a)-[:KNOWS]->(b) RETURN length(p) AS n")
    with pytest.raises(ValueError, match="OPTIONAL"):
        g.query("MATCH (a:Person) OPTIONAL MATCH "
                "p = shortestPath((a)-[:KNOWS*1..2]->(b)) "
                "RETURN a AS a")


def test_constant_false_filter_on_shortest_first(g):
    out = g.query(
        "MATCH p = shortestPath((a:Person)-[:KNOWS*1..2]->(b)) "
        "WHERE 1 = 0 RETURN a AS a")
    assert len(out.to_pandas()) == 0


def test_case_when(g):
    out = g.query(
        "MATCH (a:Person) RETURN a.name AS n, "
        "CASE WHEN a.age < 28 THEN 'young' WHEN a.age < 36 THEN 'mid' "
        "ELSE 'senior' END AS band ORDER BY n ASC")
    got = dict(zip(out.to_pandas()["n"], out.to_pandas()["band"]))
    want = {n: ("young" if a < 28 else "mid" if a < 36 else "senior")
            for n, a in zip(PERSONS["name"], PERSONS["age"])}
    assert got == want
    # CASE without ELSE yields null; aggregable; first-match wins
    df = g.query(
        "MATCH (a:Person) RETURN "
        "sum(CASE WHEN a.age >= 30 THEN 1 ELSE 0 END) AS older, "
        "count(CASE WHEN a.age < 30 THEN a END) AS younger").to_pandas()
    assert df["older"].iloc[0] == (PERSONS["age"] >= 30).sum()
    assert df["younger"].iloc[0] == (PERSONS["age"] < 30).sum()


def test_statistical_aggregates(g):
    df = g.query(
        "MATCH (a:Person) RETURN percentileCont(a.age, 0.5) AS med, "
        "percentileDisc(a.age, 0.5) AS medd, stDev(a.age) AS sd, "
        "stDevP(a.age) AS sdp").to_pandas()
    ages = PERSONS["age"]
    assert abs(df["med"].iloc[0] - ages.quantile(0.5)) < 1e-12
    # nearest-rank at p=0.5 over 5 sorted values -> the 3rd smallest
    assert df["medd"].iloc[0] == sorted(ages)[2]
    assert abs(df["sd"].iloc[0] - ages.std(ddof=1)) < 1e-12
    assert abs(df["sdp"].iloc[0] - ages.std(ddof=0)) < 1e-12
    # grouped percentile over hop targets
    out = g.query(
        "MATCH (a:Person)-[:KNOWS]->(b:Person) "
        "RETURN a AS a, percentileCont(b.age, 1.0) AS mx")
    m = KNOWS.merge(PERSONS, left_on="dst", right_on="vid")
    want = m.groupby("src")["age"].max()
    got = out.to_pandas().set_index("a")["mx"]
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12
    with pytest.raises(ValueError, match="percentile"):
        g.query("MATCH (a:Person) RETURN percentileCont(a.age, 2) AS x")


def test_shortest_path_lengths(g):
    import networkx as nx

    out = g.query(
        "MATCH p = shortestPath((a:Person)-[:KNOWS*1..4]->(b:Person)) "
        "RETURN a AS a, b AS b, length(p) AS hops")
    got = {(a, b): h for a, b, h in
           map(tuple, out.to_pandas().itertuples(index=False))}
    dg = nx.DiGraph(list(zip(KNOWS["src"], KNOWS["dst"])))
    want = {}
    for a in PERSONS["vid"]:
        for b, d in nx.single_source_shortest_path_length(
                dg, a, cutoff=4).items():
            if 1 <= d <= 4:
                want[(a, b)] = d
    assert got == want
    # anchored on a bound variable; hop-count filter in WHERE
    out2 = g.query(
        "MATCH (a:Person {name: 'ann'}), "
        "p = shortestPath((a)-[:KNOWS*1..3]->(b)) "
        "WHERE length(p) >= 2 RETURN b AS b, length(p) AS hops")
    got2 = sorted(map(tuple, out2.to_pandas().itertuples(index=False)))
    want2 = sorted((b, d) for (a, b), d in want.items()
                   if a == 1 and 2 <= d <= 3)
    assert got2 == want2


def test_property_anchored_pushdown(g):
    # the name anchor now joins a.name early and prunes BEFORE the
    # shortestPath expansion; result must match the unanchored query
    # filtered after the fact
    out = g.query(
        "MATCH (a:Person) , p = shortestPath((a)-[:KNOWS*1..3]->(b)) "
        "WHERE a.name = 'ann' RETURN b AS b, length(p) AS hops")
    import networkx as nx
    dg = nx.DiGraph(list(zip(KNOWS["src"], KNOWS["dst"])))
    want = sorted((b, d) for b, d in
                  nx.single_source_shortest_path_length(
                      dg, 1, cutoff=3).items() if 1 <= d <= 3)
    assert sorted(map(tuple, out.to_pandas().itertuples(index=False))) \
        == want
    # pushdown composes with a later prop read of the same variable
    out2 = g.query(
        "MATCH (a:Person)-[:KNOWS]->(b:Person) WHERE a.age > 28 "
        "RETURN a.age AS age, b.name AS bn")
    m = KNOWS.merge(PERSONS, left_on="src", right_on="vid").merge(
        PERSONS, left_on="dst", right_on="vid", suffixes=("_a", "_b"))
    m = m[m["age_a"] > 28]
    assert _rows(out2) == sorted(zip(m["age_a"], m["name_b"]))


def test_collect_aggregate(g):
    out = g.query(
        "MATCH (a:Person)-[:KNOWS]->(b:Person) "
        "WHERE a.name = 'ann' RETURN collect(b.name) AS friends")
    vals = out.to_pandas()["friends"].iloc[0]
    assert sorted(vals) == ["bob", "cal"]


def test_global_aggregate_over_empty_stream(g):
    """Cypher: a keyless aggregate over zero rows returns exactly ONE
    identity row (count/sum → 0, collect → [], min → null) — found by
    the wide-seed fuzz stress (a WHERE that filters every binding)."""
    out = g.query("MATCH (a:Person)-[e:KNOWS]->(b) WHERE a.age > 999 "
                  "RETURN count(*) AS n, sum(e.since) AS s, "
                  "min(e.since) AS m, collect(b) AS c").to_pandas()
    assert len(out) == 1
    assert out["n"].iloc[0] == 0 and out["s"].iloc[0] == 0
    assert pd.isna(out["m"].iloc[0])
    assert list(out["c"].iloc[0]) == []
