"""DeepWalk / node2vec random-walk corpus generation.

The reference's learning engine feeds GNN/embedding training from
sampled walks over the property graph (GLE sampling surface; the
analytical engine's seeded-walk precedent is
``apps/sampling_path/sampling_path.h:142``). This module generates the
classic skip-gram walk corpus distributedly:

- **DeepWalk** (p = q = 1): uniform next-hop, one bucketed co-group
  shuffle per level (walks co-located with their current vertex's
  out-arcs), pick by seeded hash — deterministic, partition-invariant,
  no RNG state to ship.
- **node2vec** (Grover & Leskovec 2016): the 2nd-order bias needs, for
  every candidate x of a walk at (prev -> cur), whether (prev, x) is an
  edge. That membership test is itself distributed — a second bucketed
  co-group keyed (prev, x) against the arc table — so no worker ever
  holds a global adjacency set. Weighted sampling without replacement
  is the deterministic exponential race: r = -log(u)/w with u a seeded
  hash uniform; the min-r candidate wins (ties by candidate id).

Every pick is a pure function of (walk id, level, candidate, seed), so
re-runs, retries and any partitioning produce identical walks — pinned
replica-exact against a sequential pure-python oracle in
``tests/test_walks.py``.

Scale notes: per level the shuffle volume is O(frontier x avg-degree)
candidate rows (int64s + the growing path string); node2vec adds one
more co-group of the same volume against the arcs. Walks that hit a
dead end (directed sinks) finish early and are carried to the output
with their shorter path, matching node2vec's reference implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.functions.hashing import (
    walk_ids as _walk_ids,
    walk_race_keys as _race_keys,
)
from graphscope_ray.pipelines.paths import _arc_table
from graphscope_ray.stages.relational import bucketed_group_apply


def _empty_frontier() -> pd.DataFrame:
    return pd.DataFrame({
        "walk": pd.Series([], dtype=np.int64),
        "path": pd.Series([], dtype=str),
        "prev": pd.Series([], dtype=np.int64),
        "last": pd.Series([], dtype=np.int64),
        "done": pd.Series([], dtype=np.int8),
    })


def _schema_clean(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None)


def _finish_walks(t: pa.Table) -> pa.Table:
    """(walk, path) → (walk, start, path). The start vertex is the
    path's first token — the walk id is an opaque collision-resistant
    hash of (start vid, replica) (``hashing.walk_ids``), never
    decodable by division."""
    paths = t.column("path").to_numpy(zero_copy_only=False)
    start = np.fromiter(
        (int(p.split(",", 1)[0]) for p in paths), np.int64, len(paths))
    return pa.table({
        "walk": t.column("walk").cast(pa.int64()),
        "start": pa.array(start),
        "path": t.column("path"),
    })


def _warc_table(edges: ray.data.Dataset, directed: bool,
                weight_col: str | None) -> ray.data.Dataset:
    """(src, dst, w) arc view; undirected edges contribute both arcs.
    w = 1.0 when unweighted. Weights must be > 0 (exponential race)."""
    if weight_col is None:
        def ones(t: pa.Table) -> pa.Table:
            return t.append_column(
                "w", pa.array(np.ones(t.num_rows, np.float64)))
        return (_arc_table(edges, directed)
                .map_batches(ones, batch_format="pyarrow"))

    def norm(t: pa.Table) -> pa.Table:
        s = t.column("src").cast(pa.int64()).combine_chunks()
        d = t.column("dst").cast(pa.int64()).combine_chunks()
        w = t.column(weight_col).cast(pa.float64()).combine_chunks()
        if not directed:
            s, d, w = (pa.concat_arrays([s, d]), pa.concat_arrays([d, s]),
                       pa.concat_arrays([w, w]))
        return pa.table({"src": s, "dst": d, "w": w})

    return (edges.select_columns(["src", "dst", weight_col])
            .map_batches(norm, batch_format="pyarrow"))


def random_walks(
    edges: ray.data.Dataset,
    walk_length: int,
    num_walks: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    directed: bool = False,
    starts: ray.data.Dataset | None = None,
    num_buckets: int = 16,
    weight_col: str | None = None,
) -> ray.data.Dataset:
    """``num_walks`` walks of up to ``walk_length`` edges from every
    start vertex (default: every endpoint in the edge table), with
    node2vec return/in-out parameters ``p``/``q`` (1, 1 = DeepWalk).
    With ``weight_col``, the pick probability is edge-weight × the
    node2vec factor (node2vec's weighted-graph semantics); weights must
    be positive, and parallel arcs to one candidate race with their
    maximum weight (each arc row draws the same uniform, so the largest
    weight yields the winning race key).

    Returns ``(walk, start, path)`` — walk id a collision-resistant
    64-bit hash of (start vid, replica index) (``hashing.walk_ids``),
    path a ","-joined vid string. Walks stopping at a dead end keep
    their shorter path.
    """
    if walk_length < 0:
        raise ValueError("walk_length must be >= 0")
    # static across levels: materialize ONCE (otherwise the read +
    # both-arcs expansion re-executes 1-3x per level)
    arcs = _warc_table(edges, directed, weight_col).map_batches(
        _schema_clean, batch_format="pyarrow").materialize()
    if starts is None:
        def endpoints(t: pa.Table) -> pa.Table:
            v = np.unique(np.concatenate([
                t.column("src").to_numpy(zero_copy_only=False),
                t.column("dst").to_numpy(zero_copy_only=False)]))
            return pa.table({"vid": v.astype(np.int64)})
        starts = (edges.select_columns(["src", "dst"])
                  .map_batches(endpoints, batch_format="pyarrow")
                  .groupby("vid").map_groups(
                      lambda g: g.head(1), batch_format="pandas"))

    def seed_walks(t: pa.Table) -> pa.Table:
        v = t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.repeat(v, num_walks)
        rep = np.tile(np.arange(num_walks, dtype=np.int64),
                      t.num_rows)
        wid = _walk_ids(v, rep)
        return pa.table({
            "walk": wid,
            "path": pa.array([str(int(x)) for x in v], pa.string()),
            "prev": pa.array(np.full(len(v), -1, np.int64)),
            "last": pa.array(v),
            "done": pa.array(np.zeros(len(v), np.int8)),
        })

    frontier = starts.map_batches(seed_walks, batch_format="pyarrow")
    finished: list[ray.data.Dataset] = []
    biased = not (p == 1.0 and q == 1.0)

    for level in range(walk_length):
        # ---- phase A: candidates = frontier co-grouped with out-arcs
        def tag_front(t: pa.Table) -> pa.Table:
            return pa.table({
                "key": t.column("last"),
                "dst": pa.array(np.zeros(t.num_rows, np.int64)),
                "w": pa.array(np.ones(t.num_rows, np.float64)),
                "walk": t.column("walk"),
                "path": t.column("path"),
                "prev": t.column("prev"),
                "side": pa.array(np.ones(t.num_rows, np.int8)),
            })

        def tag_arcs(t: pa.Table) -> pa.Table:
            return pa.table({
                "key": t.column("src").cast(pa.int64()),
                "dst": t.column("dst").cast(pa.int64()),
                "w": t.column("w"),
                "walk": pa.array(np.zeros(t.num_rows, np.int64)),
                "path": pa.nulls(t.num_rows, pa.string()),
                "prev": pa.array(np.zeros(t.num_rows, np.int64)),
                "side": pa.array(np.zeros(t.num_rows, np.int8)),
            })

        tagged = (frontier.map_batches(tag_front, batch_format="pyarrow")
                  .union(arcs.map_batches(tag_arcs,
                                          batch_format="pyarrow")))

        if not biased:
            # uniform pick fused into the expansion co-group: ONE
            # shuffle per level, like sampling_path
            def pick_uniform(g: pd.DataFrame, lvl=level) -> pd.DataFrame:
                f = g[g["side"] == 1][["key", "walk", "path", "prev"]]
                a = g[g["side"] == 0][["key", "dst", "w"]]
                if not len(f):
                    return _empty_frontier()
                b = f.merge(a, on="key")
                out = []
                if len(b):
                    w = b["w"].to_numpy(np.float64)
                    r = _race_keys(b["walk"].to_numpy(np.int64), lvl,
                                   b["dst"].to_numpy(np.int64), w, seed)
                    b = b.assign(_r=r).sort_values(
                        ["walk", "_r", "dst"], kind="mergesort")
                    b = b.drop_duplicates("walk", keep="first")
                    out.append(pd.DataFrame({
                        "walk": b["walk"].to_numpy(np.int64),
                        "path": (b["path"] + ","
                                 + b["dst"].astype(np.int64).astype(str)),
                        "prev": b["key"].to_numpy(np.int64),
                        "last": b["dst"].to_numpy(np.int64),
                        "done": np.zeros(len(b), np.int8),
                    }))
                dead = f[~f["walk"].isin(
                    b["walk"] if len(b) else [])]
                if len(dead):
                    out.append(pd.DataFrame({
                        "walk": dead["walk"].to_numpy(np.int64),
                        "path": dead["path"].astype(str),
                        "prev": dead["prev"].to_numpy(np.int64),
                        "last": dead["key"].to_numpy(np.int64),
                        "done": np.ones(len(dead), np.int8),
                    }))
                return (pd.concat(out, ignore_index=True)
                        if out else _empty_frontier())

            stepped = bucketed_group_apply(tagged, ["key"], pick_uniform,
                                           num_buckets=num_buckets)
        else:
            # expansion first (no pick yet): all candidates survive
            def expand(g: pd.DataFrame) -> pd.DataFrame:
                f = g[g["side"] == 1][["key", "walk", "path", "prev"]]
                a = g[g["side"] == 0][["key", "dst", "w"]]
                if not len(f):
                    return pd.DataFrame({
                        "walk": pd.Series([], dtype=np.int64),
                        "path": pd.Series([], dtype=str),
                        "prev": pd.Series([], dtype=np.int64),
                        "cur": pd.Series([], dtype=np.int64),
                        "cand": pd.Series([], dtype=np.int64),
                        "w": pd.Series([], dtype=np.float64),
                        "dead": pd.Series([], dtype=np.int8)})
                # inner merge keeps int64 exact (a left-merge's NaN
                # would float64-round vids above 2^53); dead walks are
                # the anti-set
                b = f.merge(a, on="key")
                dead = f[~f["walk"].isin(b["walk"])]
                return pd.concat([
                    pd.DataFrame({
                        "walk": b["walk"].to_numpy(np.int64),
                        "path": b["path"].astype(str),
                        "prev": b["prev"].to_numpy(np.int64),
                        "cur": b["key"].to_numpy(np.int64),
                        "cand": b["dst"].to_numpy(np.int64),
                        "w": b["w"].to_numpy(np.float64),
                        "dead": np.zeros(len(b), np.int8),
                    }),
                    pd.DataFrame({
                        "walk": dead["walk"].to_numpy(np.int64),
                        "path": dead["path"].astype(str),
                        "prev": dead["prev"].to_numpy(np.int64),
                        "cur": dead["key"].to_numpy(np.int64),
                        "cand": np.full(len(dead), -1, np.int64),
                        "w": np.ones(len(dead), np.float64),
                        "dead": np.ones(len(dead), np.int8),
                    }),
                ], ignore_index=True)

            cands = bucketed_group_apply(tagged, ["key"], expand,
                                         num_buckets=num_buckets)

            # ---- phase B: mark (prev, cand) edge membership by a
            # second co-group against the arc table (no global set)
            def tag_cand(t: pa.Table) -> pa.Table:
                return pa.table({
                    "k1": t.column("prev"),
                    "k2": t.column("cand"),
                    "walk": t.column("walk"),
                    "path": t.column("path"),
                    "cur": t.column("cur"),
                    "w": t.column("w"),
                    "dead": t.column("dead"),
                    "side": pa.array(np.ones(t.num_rows, np.int8)),
                })

            def tag_arcs2(t: pa.Table) -> pa.Table:
                return pa.table({
                    "k1": t.column("src").cast(pa.int64()),
                    "k2": t.column("dst").cast(pa.int64()),
                    "walk": pa.array(np.zeros(t.num_rows, np.int64)),
                    "path": pa.nulls(t.num_rows, pa.string()),
                    "cur": pa.array(np.zeros(t.num_rows, np.int64)),
                    "w": pa.array(np.ones(t.num_rows, np.float64)),
                    "dead": pa.array(np.zeros(t.num_rows, np.int8)),
                    "side": pa.array(np.zeros(t.num_rows, np.int8)),
                })

            tagged2 = (cands.map_batches(tag_cand, batch_format="pyarrow")
                       .union(arcs.map_batches(tag_arcs2,
                                               batch_format="pyarrow")))

            def mark(g: pd.DataFrame) -> pd.DataFrame:
                c = g[g["side"] == 1]
                if not len(c):
                    return pd.DataFrame({
                        "walk": pd.Series([], dtype=np.int64),
                        "path": pd.Series([], dtype=str),
                        "prev": pd.Series([], dtype=np.int64),
                        "cur": pd.Series([], dtype=np.int64),
                        "cand": pd.Series([], dtype=np.int64),
                        "w": pd.Series([], dtype=np.float64),
                        "dead": pd.Series([], dtype=np.int8),
                        "is_edge": pd.Series([], dtype=np.int8)})
                a = g[g["side"] == 0][["k1", "k2"]].drop_duplicates()
                a = a.assign(is_edge=np.int8(1))
                b = c.merge(a, on=["k1", "k2"], how="left")
                return pd.DataFrame({
                    "walk": b["walk"].to_numpy(np.int64),
                    "path": b["path"].astype(str),
                    "prev": b["k1"].to_numpy(np.int64),
                    "cur": b["cur"].to_numpy(np.int64),
                    "cand": b["k2"].to_numpy(np.int64),
                    "w": b["w"].to_numpy(np.float64),
                    "dead": b["dead"].to_numpy(np.int8),
                    "is_edge": b["is_edge"].fillna(0).to_numpy(np.int8),
                })

            marked = bucketed_group_apply(tagged2, ["k1", "k2"], mark,
                                          num_buckets=num_buckets)

            # ---- phase C: per-walk weighted pick (third co-group)
            def pick_biased(g: pd.DataFrame, lvl=level) -> pd.DataFrame:
                g = g[g["walk"].notna()]
                if not len(g):
                    return _empty_frontier()
                dead = g[g["dead"] == 1]
                live = g[g["dead"] == 0]
                out = []
                if len(live):
                    cand = live["cand"].to_numpy(np.int64)
                    prev = live["prev"].to_numpy(np.int64)
                    first = prev < 0  # level 0: uniform by contract
                    bias = np.where(
                        first, 1.0,
                        np.where(cand == prev, 1.0 / p,
                                 np.where(live["is_edge"].to_numpy(
                                     np.int8) == 1, 1.0, 1.0 / q)))
                    w = bias * live["w"].to_numpy(np.float64)
                    r = _race_keys(live["walk"].to_numpy(np.int64), lvl,
                                   cand, w, seed)
                    b = live.assign(_r=r).sort_values(
                        ["walk", "_r", "cand"], kind="mergesort")
                    b = b.drop_duplicates("walk", keep="first")
                    out.append(pd.DataFrame({
                        "walk": b["walk"].to_numpy(np.int64),
                        "path": (b["path"] + ","
                                 + b["cand"].astype(np.int64).astype(str)),
                        "prev": b["cur"].to_numpy(np.int64),
                        "last": b["cand"].to_numpy(np.int64),
                        "done": np.zeros(len(b), np.int8),
                    }))
                if len(dead):
                    out.append(pd.DataFrame({
                        "walk": dead["walk"].to_numpy(np.int64),
                        "path": dead["path"].astype(str),
                        "prev": dead["prev"].to_numpy(np.int64),
                        "last": dead["cur"].to_numpy(np.int64),
                        "done": np.ones(len(dead), np.int8),
                    }))
                return (pd.concat(out, ignore_index=True)
                        if out else _empty_frontier())

            stepped = bucketed_group_apply(marked, ["walk"], pick_biased,
                                           num_buckets=num_buckets)

        stepped = stepped.materialize()

        def split(flag):
            def f(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                return t.filter(pc.equal(t.column("done"), flag))
            return f

        done = stepped.map_batches(split(1),
                                   batch_format="pyarrow").materialize()
        if done.count():
            finished.append(done)
        frontier = stepped.map_batches(split(0),
                                       batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break

    parts = finished + [frontier]
    out = parts[0]
    for d in parts[1:]:
        out = out.union(d)

    return out.map_batches(_finish_walks, batch_format="pyarrow")


def reference_random_walks(edge_pairs, walk_length, num_walks=1,
                           p=1.0, q=1.0, seed=42, directed=False,
                           starts=None) -> dict[int, list[int]]:
    """Sequential oracle implementing the identical deterministic pick
    (same hash, same race) — the distributed result must match EXACTLY
    at any partitioning. ``edge_pairs`` rows are (u, v) or (u, v, w);
    parallel arcs to one candidate race with their max weight, like the
    engine."""
    adj: dict[int, dict[int, float]] = {}

    def arc(u, v, w):
        d = adj.setdefault(int(u), {})
        d[int(v)] = max(w, d.get(int(v), 0.0))

    for row in edge_pairs:
        u, v = row[0], row[1]
        w = float(row[2]) if len(row) > 2 else 1.0
        arc(u, v, w)
        if not directed:
            arc(v, u, w)
    if starts is None:
        starts = sorted({x for row in edge_pairs for x in row[:2]})
    out = {}
    for s in starts:
        for i in range(num_walks):
            wid = int(_walk_ids(np.array([s], np.int64),
                                np.array([i], np.int64))[0])
            path = [int(s)]
            prev = -1
            for lvl in range(walk_length):
                cur = path[-1]
                nbrs = adj.get(cur, {})
                if not nbrs:
                    break
                best, best_r = None, None
                for c in sorted(nbrs):
                    if prev < 0:
                        bias = 1.0
                    elif c == prev:
                        bias = 1.0 / p
                    elif c in adj.get(prev, {}):
                        bias = 1.0
                    else:
                        bias = 1.0 / q
                    r = float(_race_keys(
                        np.array([wid], np.int64), lvl,
                        np.array([c], np.int64),
                        np.array([bias * nbrs[c]], np.float64), seed)[0])
                    if best is None or (r, c) < (best_r, best):
                        best, best_r = c, r
                prev = cur
                path.append(best)
            out[wid] = path
    return out


def random_walks_pool(
    graph,
    walk_length: int,
    num_walks: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    starts: np.ndarray | None = None,
    use_weights: bool = False,
) -> ray.data.Dataset:
    """Random walks on a sealed ``ShardedGraph`` pool — the scale path.

    Same picks (and therefore IDENTICAL walks) as :func:`random_walks`
    via the shared ``walk_race_keys`` kernel, but the arc table stays
    RESIDENT in the shard actors: per level only the frontier
    (O(#walks) rows) moves shard→shard through the object store —
    one actor wave per level for DeepWalk, three for node2vec
    (expand → membership-mark at owner(prev) → per-walk pick), versus
    the Dataset engine's per-level re-shuffle of the whole arc table.
    Starts default to every pool vertex (including isolated vertices,
    whose walks are the single-vertex path). Directedness and weights
    are the pool's own (``build_graph(directed=..., weight...)``).

    Returns the same ``(walk, start, path)`` Dataset schema.
    """
    shards, P = graph.shards, graph.P
    if starts is None:
        ray.get([s.walk_seed.remote(num_walks, None, use_weights)
                 for s in shards])
    else:
        from graphscope_ray.functions.hashing import partition_of

        sv = np.unique(np.asarray(starts, np.int64))
        owner = partition_of(sv, P)
        ray.get([s.walk_seed.remote(num_walks, sv[owner == f],
                                     use_weights)
                 for f, s in enumerate(shards)])
    biased = not (p == 1.0 and q == 1.0)

    for level in range(walk_length):
        if not biased:
            refs = graph.scatter_refs("walk_step_uniform", level, seed)
        else:
            ex = graph.scatter_refs("walk_expand_biased")
            mk = [shards[d].walk_mark.options(
                      num_returns=P if P > 1 else 1).remote(
                      *[ex[src][d] for src in range(P)])
                  for d in range(P)]
            mk = [m if P > 1 else [m] for m in mk]
            refs = [shards[d].walk_pick_biased.options(
                        num_returns=P if P > 1 else 1).remote(
                        level, seed, p, q,
                        *[mk[src][d] for src in range(P)])
                    for d in range(P)]
            refs = [r if P > 1 else [r] for r in refs]
        live = ray.get([
            s.walk_ingest.remote(*[refs[src][d] for src in range(P)])
            for d, s in enumerate(shards)
        ])
        if sum(live) == 0:
            break

    out = ray.data.from_arrow_refs(
        [s.walk_collect.remote() for s in shards])
    return out.map_batches(_finish_walks, batch_format="pyarrow")
