"""Path-family algorithms: DFS, simple-path predicates/enumeration,
seeded path sampling.

Reference semantics:
- DFS preorder/parent via sequential token walk
  (``analytical_engine/apps/dfs/dfs.h:227`` — the reference is equally
  serial: one token advances vertex-by-vertex over MPI). Ours is a
  deterministic min-vid-first preorder executed in one worker task over
  the pool's edge arrays; inherently anti-parallel (SURVEY §2.2 marks
  it so), documented scale boundary: the walk state is O(V+E) in one
  worker.
- ``is_simple_path`` (``apps/simple_path/is_simple_path.h:103``):
  nodes all distinct and consecutive pairs are edges.
- ``all_simple_paths`` (``apps/simple_path/all_simple_paths.h:279``):
  bounded-depth enumeration — iterated joins of the frontier path set
  against the edge table (networkx cutoff semantics: paths with at
  most ``cutoff`` edges).
- ``sampling_path`` (``apps/sampling_path/sampling_path.h:142``):
  paths of exactly ``length`` edges from a root, sampled
  deterministically by a seeded hash — iterated joins with a
  per-(path, level) pick.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.functions.hashing import hash64_any


def _arc_table(edges: ray.data.Dataset, directed: bool) -> ray.data.Dataset:
    """(src, dst) arc view; undirected edges contribute both arcs."""
    cols = ["src", "dst"]

    def both(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.concat_arrays([t.column("src").combine_chunks(),
                                     t.column("dst").combine_chunks()]),
            "dst": pa.concat_arrays([t.column("dst").combine_chunks(),
                                     t.column("src").combine_chunks()]),
        })

    ds = edges.select_columns(cols)
    if not directed:
        ds = ds.map_batches(both, batch_format="pyarrow")
    return ds


@ray.remote
def _dfs_walk(source: int, *tables: pa.Table) -> pa.Table:
    """Iterative DFS from ``source`` with min-vid-first neighbor order:
    returns (vid, rank, parent) for visited vertices, rank = preorder
    index. Runs in ONE task (DFS is a serial token walk in the
    reference too, dfs.h:227)."""
    # zero-row blocks from upstream bucketed unions can carry an EMPTY
    # schema (no 'src'/'dst' fields) — drop them before gathering
    from graphscope_ray.stages.relational import typed_blocks
    tables = typed_blocks(tables, "src")
    if not tables:
        return pa.table({
            "vid": pa.array([int(source)], pa.int64()),
            "rank": pa.array([0], pa.int64()),
            "parent": pa.array([-1], pa.int64()),
        })
    src = np.concatenate([t.column("src").to_numpy(zero_copy_only=False)
                          for t in tables]).astype(np.int64)
    dst = np.concatenate([t.column("dst").to_numpy(zero_copy_only=False)
                          for t in tables]).astype(np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    verts = np.unique(np.concatenate([src, dst, [source]]))
    indptr = np.searchsorted(src, verts)
    indptr = np.append(indptr, len(src))
    n = len(verts)
    visited = np.zeros(n, dtype=bool)
    rank = np.full(n, -1, dtype=np.int64)
    parent = np.full(n, -1, dtype=np.int64)
    pos0 = int(np.searchsorted(verts, source))
    # explicit stack of (vertex_pos, next_edge_cursor)
    stack = [[pos0, int(indptr[pos0])]]
    visited[pos0] = True
    rank[pos0] = 0
    r = 1
    while stack:
        top = stack[-1]
        vpos, cur = top
        advanced = False
        while cur < indptr[vpos + 1]:
            npos = int(np.searchsorted(verts, dst[cur]))
            cur += 1
            if not visited[npos]:
                visited[npos] = True
                rank[npos] = r
                parent[npos] = verts[vpos]
                r += 1
                top[1] = cur
                stack.append([npos, int(indptr[npos])])
                advanced = True
                break
        if not advanced:
            stack.pop()
    hit = visited
    return pa.table({
        "vid": pa.array(verts[hit], pa.int64()),
        "rank": pa.array(rank[hit], pa.int64()),
        "parent": pa.array(parent[hit], pa.int64()),
    })


def dfs(edges: ray.data.Dataset, source: int, directed: bool = True
        ) -> ray.data.Dataset:
    """DFS preorder rank + parent from ``source`` (deterministic
    min-vid-first order). The walk itself runs in one remote task; the
    edge gather streams object-store refs, never the driver."""
    arcs = _arc_table(edges, directed)
    refs = arcs.to_arrow_refs()
    return ray.data.from_arrow_refs([_dfs_walk.remote(source, *refs)])


def is_simple_path(edges: ray.data.Dataset, nodes: list[int],
                   directed: bool = False) -> bool:
    """True iff ``nodes`` are pairwise distinct and every consecutive
    pair is an edge (nx.is_simple_path; is_simple_path.h:103). The
    pair set is broadcast and counted against the streamed edge table."""
    nodes = [int(v) for v in nodes]
    if len(nodes) == 0:
        return False
    if len(set(nodes)) != len(nodes):
        return False
    if len(nodes) == 1:
        # single node: must exist in the graph (nx semantics)
        ref = ray.put(np.asarray(nodes, dtype=np.int64))

        def seen(t: pa.Table) -> pa.Table:
            k = ray.get(ref)
            hit = (np.isin(t.column("src").to_numpy(zero_copy_only=False), k)
                   | np.isin(t.column("dst").to_numpy(zero_copy_only=False), k))
            return pa.table({"n": pa.array([int(hit.sum())], pa.int64())})

        tot = sum(b["n"].sum() for b in edges.map_batches(
            seen, batch_format="pyarrow").iter_batches(batch_format="pandas"))
        return bool(tot > 0)
    pairs = pd.DataFrame({
        "src": np.asarray(nodes[:-1], dtype=np.int64),
        "dst": np.asarray(nodes[1:], dtype=np.int64),
        "idx": np.arange(len(nodes) - 1, dtype=np.int64),
    })
    ref = ray.put(pairs)

    def count(b: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(ref)
        hit = b[["src", "dst"]].astype(np.int64).merge(p, on=["src", "dst"])
        return pd.DataFrame(
            {"idx": pd.Series(hit["idx"].unique(), dtype=np.int64)}
        )

    arcs = _arc_table(edges, directed)
    found = arcs.map_batches(count, batch_format="pandas").to_pandas()
    if "idx" not in found.columns:
        return False
    return found["idx"].nunique() == len(pairs)


def _tagged_union(paths: ray.data.Dataset, arcs: ray.data.Dataset,
                  walk_col: bool) -> ray.data.Dataset:
    """Unify the path table (key=last vertex) and the arc table
    (key=src) into one schema for a bucketed co-group — Ray 2.49's
    hash-shuffle join rejects the near-empty partitions a one-row
    frontier produces, so the expansion shuffles through
    ``bucketed_group_apply`` instead."""

    def tag_paths(t: pa.Table) -> pa.Table:
        cols = {"key": t.column("last"),
                "dst": pa.nulls(t.num_rows, pa.int64()),
                "path": t.column("path"),
                "side": pa.array(np.ones(t.num_rows, np.int8))}
        if walk_col:
            cols["walk"] = t.column("walk")
        return pa.table(cols)

    def tag_arcs(t: pa.Table) -> pa.Table:
        cols = {"key": t.column("src").cast(pa.int64()),
                "dst": t.column("dst").cast(pa.int64()),
                "path": pa.nulls(t.num_rows, pa.string()),
                "side": pa.array(np.zeros(t.num_rows, np.int8))}
        if walk_col:
            cols["walk"] = pa.nulls(t.num_rows, pa.int64())
        return pa.table(cols)

    return (paths.map_batches(tag_paths, batch_format="pyarrow")
            .union(arcs.map_batches(tag_arcs, batch_format="pyarrow")))


def _extend_paths(frontier: ray.data.Dataset, arcs: ray.data.Dataset
                  ) -> ray.data.Dataset:
    """One expansion level: co-group paths (by last vertex) with arcs
    (by src), emit extended paths, dropping revisits (simple-path
    constraint)."""
    from graphscope_ray.stages.relational import bucketed_group_apply

    def step(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["side"] == 1][["key", "path"]]
        a = g[g["side"] == 0][["key", "dst"]]
        b = p.merge(a, on="key")
        if len(b):
            nxt = b["dst"].astype(np.int64)
            token = "-" + nxt.astype(str) + "-"
            wrapped = "-" + b["path"] + "-"
            keep = ~np.array([t in w for t, w in zip(token, wrapped)])
            # the containment zip is per candidate row — bounded by the
            # frontier fan-out, not the graph
            b = b[keep]
            path = (b["path"] + "-" + b["dst"].astype(np.int64).astype(str))
            last = b["dst"].to_numpy(np.int64)
        else:
            path, last = pd.Series([], dtype=str), np.empty(0, np.int64)
        return pd.DataFrame({"path": path, "last": last})

    return bucketed_group_apply(
        _tagged_union(frontier, arcs, walk_col=False), ["key"], step,
        num_buckets=16,
    )


def all_simple_paths(edges: ray.data.Dataset, source: int, target: int,
                     cutoff: int, directed: bool = False) -> ray.data.Dataset:
    """Every simple path source→target with ≤ ``cutoff`` edges, as rows
    (path) with '-'-joined vids (all_simple_paths.h:279, networkx
    cutoff semantics). Iterated joins; the frontier is a Dataset, so
    enumeration streams (exponential outputs are the caller's choice
    of cutoff)."""
    arcs = _arc_table(edges, directed)
    frontier = ray.data.from_pandas(pd.DataFrame(
        {"path": [str(int(source))], "last": np.asarray([source], np.int64)}
    )).map_batches(lambda t: t.replace_schema_metadata(None),
                   batch_format="pyarrow")
    done = []
    for _ in range(cutoff):
        frontier = _extend_paths(frontier, arcs).materialize()

        def hits(t: pa.Table, tgt=int(target)) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.equal(t.column("last"), tgt)).select(["path"])

        def rest(t: pa.Table, tgt=int(target)) -> pa.Table:
            import pyarrow.compute as pc

            # a completed path can't extend and stay simple (it would
            # revisit the target), so it leaves the frontier
            return t.filter(pc.not_equal(t.column("last"), tgt))

        done.append(frontier.map_batches(hits, batch_format="pyarrow"))
        frontier = frontier.map_batches(rest, batch_format="pyarrow"
                                        ).materialize()
        if frontier.count() == 0:
            break
    out = done[0]
    for d in done[1:]:
        out = out.union(d)
    return out


def sampling_path(edges: ray.data.Dataset, source: int, length: int,
                  num_paths: int = 10, seed: int = 42,
                  directed: bool = True) -> ray.data.Dataset:
    """``num_paths`` walks of exactly ``length`` edges from ``source``
    (sampling_path.h:142). The neighbor pick at each level is a seeded
    hash over (walk id, level, candidate) — deterministic, no RNG
    state, so re-runs and retries sample identical paths."""
    arcs = _arc_table(edges, directed)
    frontier = ray.data.from_pandas(pd.DataFrame({
        "walk": np.arange(num_paths, dtype=np.int64),
        "path": [str(int(source))] * num_paths,
        "last": np.full(num_paths, source, dtype=np.int64),
    })).map_batches(lambda t: t.replace_schema_metadata(None),
                    batch_format="pyarrow")
    from graphscope_ray.stages.relational import bucketed_group_apply

    for level in range(length):
        def pick(g: pd.DataFrame, lvl=level) -> pd.DataFrame:
            p = g[g["side"] == 1][["key", "path", "walk"]]
            a = g[g["side"] == 0][["key", "dst"]]
            b = p.merge(a, on="key")
            if not len(b):
                return pd.DataFrame({
                    "walk": pd.Series([], dtype=np.int64),
                    "path": pd.Series([], dtype=str),
                    "last": pd.Series([], dtype=np.int64)})
            with np.errstate(over="ignore"):
                h = (hash64_any(b["walk"].to_numpy(np.int64)
                                * np.int64(1000003) + np.int64(lvl))
                     ^ hash64_any(b["dst"].to_numpy(np.int64) + np.int64(seed)))
            b = b.assign(_h=h)
            b = b.sort_values(["walk", "_h", "dst"], kind="mergesort")
            b = b.drop_duplicates("walk", keep="first")
            return pd.DataFrame({
                "walk": b["walk"].to_numpy(np.int64),
                "path": b["path"] + "-" + b["dst"].astype(np.int64).astype(str),
                "last": b["dst"].to_numpy(np.int64),
            })

        # co-locate walks with their last vertex's out-arcs: bucket by
        # vertex (the pick is per walk, done inside the group frame)
        frontier = bucketed_group_apply(
            _tagged_union(frontier, arcs, walk_col=True), ["key"], pick,
            num_buckets=16,
        ).materialize()
        if frontier.count() == 0:
            break
    return frontier.select_columns(["walk", "path"])
