"""Neighbor sampling for graph-learning data prep (GraphSAGE-style
k-hop fanout sampling — the data-side primitive of the reference's GLE
subsystem, re-expressed as Dataset operators; the GLE runtime itself
stays out of scope per SURVEY §7.5).

Sampling is DETERMINISTIC: each adjacency row ranks by
``hash64(src, dst, seed)`` and every source keeps its ``fanout``
smallest ranks — re-runs, re-partitionings and resumed jobs sample the
identical subgraph (the same seeded-hash policy as
``paths.sampling_path``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.functions.hashing import hash64_ints, splitmix64


def neighbor_sample(
    edges: ray.data.Dataset,
    seeds,
    fanouts: list[int],
    seed: int = 42,
    directed: bool = True,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Sample a k-hop neighborhood: hop i keeps ≤ ``fanouts[i]``
    deterministic neighbors per frontier vertex. Returns a Dataset of
    sampled arcs ``(hop, src, dst)``; the hop-i frontier is the distinct
    dst set of hop i-1. Undirected mode samples over both arc
    directions. One bucketed co-group per hop (frontier rows ride the
    same shuffle as the adjacency — no driver-side neighbor lists)."""
    from graphscope_ray.stages.relational import bucketed_group_apply

    def arcs_table(t: pa.Table) -> pa.Table:
        s = t.column("src").cast(pa.int64())
        d = t.column("dst").cast(pa.int64())
        if not directed:
            s, d = (pa.concat_arrays([s.combine_chunks(),
                                      d.combine_chunks()]),
                    pa.concat_arrays([d.combine_chunks(),
                                      s.combine_chunks()]))
        return pa.table({"src": s, "dst": d,
                         "_f": pa.nulls(len(s), pa.int8())})

    adj = edges.map_batches(arcs_table, batch_format="pyarrow"
                            ).materialize()
    frontier = np.unique(np.asarray(list(seeds), dtype=np.int64))
    out_parts = []
    for hop, fanout in enumerate(fanouts):
        fr = ray.data.from_arrow(pa.table({
            "src": pa.array(frontier, pa.int64()),
            "dst": pa.nulls(len(frontier), pa.int64()),
            "_f": pa.array(np.ones(len(frontier), np.int8)),
        }))

        def pick(g: pd.DataFrame, fanout=fanout) -> pd.DataFrame:
            want = set(g.loc[g["_f"] == 1, "src"])
            cand = g[g["_f"].isna() & g["src"].isin(want)]
            if cand.empty:
                return pd.DataFrame({"src": np.empty(0, np.int64),
                                     "dst": np.empty(0, np.int64)})
            cand = cand.drop_duplicates(["src", "dst"])
            with np.errstate(over="ignore"):
                r = splitmix64(
                    hash64_ints(cand["src"].to_numpy(np.int64))
                    ^ hash64_ints(cand["dst"].to_numpy(np.int64) + 7)
                    ^ np.uint64(seed))
            cand = cand.assign(_r=r).sort_values(
                ["src", "_r"], kind="mergesort")
            keep = cand.groupby("src", sort=False).head(fanout)
            return keep[["src", "dst"]].astype(np.int64)

        sampled = bucketed_group_apply(adj.union(fr), ["src"], pick,
                                       num_buckets=num_buckets
                                       ).materialize()

        def with_hop(t: pa.Table, hop=hop) -> pa.Table:
            return t.append_column(
                "hop", pa.array(np.full(t.num_rows, hop, np.int64)))

        out_parts.append(sampled.map_batches(with_hop,
                                             batch_format="pyarrow"))
        frontier = np.unique(np.concatenate([
            b["dst"].to_numpy(np.int64)
            for b in sampled.iter_batches(batch_format="pandas")
        ] or [np.empty(0, np.int64)]))
        if not len(frontier):
            break
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return out.select_columns(["hop", "src", "dst"])


# --------------------------------------------------------------------
# Corpus splitting / mixing / exact-k sampling (training-data prep).
#
# All three ops are keyed on a DETERMINISTIC per-row hash so re-runs,
# re-partitionings and resumed jobs produce the identical corpus — the
# property a 100-TB training-data job needs for reproducible splits.
# Two hash kernels, same convention as stages/dedup.MinHasherMD5:
#   hash_fn="md5"  — md5 lower-64 of "key:salt", bit-identical to
#                    DuckDB md5_number_lower(CAST(key AS VARCHAR) ||
#                    ':salt') so every op has an exact SQL twin;
#   hash_fn="fast" — splitmix64 over the int64 key (throughput path,
#                    no SQL twin).


def _key_hash_u64(keys: pd.Series, salt: str, hash_fn: str) -> np.ndarray:
    """uint64 hash per key under the chosen kernel (see module note)."""
    import hashlib

    if hash_fn == "fast":
        if pd.api.types.is_integer_dtype(keys):
            base = keys.to_numpy(np.int64).astype(np.uint64)
        else:
            from graphscope_ray.functions.hashing import hash64_strings
            base = hash64_strings(keys.astype(str).to_numpy(object)).astype(np.uint64)
        from graphscope_ray.functions.hashing import stable_u64_of_str
        return splitmix64(base ^ np.uint64(stable_u64_of_str(salt)))
    if hash_fn != "md5":
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    tail = f":{salt}".encode()
    return np.fromiter(
        (int.from_bytes(
            hashlib.md5(str(k).encode() + tail).digest()[8:], "little")
         for k in keys),
        dtype=np.uint64, count=len(keys))


def _split_edges(fractions: dict[str, float], mod: int) -> np.ndarray:
    cum, edges = 0.0, []
    for f in fractions.values():
        cum += f
        edges.append(int(cum * mod + 0.5))
    if abs(cum - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {cum}")
    edges[-1] = mod  # guarantee total coverage despite rounding
    return np.asarray(edges, dtype=np.uint64)


def hash_split(
    ds: ray.data.Dataset,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
    hash_fn: str = "md5",
    mod: int = 1_000_000,
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment: adds a ``split`` column
    naming the bin whose cumulative-fraction interval (at 1/mod
    resolution) contains ``hash(key, salt) % mod``. Embarrassingly
    parallel — no shuffle, no driver state; a row's split depends only
    on its own key. SQL twin: a CASE over
    ``md5_number_lower(CAST(key AS VARCHAR) || ':salt') % mod``."""
    names = np.asarray(list(fractions), dtype=object)
    edges = _split_edges(fractions, mod)

    def f(b: pd.DataFrame) -> pd.DataFrame:
        bucket = _key_hash_u64(b[key_col], salt, hash_fn) % np.uint64(mod)
        idx = np.searchsorted(edges, bucket, side="right")
        out = b.copy()
        out["split"] = names[idx]
        return out

    return ds.map_batches(f, batch_format="pandas")


def weighted_resample(
    ds: ray.data.Dataset,
    weights: dict[str, float],
    domain_col: str = "source",
    key_col: str = "doc_id",
    default_weight: float = 1.0,
    salt: str = "mix",
    hash_fn: str = "md5",
    mod: int = 1_000_000,
) -> ray.data.Dataset:
    """Domain mixing: every row of domain d appears
    ``floor(w_d) + Bernoulli(frac(w_d))`` times (deterministic per-key
    coin at 1/mod resolution), i.e. up-/down-sample each source to its
    mixture weight. Adds ``rep`` (0-based copy index); rows whose copy
    count is 0 are dropped. Embarrassingly parallel — the multiset a
    row contributes depends only on (key, domain). SQL twin:
    ``unnest(range(copies))`` over the same integer thresholds."""
    base_w = {d: int(w) for d, w in weights.items()}
    frac_w = {d: int(round((w - int(w)) * mod)) for d, w in weights.items()}
    d_base = int(default_weight)
    d_frac = int(round((default_weight - d_base) * mod))

    def f(b: pd.DataFrame) -> pd.DataFrame:
        dom = b[domain_col]
        base = dom.map(base_w).fillna(d_base).to_numpy(np.int64)
        thr = dom.map(frac_w).fillna(d_frac).to_numpy(np.uint64)
        bucket = _key_hash_u64(b[key_col], salt, hash_fn) % np.uint64(mod)
        copies = base + (bucket < thr)
        idx = np.repeat(np.arange(len(b)), copies)
        out = b.iloc[idx].reset_index(drop=True)
        out["rep"] = (np.arange(len(idx), dtype=np.int64)
                      - np.repeat(np.cumsum(copies) - copies, copies))
        return out

    return ds.map_batches(f, batch_format="pandas")


def hash_order_sample(
    ds: ray.data.Dataset,
    k: int,
    key_col: str = "doc_id",
    salt: str = "sample",
    hash_fn: str = "md5",
) -> ray.data.Dataset:
    """Exactly min(k, n) rows, chosen as the k globally smallest
    ``hash(key, salt)`` values (tie-broken by key) — a deterministic
    uniform sample with an exact size, the distributed stand-in for
    reservoir sampling. Each block first reduces to its own k smallest
    (partial top-k), so the final sort+limit sees ≤ k·num_blocks rows
    regardless of input size. SQL twin: ``ORDER BY
    md5_number_lower(...), key LIMIT k``."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = _key_hash_u64(b[key_col], salt, hash_fn)
        out = b.copy()
        out["_h"] = h
        out = out.sort_values(["_h", key_col], kind="stable").head(k)
        return out

    def drop_h(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop(columns=["_h"])

    from graphscope_ray.stages.relational import COALESCE_ROWS

    # batch_size coalesces tiny upstream blocks (and a fuller partial
    # batch cuts more rows) before the top-k sort shuffle
    out = (ds.map_batches(partial, batch_format="pandas",
                          batch_size=COALESCE_ROWS)
             .sort(["_h", key_col])
             .limit(k)
             .map_batches(drop_h, batch_format="pandas"))
    return out


def per_key_cap(
    ds: ray.data.Dataset,
    k: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "cap",
    hash_fn: str = "md5",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """At most ``k`` rows per group — the corpus-balancing quota op
    (cap any one domain/site/license at k documents), chosen as each
    group's k smallest ``hash(key, salt)`` values (tie-broken by key):
    a deterministic uniform within-group sample, independent of row
    order and partitioning.

    Two-level reduction so no group ever concentrates on the driver:
    each block keeps its own ≤ k rows per group (partial top-k — a
    block contributes at most k rows per group to the shuffle), then
    one :func:`bucketed_group_apply` on ``group_col`` finishes the
    top-k per group. Shuffle volume ≤ k · blocks rows per group.
    SQL twin: ``QUALIFY row_number() OVER (PARTITION BY group ORDER BY
    md5_number_lower(...), key) <= k``."""
    from graphscope_ray.stages.relational import bucketed_group_apply

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        # keep uint64: a signed view would flip the order of hashes
        # ≥ 2^63 and diverge from the SQL twin's unsigned compare
        out["_h"] = _key_hash_u64(b[key_col], salt, hash_fn)
        out = (out.sort_values(["_h", key_col], kind="stable")
               .groupby(group_col, sort=False).head(k))
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["_h", key_col], kind="stable")
                .groupby(group_col, sort=False).head(k)
                .drop(columns=["_h"]))

    pre = ds.map_batches(partial, batch_format="pandas")
    return bucketed_group_apply(pre, [group_col], final, num_buckets)


def negative_edges(
    graph,
    k: int = 5,
    seed: int = 42,
) -> "ray.data.Dataset":
    """Link-prediction negative sampling on a sealed ``ShardedGraph``:
    up to ``k`` deterministic non-edge candidates per vertex, uniform
    over the GLOBAL vertex set (candidate j of vertex u = the vertex at
    global rank hash(u, j, seed) mod V — ranks map to shards by the
    broadcast per-shard count cumsum, to vids by local sorted
    position). Three actor waves (generate → resolve rank→vid at the
    owning shard → membership-filter against u's resident CSR); no
    vertex or edge table ever leaves the pool and the output is
    O(V·k).

    Candidates that happen to hit a real arc of u (or u itself) are
    DROPPED, not re-drawn — the expected yield is k·(1 − density) per
    vertex, and the drop count is exactly recoverable by comparing
    against V·k (no silent cap: one round by design; run with a second
    seed for more). Deterministic at any partitioning: the candidate
    set is a pure function of (vids, P, k, seed). Returns (src,
    neg_dst)."""
    import numpy as np
    import ray

    import ray.data

    shards, P = graph.shards, graph.P
    counts = ray.get([s.local_count.remote() for s in shards])
    bounds = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)

    gen = [s.neg_gen.options(num_returns=P if P > 1 else 1).remote(
        k, seed, bounds) for s in shards]
    gen = [g if P > 1 else [g] for g in gen]
    res = [shards[d].neg_resolve.options(
        num_returns=P if P > 1 else 1).remote(
        int(bounds[d]), *[gen[src][d] for src in range(P)])
        for d in range(P)]
    res = [r if P > 1 else [r] for r in res]
    out = [shards[d].neg_filter.remote(*[res[src][d]
                                         for src in range(P)])
           for d in range(P)]
    return ray.data.from_arrow_refs(out)


def negative_edges_reference(edge_pairs, P: int, k: int = 5,
                             seed: int = 42, directed: bool = False
                             ) -> set:
    """Sequential oracle replicating the pool's rank layout (shards in
    fid order, vids sorted within each shard) and hash."""
    import numpy as np

    from graphscope_ray.functions.hashing import hash64_any, partition_of

    vids = np.array(sorted({x for uv in edge_pairs for x in uv[:2]}),
                    np.int64)
    owner = partition_of(vids, P)
    layout = np.concatenate([np.sort(vids[owner == f])
                             for f in range(P)])
    V = len(layout)
    arcs = set()
    for u, v in ((r[0], r[1]) for r in edge_pairs):
        arcs.add((int(u), int(v)))
        if not directed:
            arcs.add((int(v), int(u)))
    out = set()
    for u in vids:
        for j in range(k):
            with np.errstate(over="ignore"):
                h = hash64_any(np.array(
                    [np.int64(u) * np.int64(1000003)
                     + np.int64(j) * np.int64(99991)
                     + np.int64(seed)]))[0]
            cand = int(layout[int(h % np.uint64(V))])
            if cand != int(u) and (int(u), cand) not in arcs:
                out.add((int(u), cand))
    return out


def neighbor_sample_pool(
    graph,
    seeds,
    fanouts: "list[int]",
    seed: int = 42,
) -> "ray.data.Dataset":
    """k-hop neighbor sampling on a sealed ``ShardedGraph`` — same
    deterministic samples as :func:`neighbor_sample` (shared rank
    formula) but the adjacency stays RESIDENT in the pool: per hop one
    actor wave over the broadcast frontier instead of a full arc-table
    co-group shuffle. Directedness follows the pool's build. The
    per-hop frontier (one distinct int64 column) passes through the
    driver, as in the Dataset engine."""
    import numpy as np
    import pyarrow as pa
    import ray

    import ray.data

    shards = graph.shards
    frontier = np.unique(np.asarray(list(seeds), dtype=np.int64))
    parts = []
    for hop, fanout in enumerate(fanouts):
        fref = ray.put(frontier)
        refs = [s.nbr_sample.remote(fref, fanout, seed)
                for s in shards]
        hop_ds = ray.data.from_arrow_refs(refs).map_batches(
            lambda t, hop=hop: t.append_column(
                "hop", pa.array(np.full(t.num_rows, hop, np.int64))),
            batch_format="pyarrow").materialize()
        parts.append(hop_ds)
        frontier = np.unique(np.concatenate([
            b["dst"].to_numpy(np.int64)
            for b in hop_ds.iter_batches(batch_format="pandas")
        ] or [np.empty(0, np.int64)]))
        if not len(frontier):
            break
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.select_columns(["hop", "src", "dst"])
