"""Relational operator vocabulary over Ray Datasets.

The reference's GIE algebra (``interactive_engine/executor/ir/proto/
algebra.proto``) lists Scan/Project/Select/Join/Union/Intersect/
GroupBy/OrderBy/Dedup/Unfold/Limit/Sample/Sink (SURVEY §2.5). Most map
1:1 to native Dataset methods; this module adds the forms Ray Data
lacks or where the scale-aware pattern differs from the naive call:

- broadcast semi/anti joins (GIE SEMI/ANTI join kinds, algebra.proto:78)
  — the small side is shipped once with ``ray.put`` and probed inside
  ``map_batches`` (no shuffle);
- broadcast lookup join (small dimension table enrich);
- dedup-first with deterministic tie-break (GIE Dedup, algebra.proto:164);
- unfold/explode of a list column (GIE Unfold, algebra.proto:169);
- top-k (GIE OrderBy+Limit ≡ Topk, algebra.proto:160-161).

Everything here is exact and deterministic; skew/caveats are noted per
function.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _resolve(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def broadcast_semi_join(
    ds: ray.data.Dataset,
    keys: Sequence,
    on: str,
    anti: bool = False,
) -> ray.data.Dataset:
    """Keep rows whose ``on`` value is (not, if anti) in ``keys``.

    ``keys`` is a small driver-side collection — broadcast once via
    ``ray.put``; each task probes a numpy isin. This is the GIE
    SEMI/ANTI join for the common small-side case (the reference's
    boundary ops broadcast the vertex set the same way, SURVEY §2.2
    node_boundary row)."""
    ref = ray.put(np.asarray(list(keys)))

    def f(batch: pa.Table) -> pa.Table:
        k = _resolve(ref)
        mask = np.isin(batch.column(on).to_numpy(zero_copy_only=False), k)
        if anti:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def broadcast_lookup_join(
    ds: ray.data.Dataset,
    small: pd.DataFrame,
    on: str,
    how: str = "inner",
) -> ray.data.Dataset:
    """Enrich ``ds`` with columns from a small pandas table (dimension
    table / vocab): ``ray.put`` once, pandas merge per batch. No
    shuffle; the small side must fit in a worker heap."""
    ref = ray.put(small)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(_resolve(ref), on=on, how=how)

    return ds.map_batches(f, batch_format="pandas")


def typed_blocks(tables, required: str) -> list:
    """Filter a raw block gather down to schema-carrying blocks.

    Ray's sort-based shuffle emits zero-row splits with an EMPTY
    schema (no fields at all) when a sort range holds no rows; any
    code that gathers ``get_internal_block_refs()`` / remote-arg
    tables and touches columns must drop those first or hit
    KeyError/IndexError on a tiny input (round-2's one red row).
    ``required`` is a column every real block carries."""
    return [t for t in tables
            if t is not None and t.num_rows > 0
            and required in t.schema.names]


#: Rows per bucket-tag batch: bundles runs of tiny upstream blocks
#: into one sort-shuffle input block (~10 ms task overhead per block
#: otherwise dominates small inputs) while keeping worst-case batch
#: bytes bounded (32k × 2 KB text rows ≈ 64 MB).
COALESCE_ROWS = 32768


def coalesce_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Re-bundle runs of tiny blocks before a sort/groupby shuffle.

    Ray's sort pays ~10-30 ms of task overhead per input block; unions
    of map outputs and wide read splits of small tables leave hundreds
    of ~1k-row blocks, making that overhead 10× the useful work on
    sub-100k-row inputs. One zero-copy identity pass with
    ``batch_size=COALESCE_ROWS`` fixes it; map outputs re-bundle to the
    target block size, so full-scale blocks pass through unfragmented.
    The pandas metadata blob parquet scans attach is stripped
    (metadata-only op): it defeats Ray's schema-dedup hash ("Failed to
    hash the schemas" log spam) and bloats every shuffle message."""
    return ds.map_batches(lambda t: t.replace_schema_metadata(None),
                          batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=COALESCE_ROWS)


def bucketed_group_apply(
    ds: ray.data.Dataset,
    keys: list[str],
    fn,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Apply ``fn`` to coarse hash-buckets that contain WHOLE key-groups.

    Ray's ``groupby(keys).map_groups`` calls Python once per group —
    ruinous for millions of tiny groups. This coarsens the shuffle key
    to ``hash(keys) % num_buckets`` so ``fn`` runs ~num_buckets times
    over vectorizable frames, while the co-location guarantee (all rows
    of a key in one call) is preserved. ``fn`` must itself be group-
    aware (pandas groupby/merge/drop_duplicates inside).

    num_buckets trades parallelism against per-call overhead; at
    cluster scale set it ≳ total cores. Skewed single keys still land
    in one bucket — cap/salt inside ``fn`` where that matters.

    The bucket-tag stage runs with ``batch_size=COALESCE_ROWS`` so
    upstream runs of TINY blocks (unions of map outputs, 2·cpus-way
    read splits of small tables) coalesce before the sort shuffle —
    Ray's sort pays ~10-30 ms of task overhead per input block, which
    measured 10× the actual work on sub-100k-row gate inputs
    (128 × ~1k-row blocks: 2.3-3.6 s/shuffle → 0.25 s coalesced)."""
    from graphscope_ray.functions.hashing import hash64_any

    def add_bucket(b: pa.Table) -> pa.Table:
        # Arrow in/out: the shuffle then moves Arrow blocks (fast,
        # compact) — pandas blocks would ship pickled object-dtype
        # string arrays through the sort, measured ~3x slower
        h = np.zeros(b.num_rows, dtype=np.uint64)
        for k in keys:
            with np.errstate(over="ignore"):
                h = h * np.uint64(1099511628211) ^ hash64_any(
                    b.column(k).to_numpy(zero_copy_only=False)
                )
        # strip schema metadata: parquet-scanned blocks carry a pandas
        # metadata blob that defeats Ray's schema-dedup hash ("Failed
        # to hash the schemas" log spam) and bloats every message
        return b.append_column(
            "_bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        ).replace_schema_metadata(None)

    def run(g: pa.Table) -> pa.Table:
        # emit Arrow blocks: downstream operators (Project/Sort/union)
        # expect a uniform block type, and several assume Arrow
        pdf = g.drop_columns(["_bucket"]).to_pandas()
        return pa.Table.from_pandas(
            fn(pdf), preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow",
                       batch_size=COALESCE_ROWS)
        .groupby("_bucket")
        .map_groups(run, batch_format="pyarrow")
    )


_DECOMPOSABLE_AGGS = {"sum", "min", "max", "size", "count"}


def grouped_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    spec: dict[str, tuple[str | None, str]],
    num_buckets: int = 64,
    combine: bool | None = None,
) -> ray.data.Dataset:
    """Grouped aggregation via bucketed pandas (C-speed) groupbys.

    ``spec`` maps output column → (input column, pandas aggfunc), e.g.
    ``{"weight": (None, "size"), "revenue": ("rev", "sum")}`` (``None``
    column = row count). Semantically ``groupby(keys).aggregate(...)``;
    implemented over :func:`bucketed_group_apply` because Ray 2.49's
    native aggregate paths run at ~1k rows/s on this version (sort-based
    AggregateMap) or spin a large aggregator actor pool (hash-based) —
    measured in tools/; the bucketed path is ~1000× faster here and
    shuffles the same bytes.

    ``combine``: pre-aggregate each input batch BEFORE the shuffle
    (map-side combiner — sum/min/max/size/count decompose; size/count
    partials merge by sum). At low key cardinality this shrinks the
    all-to-all exchange by the per-batch duplication factor — the lever
    that keeps a 100 TB groupby from shuffling 100 TB. ``None``
    auto-enables when every aggfunc is decomposable; pass False for
    known high-cardinality keys (mostly size-1 groups) where the
    per-batch groupby buys nothing."""
    funcs = {fn for _, fn in spec.values()}
    if combine is None:
        combine = funcs <= _DECOMPOSABLE_AGGS
    if combine and not funcs <= _DECOMPOSABLE_AGGS:
        raise ValueError(f"non-decomposable aggfuncs for combine: {funcs}")

    def agg_frame(g: pd.DataFrame, items) -> pd.DataFrame:
        named = {
            out: pd.NamedAgg(column=col if col is not None else keys[0],
                             aggfunc=fn)
            for out, (col, fn) in items
        }
        return g.groupby(keys, sort=False).agg(**named).reset_index()

    if combine:
        merge_spec = {
            out: (out, "sum" if fn in ("size", "count") else fn)
            for out, (_, fn) in spec.items()
        }
        pre = ds.map_batches(
            lambda b: agg_frame(b, spec.items()), batch_format="pandas")
        return bucketed_group_apply(
            pre, keys, lambda g: agg_frame(g, merge_spec.items()),
            num_buckets)

    return bucketed_group_apply(
        ds, keys, lambda g: agg_frame(g, spec.items()), num_buckets)


def dedup_first(
    ds: ray.data.Dataset,
    keys: list[str],
    order_by: list[str] | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Distinct-by-keys keeping the first row in ``order_by`` order —
    deterministic (GIE Dedup). One bucketed hash shuffle on ``keys``."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + (order_by or []), kind="mergesort")
        return g.drop_duplicates(subset=keys, keep="first")

    return bucketed_group_apply(ds, keys, first, num_buckets)


def unfold(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """Explode a list column into one row per element (GIE Unfold)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.explode(col, ignore_index=True).dropna(subset=[col])

    return ds.map_batches(f, batch_format="pandas")


def topk(ds: ray.data.Dataset, key: str, k: int, descending: bool = True,
         tiebreak: list[str] | None = None) -> ray.data.Dataset:
    """OrderBy + Limit ≡ Topk (algebra.proto:160-161). Ray's sort is a
    range-partitioned shuffle; for small k a per-batch partial top-k
    first cuts the shuffle volume to ≤ k rows per block. ``tiebreak``
    columns (always ascending) make the cut deterministic on key ties."""
    tb = list(tiebreak or [])
    cols = [key] + tb
    asc = [not descending] + [True] * len(tb)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(cols, ascending=asc, kind="mergesort").head(k)

    # batch_size coalesces runs of tiny upstream blocks so the sort
    # shuffle sees few, full blocks (see COALESCE_ROWS) — and a bigger
    # partial batch also cuts more rows before the shuffle.
    return ds.map_batches(partial, batch_format="pandas",
                          batch_size=COALESCE_ROWS).sort(
        cols, descending=[not a for a in asc]
    ).limit(k)


def _arrow_fields(ds: ray.data.Dataset) -> dict:
    """{column: arrow type} from a Dataset schema, tolerating both
    Arrow and pandas block schemas (a ``Dataset.filter`` over pandas
    blocks reports a PandasBlockSchema, not a pyarrow.Schema)."""
    sch = ds.schema()
    if sch is None:
        raise ValueError(
            "dataset has no schema (fully empty with no type "
            "information) — produce empties via a batch-level filter "
            "(select_expr) so the schema survives")
    base = sch.base_schema
    if isinstance(base, pa.Schema):
        return {f.name: f.type for f in base}
    out = {}
    for name, typ in zip(base.names, base.types):
        if not isinstance(typ, pa.DataType):
            dt = np.dtype(typ)
            # pandas object columns are strings by engine convention
            typ = pa.string() if dt == np.dtype(object) \
                else pa.from_numpy_dtype(dt)
        out[name] = typ
    return out


def cogroup_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    num_buckets: int = 16,
    how: str = "inner",
) -> ray.data.Dataset:
    """Inner (or left-outer) equi-join on an int64 key via bucketed
    co-group.

    Ray 2.49's hash-shuffle ``Dataset.join`` crashes on the near-empty
    partitions a small input produces (pyarrow "no match for key field"
    in empty schema-less blocks), so iterative operators whose frontier
    can shrink to a handful of rows join through the same
    ``bucketed_group_apply`` shuffle the aggregates use. Column sets
    must be disjoint apart from the keys; the right key column is
    dropped from the output.

    ``how`` covers the GIE join-kind vocabulary (algebra.proto Join
    kinds): ``"inner"``, ``"left"``, ``"right"``, ``"outer"`` (full) —
    SEMI/ANTI live in :func:`broadcast_semi_join`. Outer variants keep
    unmatched rows with nulls on the other side's payload (GIE's
    OPTIONAL-expand / Cypher OPTIONAL MATCH contract); the side that
    can be null-padded has its integer payload cast to pandas nullable
    Int64 BEFORE the merge so matched values above 2^53 never round
    through float64. Caveat: a DOWNSTREAM stage that re-reads the
    resulting null-carrying int64 Arrow column with
    ``batch_format="pandas"`` gets float64 again (Arrow's default
    null-int conversion) — keep |id| < 2^53 or filter the nulls out
    before further joins on such columns."""
    if how not in ("inner", "left", "right", "outer"):
        raise ValueError(f"cogroup_join: unsupported how={how!r}")
    right_on = right_on or on
    ltypes = _arrow_fields(left)
    rtypes = _arrow_fields(right)
    lcols, rcols = list(ltypes), list(rtypes)
    overlap = (set(lcols) - {on}) & (set(rcols) - {right_on})
    if overlap:
        raise ValueError(f"cogroup_join column collision: {sorted(overlap)}")
    payload = {c: ltypes[c] for c in lcols if c != on}
    payload.update({c: rtypes[c] for c in rcols if c != right_on})

    def tag(side, key):
        def f(t: pa.Table) -> pa.Table:
            cols = {"_k": t.column(key).cast(pa.int64())}
            for c, typ in payload.items():
                if c in t.column_names:
                    cols[c] = t.column(c)
                elif pa.types.is_integer(typ):
                    # pad integers with ZEROS, not nulls: the other
                    # side's padding is never read (merge selects each
                    # side's own payload), and null-padded int64 would
                    # go through pandas as float64 — silently rounding
                    # |vid| > 2^53 (hashed string-node ids)
                    cols[c] = pa.array(
                        np.zeros(t.num_rows, np.int64)).cast(typ)
                else:
                    cols[c] = pa.nulls(t.num_rows, typ)
            cols["_side"] = pa.array(np.full(t.num_rows, side, np.int8))
            return pa.table(cols)

        return f

    both = (left.map_batches(tag(0, on), batch_format="pyarrow")
            .union(right.map_batches(tag(1, right_on), batch_format="pyarrow")))
    lpay = [c for c in lcols if c != on]
    rpay = [c for c in rcols if c != right_on]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0][["_k"] + lpay]
        r = g[g["_side"] == 1][["_k"] + rpay]
        # cast the null-paddable side's integer payload to nullable
        # Int64 BEFORE the merge: merge's own NaN-padding would promote
        # the column to float64 first, rounding matched values above
        # 2^53 (hashed string-oid vids)
        if how in ("left", "outer"):
            r = r.copy()
            for c in rpay:
                if pa.types.is_integer(payload[c]):
                    r[c] = r[c].astype("Int64")
        if how in ("right", "outer"):
            l = l.copy()
            for c in lpay:
                if pa.types.is_integer(payload[c]):
                    l[c] = l[c].astype("Int64")
        m = l.merge(r, on="_k", how=how)
        # the union frame null-pads each side's payload, which promotes
        # integer columns to float64 — cast back to the declared Arrow
        # type so downstream key hashing/joining sees stable dtypes
        for c, typ in payload.items():
            if pa.types.is_integer(typ) and c in m.columns:
                col = m[c]
                if col.isna().any():
                    m[c] = col.astype("Int64")
                else:
                    m[c] = col.astype(np.int64)
        return m.rename(columns={"_k": on})

    return bucketed_group_apply(both, ["_k"], merge, num_buckets)


def cogroup_pair_semi(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: tuple,
    right_on: tuple,
    negate: bool = False,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """SEMI / ANTI equi-join on an int64 KEY PAIR (the GIE SEMI/ANTI
    join kinds; Cypher ``WHERE [NOT] (a)-[:T]->(b)`` pattern
    predicates): keep left rows whose ``(on[0], on[1])`` pair appears
    (semi) / does not appear (anti, ``negate=True``) among right's
    ``right_on`` pairs. Left rows pass through with their original
    columns and multiplicity (right pairs are deduped per group, so a
    matching row is kept exactly once). Co-grouped on the pair's FIRST
    element — same shuffle shape as :func:`cogroup_join`."""
    a, b = on
    ra, rb = right_on
    ltypes = _arrow_fields(left)
    lcols = list(ltypes)

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {"_k": t.column(a).cast(pa.int64())}
        for c in lcols:
            cols[c] = t.column(c)
        cols["_pp"] = pa.array(np.zeros(t.num_rows, np.int64))
        cols["_side"] = pa.array(np.zeros(t.num_rows, np.int8))
        return t.from_pydict(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {"_k": t.column(ra).cast(pa.int64())}
        for c in lcols:
            typ = ltypes[c]
            if pa.types.is_integer(typ):
                # zero-pad ints (never read; null ints would promote
                # the union column to float64 and round big vids)
                cols[c] = pa.array(
                    np.zeros(t.num_rows, np.int64)).cast(typ)
            else:
                cols[c] = pa.nulls(t.num_rows, typ)
        cols["_pp"] = t.column(rb).cast(pa.int64())
        cols["_side"] = pa.array(np.ones(t.num_rows, np.int8))
        return t.from_pydict(cols)

    both = (left.map_batches(tag_left, batch_format="pyarrow")
            .union(right.map_batches(tag_right, batch_format="pyarrow")))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0]
        r = (g[g["_side"] == 1][["_k", "_pp"]]
             .drop_duplicates().rename(columns={"_k": "_pa"}))
        m = l.merge(r, left_on=["_k", b], right_on=["_pa", "_pp"],
                    how="left", indicator="_m", suffixes=("", "_r"))
        keep = (m["_m"] == "both")
        if negate:
            keep = ~keep
        return m.loc[keep, lcols].reset_index(drop=True)

    return bucketed_group_apply(both, ["_k"], merge, num_buckets)


def intersect_lists(
    ds: ray.data.Dataset,
    cols: list[str],
    out: str,
) -> ray.data.Dataset:
    """GIE Intersect (algebra.proto:100): per-row intersection of keyed
    array columns, emitted as a new list column. The per-row set
    intersection is inherently rowwise; each is a numpy operation over
    that row's lists (bounded by list length, not table size)."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        vals = []
        for row in zip(*(b[c] for c in cols)):
            acc = np.asarray(row[0])
            for other in row[1:]:
                acc = np.intersect1d(acc, np.asarray(other))
            vals.append(acc.tolist())
        b = b.drop(columns=cols)
        b[out] = vals
        return b

    return ds.map_batches(f, batch_format="pandas")


def path_expand(
    edges: ray.data.Dataset,
    starts: ray.data.Dataset,
    min_hops: int,
    max_hops: int,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """GIE PathExpand (algebra.proto:314), EndV+distinct semantics:
    (start, end, hops) pairs reachable in min_hops..max_hops arcs,
    keeping the MINIMUM hop count per (start, end) — iterated
    cogroup joins of the frontier against the arc table. ``starts``
    has one ``vid`` column."""
    arcs = edges.select_columns(["src", "dst"])
    frontier = starts.map_batches(
        lambda t: pa.table({
            "start": t.column("vid").cast(pa.int64()),
            "cur": t.column("vid").cast(pa.int64()),
        }), batch_format="pyarrow")
    # hop 0 is "seen": dist(start, start) = 0, so the start must not
    # re-enter as an end at a later hop
    seen = frontier.materialize()
    out = []
    for hop in range(1, max_hops + 1):
        ext = cogroup_join(frontier, arcs, on="cur", right_on="src",
                           num_buckets=num_buckets)
        frontier = ext.map_batches(
            lambda t: pa.table({
                "start": t.column("start"),
                "cur": t.column("dst").cast(pa.int64()),
            }), batch_format="pyarrow")
        # min-hop dedup per (start, end): drop ends already reached
        frontier = dedup_first(frontier, ["start", "cur"]).materialize()

        def unseen(g: pd.DataFrame) -> pd.DataFrame:
            f = g[g["_s"] == 0][["start", "cur"]]
            s = g[g["_s"] == 1][["start", "cur"]].assign(_hit=1)
            m = f.merge(s, on=["start", "cur"], how="left")
            m = m[m["_hit"].isna()]
            return pd.DataFrame({
                "start": m["start"].to_numpy(np.int64),
                "cur": m["cur"].to_numpy(np.int64)})

        tagged = (frontier.map_batches(
            lambda t: t.append_column(
                "_s", pa.array(np.zeros(t.num_rows, np.int8))),
            batch_format="pyarrow")
            .union(seen.map_batches(
                lambda t: t.append_column(
                    "_s", pa.array(np.ones(t.num_rows, np.int8))),
                batch_format="pyarrow")))
        frontier = bucketed_group_apply(
            tagged, ["start", "cur"], unseen, num_buckets).materialize()
        seen = seen.union(frontier).materialize()
        if frontier.count() == 0:
            break
        if hop >= min_hops:
            out.append(frontier.map_batches(
                lambda t, h=hop: pa.table({
                    "start": t.column("start"),
                    "end": t.column("cur"),
                    "hops": pa.array(np.full(t.num_rows, h, np.int64)),
                }), batch_format="pyarrow"))
    if not out:
        return ray.data.from_arrow(pa.table({
            "start": pa.array([], pa.int64()),
            "end": pa.array([], pa.int64()),
            "hops": pa.array([], pa.int64())}))
    res = out[0]
    for o in out[1:]:
        res = res.union(o)
    return res


def shortest_path_expand(
    edges: ray.data.Dataset,
    starts: ray.data.Dataset,
    weight_col: str | None = None,
    agg: str = "sum",
    max_hops: int | None = None,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """GIE ShortestPathExpand (algebra.proto:359-384): per (start, end)
    pair the minimum path weight, where each edge contributes its
    ``weight_col`` value combined by ``agg`` (SUM / MAX / MIN / MUL —
    the proto's WeightCal.Aggregate; AVG lacks optimal substructure and
    is rejected). ``weight_col=None`` falls back to path length (the
    proto's default weight), i.e. min-hop :func:`path_expand` EndV
    semantics with the hop count as the weight.

    Distributed multi-source Bellman-Ford over Datasets: each round
    extends the improved frontier through the arc table (one cogroup
    shuffle), reduces candidates to their per-(start, end) minimum, and
    keeps only entries that beat the best-so-far table (a second
    bucketed shuffle). Rounds are bounded by ``max_hops`` when the
    proto's hop_range sets one.  MUL assumes weights >= 1 (monotone
    combine — same contract the reference's dijkstra-style traversal
    needs for correctness).  ``starts`` has one ``vid`` column; output
    (start, end, weight) excludes the trivial (s, s, 0) rows."""
    if agg not in ("sum", "max", "min", "mul"):
        raise ValueError(
            f"ShortestPathExpand aggregate {agg!r} unsupported: AVG has "
            "no optimal substructure (algebra.proto:362-367)")
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    arcs = edges.select_columns(cols)
    if weight_col:
        arcs = arcs.map_batches(
            lambda t: pa.table({
                "src": t.column("src").cast(pa.int64()),
                "dst": t.column("dst").cast(pa.int64()),
                "_we": t.column(weight_col).cast(pa.float64()),
            }), batch_format="pyarrow")
    else:
        arcs = arcs.map_batches(
            lambda t: pa.table({
                "src": t.column("src").cast(pa.int64()),
                "dst": t.column("dst").cast(pa.int64()),
                "_we": pa.array(np.ones(t.num_rows, np.float64)),
            }), batch_format="pyarrow")

    frontier = starts.map_batches(
        lambda t: pa.table({
            "start": t.column("vid").cast(pa.int64()),
            "cur": t.column("vid").cast(pa.int64()),
            "w": pa.array(np.zeros(t.num_rows, np.float64)),
        }), batch_format="pyarrow").materialize()
    best = frontier

    def combine(w: pd.Series, we: pd.Series) -> pd.Series:
        if agg == "sum":
            return w + we
        if agg == "max":
            return np.maximum(w, we)
        if agg == "min":
            # seed rows carry w=0; a path's weight is the min EDGE
            # weight, so the first hop takes the edge value itself
            return np.where(w > 0, np.minimum(w, we), we)
        return np.where(w > 0, w * we, we)  # mul

    def relax(g: pd.DataFrame) -> pd.DataFrame:
        # g: candidate rows (_s=0) + current best rows (_s=1) for a
        # bucket of (start, cur) pairs — one pass emits the NEW best
        # per pair with an _imp flag on improvements (the next
        # frontier), so each round costs one shuffle, not three
        cand = g[g["_s"] == 0]
        cm = (cand.groupby(["start", "cur"], sort=False)["w"].min()
              .reset_index())
        cur = g[g["_s"] == 1][["start", "cur", "w"]].rename(
            columns={"w": "_bw"})
        m = cm.merge(cur, on=["start", "cur"], how="outer")
        imp = m["_bw"].isna() | (m["w"] < m["_bw"])
        w_new = np.where(imp, m["w"].to_numpy(np.float64),
                         m["_bw"].to_numpy(np.float64))
        # pairs present only in `cur` (no candidate) pass through
        only_old = m["w"].isna()
        w_new = np.where(only_old, m["_bw"].to_numpy(np.float64), w_new)
        imp = imp & ~only_old
        return pd.DataFrame({
            "start": m["start"].to_numpy(np.int64),
            "cur": m["cur"].to_numpy(np.int64),
            "w": w_new,
            "_imp": imp.to_numpy(np.int8)})

    hop = 0
    while True:
        hop += 1
        if max_hops is not None and hop > max_hops:
            break
        ext = cogroup_join(frontier, arcs, on="cur", right_on="src",
                           num_buckets=num_buckets)
        cand = ext.map_batches(
            lambda t: pa.table({
                "start": t.column("start"),
                "cur": t.column("dst").cast(pa.int64()),
                "w": pa.array(combine(
                    t.column("w").to_pandas(),
                    t.column("_we").to_pandas()).astype(np.float64)),
                "_s": pa.array(np.zeros(t.num_rows, np.int8)),
            }), batch_format="pyarrow")
        tagged = cand.union(best.map_batches(
            lambda t: pa.table({
                "start": t.column("start"), "cur": t.column("cur"),
                "w": t.column("w"),
                "_s": pa.array(np.ones(t.num_rows, np.int8)),
            }), batch_format="pyarrow"))
        merged = bucketed_group_apply(
            tagged, ["start", "cur"], relax, num_buckets).materialize()
        frontier = merged.map_batches(
            lambda t: t.filter(pc.equal(t.column("_imp"), 1))
            .drop_columns(["_imp"]), batch_format="pyarrow")
        best = merged.map_batches(
            lambda t: t.drop_columns(["_imp"]), batch_format="pyarrow")
        if frontier.count() == 0:
            break

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.invert(pc.equal(t.column("start"), t.column("cur")))
        t = t.filter(keep)
        return pa.table({"start": t.column("start"),
                         "end": t.column("cur"),
                         "weight": t.column("w")})

    return best.map_batches(finish, batch_format="pyarrow")


def edge_expand(
    bindings: ray.data.Dataset,
    edges: ray.data.Dataset,
    vertex_col: str,
    direction: str = "out",
    expand_opt: str = "vertex",
    alias: str = "nbr",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """GIE EdgeExpand (algebra.proto:285-312): expand every bound vertex
    in ``bindings[vertex_col]`` to its incident arcs in ``edges``
    (``src``/``dst`` + property columns), one output row per arc.

    ``direction`` follows the proto's Direction enum: ``out`` matches
    arcs whose src is the bound vertex, ``in`` matches dst, ``both`` is
    the bag union of the two.  ``expand_opt`` follows ExpandOpt:
    ``vertex`` appends only the opposite endpoint as ``alias`` (the
    fused expand the compiler emits when no edge predicate needs the
    edge row); ``edge`` additionally appends the edge property columns
    (prefixed ``alias_`` to stay collision-free with binding columns).

    Pure composition: one bucketed cogroup shuffle per direction —
    no driver materialization, no per-row logic."""
    if direction not in ("out", "in", "both"):
        raise ValueError(f"EdgeExpand direction {direction!r}")
    if expand_opt not in ("vertex", "edge"):
        raise ValueError(f"EdgeExpand opt {expand_opt!r}")
    eprops = [f.name for f in edges.schema().base_schema
              if f.name not in ("src", "dst")]

    def leg(key_side: str) -> ray.data.Dataset:
        other = "dst" if key_side == "src" else "src"

        def prep(t: pa.Table) -> pa.Table:
            cols = {"_ek": t.column(key_side).cast(pa.int64()),
                    alias: t.column(other).cast(pa.int64())}
            if expand_opt == "edge":
                for c in eprops:
                    cols[f"{alias}_{c}"] = t.column(c)
            return pa.table(cols)

        arcs = edges.map_batches(prep, batch_format="pyarrow")
        return cogroup_join(bindings, arcs, on=vertex_col, right_on="_ek",
                            num_buckets=num_buckets)

    if direction == "out":
        return leg("src")
    if direction == "in":
        return leg("dst")
    return leg("src").union(leg("dst"))


def get_v(
    bindings: ray.data.Dataset,
    vertices: ray.data.Dataset,
    endpoint_col: str,
    alias: str | None = None,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """GIE GetV (algebra.proto:257-283): resolve the vertex bound in
    ``bindings[endpoint_col]`` against the vertex property table
    ``vertices`` (``vid`` + property columns) and append that vertex's
    properties, prefixed ``{alias}_`` (default: the endpoint column
    name).  Acts as a semi-join too: rows whose endpoint has no vertex
    row are dropped, matching the proto's label-filtered GetV.

    One bucketed cogroup shuffle; the vertex table side ships only the
    property columns it contributes."""
    alias = alias or endpoint_col
    vprops = [f.name for f in vertices.schema().base_schema
              if f.name != "vid"]

    def prep(t: pa.Table) -> pa.Table:
        cols = {"_vk": t.column("vid").cast(pa.int64())}
        for c in vprops:
            cols[f"{alias}_{c}"] = t.column(c)
        return pa.table(cols)

    vt = vertices.map_batches(prep, batch_format="pyarrow")
    return cogroup_join(bindings, vt, on=endpoint_col, right_on="_vk",
                        num_buckets=num_buckets)


def apply_correlate(
    ds: ray.data.Dataset,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
) -> ray.data.Dataset:
    """GIE Apply (algebra.proto:387): correlated subquery — ``fn`` maps
    each input batch to its (possibly multi-row-per-input) expansion;
    express per-row subplans as vectorized batch logic."""
    return ds.map_batches(fn, batch_format="pandas")


def segment_apply(
    ds: ray.data.Dataset,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """GIE SegmentApply (algebra.proto:405): apply a subplan per key
    segment — co-located whole groups via the bucketed shuffle."""
    return bucketed_group_apply(ds, keys, fn, num_buckets)


def match_pattern(
    edges: ray.data.Dataset,
    pattern: list[tuple[str, str]],
    distinct: bool = True,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """GIE Pattern (algebra.proto:407): match a small edge pattern
    given as (var_u, var_v) arcs, e.g. triangle =
    ``[("a","b"), ("b","c"), ("a","c")]``. Left-deep join chain over
    the arc table; every pattern edge after the first must touch an
    already-bound variable (no cross products). ``distinct`` enforces
    pairwise-distinct variable bindings (isomorphic matching)."""
    arcs = edges.select_columns(["src", "dst"]).materialize()
    bind: ray.data.Dataset | None = None
    bound: list[str] = []
    for u, v in pattern:
        e = arcs.map_batches(
            lambda t, a=u, b=v: pa.table({
                a + "__e": t.column("src").cast(pa.int64()),
                b + "__e": t.column("dst").cast(pa.int64()),
            }), batch_format="pyarrow")
        if bind is None:
            bind = e.map_batches(
                lambda t, a=u, b=v: pa.table({
                    a: t.column(a + "__e"), b: t.column(b + "__e")}),
                batch_format="pyarrow")
            bound = [u, v]
            continue
        if u in bound and v in bound:
            j = cogroup_join(bind, e, on=u, right_on=u + "__e",
                             num_buckets=num_buckets)
            j = select_expr(j, lambda t, b=v: __import__(
                "pyarrow").compute.equal(t.column(b), t.column(b + "__e")))
            bind = j.drop_columns([v + "__e"])
        elif u in bound:
            j = cogroup_join(bind, e, on=u, right_on=u + "__e",
                             num_buckets=num_buckets)
            bind = j.map_batches(
                lambda t, b=v: t.rename_columns(
                    [b if c == b + "__e" else c for c in t.column_names]),
                batch_format="pyarrow")
            bound.append(v)
        elif v in bound:
            j = cogroup_join(bind, e, on=v, right_on=v + "__e",
                             num_buckets=num_buckets)
            bind = j.map_batches(
                lambda t, a=u: t.rename_columns(
                    [a if c == a + "__e" else c for c in t.column_names]),
                batch_format="pyarrow")
            bound.append(u)
        else:
            raise ValueError(
                f"pattern edge ({u},{v}) touches no bound variable "
                "(cross products unsupported)")
        if distinct:
            def alldiff(t: pa.Table, cols=tuple(bound)) -> pa.Table:
                import pyarrow.compute as pc

                mask = pa.array(np.ones(t.num_rows, bool))
                for i in range(len(cols)):
                    for j2 in range(i + 1, len(cols)):
                        mask = pc.and_(mask, pc.not_equal(
                            t.column(cols[i]), t.column(cols[j2])))
                return t.filter(mask)

            bind = bind.map_batches(alldiff, batch_format="pyarrow")
        bind = bind.materialize()
    return bind


def apply_expr(
    ds: ray.data.Dataset,
    out_col: str,
    fn: Callable[[pa.Table], pa.Array],
) -> ray.data.Dataset:
    """Project a computed column (GIE Project): ``fn`` is a vectorized
    pyarrow.compute expression over the batch."""

    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, fn(batch))

    return ds.map_batches(f, batch_format="pyarrow")


def select_expr(
    ds: ray.data.Dataset,
    pred: Callable[[pa.Table], pa.Array],
) -> ray.data.Dataset:
    """Filter with a vectorized predicate (GIE Select) — batch-level
    mask, not the per-row ``Dataset.filter``."""
    return ds.map_batches(lambda t: t.filter(pred(t)), batch_format="pyarrow")


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    by: list[str],
    direction: str = "backward",
    right_suffix: str = "_r",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """As-of join: each left row picks the right row with the greatest
    ``on`` ≤ left.``on`` (``direction="backward"``; ``"forward"`` =
    smallest ≥) within its ``by`` group — the standard event-enrichment
    join (DuckDB/pandas ASOF LEFT JOIN semantics; Ray Data has no
    native equivalent).

    Distributed as ONE bucketed co-group on the ``by`` keys (whole
    groups co-located, many groups per vectorized ``pandas.merge_asof``
    call); left rows with no match keep nulls. Both sides are padded to
    one union schema with typed nulls because the sort-based shuffle
    needs block-schema consistency. ``by`` is required — it is the
    partitioning key; a keyless as-of needs a range partition (pass one
    constant key column if the data is genuinely global and small)."""
    ls, rs = left.schema(), right.schema()
    lcols, rcols = list(ls.names), list(rs.names)
    ltypes = dict(zip(ls.names, ls.types))
    rtypes = dict(zip(rs.names, rs.types))
    overlap = (set(lcols) & set(rcols)) - set(by)
    rren = {c: c + right_suffix for c in rcols
            if c in overlap and c not in by}
    r_value_cols = [rren.get(c, c) for c in rcols if c not in by]
    out_on_r = rren.get(on, on)
    all_cols = lcols + r_value_cols
    types = dict(ltypes)
    for c in rcols:
        if c not in by:
            types[rren.get(c, c)] = rtypes[c]

    def pad(side: int, present: list, ren: dict):
        def f(t: pa.Table) -> pa.Table:
            have = {ren.get(c, c): t.column(c) for c in present}
            cols = {c: have.get(c, pa.nulls(t.num_rows, types[c]))
                    for c in all_cols}
            cols["_side"] = pa.array(np.full(t.num_rows, side, np.int8))
            return pa.table(cols).replace_schema_metadata(None)
        return f

    l_t = left.map_batches(pad(0, lcols, {}), batch_format="pyarrow")
    r_t = right.map_batches(pad(1, rcols, rren), batch_format="pyarrow")

    def run(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][lcols].sort_values(on, kind="mergesort")
        rg = g[g["_side"] == 1][list(by) + r_value_cols]
        rg = rg.sort_values(out_on_r, kind="mergesort")
        if lg.empty:
            return pd.DataFrame(columns=all_cols)
        m = pd.merge_asof(lg, rg, left_on=on, right_on=out_on_r,
                          by=list(by), direction=direction)
        return m[all_cols]

    return bucketed_group_apply(l_t.union(r_t), list(by), run,
                                num_buckets=num_buckets)


def global_ntile(
    ds: ray.data.Dataset,
    by: list[str],
    n_buckets: int,
    out_col: str = "bucket",
) -> ray.data.Dataset:
    """Exact distributed NTILE (SQL window semantics: the first
    ``n mod B`` buckets get one extra row) over the total order of the
    ``by`` columns — include a unique id as the last key to pin ties.

    One range-partitioned sort shuffle; then each sorted block learns
    its global row offset from the per-block counts (tiny remote
    metadata calls — the driver holds O(#blocks) ints, never rows) and
    assigns ranks/buckets vectorized. Deterministic at any
    partitioning. Bucket ids are 1-based like SQL NTILE.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    sorted_ds = coalesce_blocks(ds).sort(by).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    n = int(offsets[-1])
    q, r = divmod(n, n_buckets)

    @ray.remote
    def _assign(t: pa.Table, off: int) -> pa.Table:
        rank = off + np.arange(t.num_rows, dtype=np.int64)
        big = np.int64(r * (q + 1))          # rows in the +1 buckets
        bucket = np.where(
            rank < big,
            rank // max(q + 1, 1),
            r + (rank - big) // max(q, 1) if q else r - 1,
        ) + 1
        return t.append_column(out_col,
                               pa.array(bucket.astype(np.int64)))

    out = [_assign.remote(t, int(offsets[i])) for i, t in enumerate(refs)]
    return ray.data.from_arrow_refs(out)


def event_funnel(
    events: ray.data.Dataset,
    steps: list[str],
    within_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """First-touch funnel over an event log (the CEP / product-funnel
    sequenced-pattern op; GIE expresses it as a chained PathExpand
    over the temporal order): per user, the GREEDY-EARLIEST chain
    ``t1 < t2 < … < tk`` where ``t1`` is the user's first
    ``steps[0]`` event and each ``t_i`` is the first ``steps[i-1]``
    event strictly after ``t_{i-1}``. One row per user that reached
    step 1: ``(user_col, t1..tk, steps_completed, completed)`` —
    ``completed`` iff every step matched and ``tk − t1 ≤
    within_seconds``. Deterministic (min timestamps; strictly-greater
    chaining means equal-timestamp events never chain).

    One bucketed co-group on the user key; inside a bucket each step
    is a vectorized filter + merge + groupby-min (k tiny passes, no
    per-user loop). First-touch greedy is the product-analytics
    convention — it can miss a later chain that would fit the window
    when the first one does not."""
    if len(steps) < 2:
        raise ValueError("event_funnel: need at least 2 steps")
    within = np.timedelta64(int(within_seconds), "s")

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        res = (g[g[type_col] == steps[0]]
               .groupby(user_col, sort=False)[ts_col].min()
               .rename("t1").reset_index())
        prev = "t1"
        for i, st in enumerate(steps[1:], start=2):
            cand = g.loc[g[type_col] == st, [user_col, ts_col]].merge(
                res[[user_col, prev]], on=user_col)
            cand = cand[cand[ts_col] > cand[prev]]
            ti = (cand.groupby(user_col, sort=False)[ts_col].min()
                  .rename(f"t{i}").reset_index())
            res = res.merge(ti, on=user_col, how="left")
            prev = f"t{i}"
        tcols = [f"t{i}" for i in range(1, len(steps) + 1)]
        res["steps_completed"] = res[tcols].notna().sum(axis=1).astype(
            np.int64)
        last = res[tcols[-1]]
        res["completed"] = ((last - res["t1"]) <= within).fillna(
            False).astype(bool)
        return res.sort_values(user_col, kind="mergesort")

    return bucketed_group_apply(
        events.select_columns([user_col, ts_col, type_col]),
        [user_col], funnel, num_buckets)
