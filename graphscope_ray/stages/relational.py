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
    in one bucket — cap/salt inside ``fn`` where that matters."""
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
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(run, batch_format="pyarrow")
    )


def grouped_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    spec: dict[str, tuple[str | None, str]],
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Grouped aggregation via bucketed pandas (C-speed) groupbys.

    ``spec`` maps output column → (input column, pandas aggfunc), e.g.
    ``{"weight": (None, "size"), "revenue": ("rev", "sum")}`` (``None``
    column = row count). Semantically ``groupby(keys).aggregate(...)``;
    implemented over :func:`bucketed_group_apply` because Ray 2.49's
    native aggregate paths run at ~1k rows/s on this version (sort-based
    AggregateMap) or spin a large aggregator actor pool (hash-based) —
    measured in tools/; the bucketed path is ~1000× faster here and
    shuffles the same bytes."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(keys, sort=False)
        named = {
            out: pd.NamedAgg(column=col if col is not None else keys[0],
                             aggfunc=fn)
            for out, (col, fn) in spec.items()
        }
        return gb.agg(**named).reset_index()

    return bucketed_group_apply(ds, keys, f, num_buckets)


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

    return ds.map_batches(partial, batch_format="pandas").sort(
        cols, descending=[not a for a in asc]
    ).limit(k)


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
