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


def dedup_first(
    ds: ray.data.Dataset,
    keys: list[str],
    order_by: list[str] | None = None,
) -> ray.data.Dataset:
    """Distinct-by-keys keeping the first row in ``order_by`` order —
    deterministic (GIE Dedup). One hash shuffle on ``keys``."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        if order_by:
            g = g.sort_values(order_by, kind="mergesort")
        return g.head(1)

    return ds.groupby(keys).map_groups(first, batch_format="pandas")


def unfold(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """Explode a list column into one row per element (GIE Unfold)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.explode(col, ignore_index=True).dropna(subset=[col])

    return ds.map_batches(f, batch_format="pandas")


def topk(ds: ray.data.Dataset, key: str, k: int, descending: bool = True
         ) -> ray.data.Dataset:
    """OrderBy + Limit ≡ Topk (algebra.proto:160-161). Ray's sort is a
    range-partitioned shuffle; for small k a per-batch partial top-k
    first cuts the shuffle volume."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.nlargest(k, key) if descending else batch.nsmallest(k, key)
        )

    return ds.map_batches(partial, batch_format="pandas").sort(
        key, descending=descending
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
