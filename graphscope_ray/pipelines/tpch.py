"""Relational demo pipelines over the provided TPC-H-ish tables.

These exercise the GIE relational operator inventory (SURVEY §2.5 —
Scan/Project/Select/Join/GroupBy/OrderBy/Limit/Dedup) as native Ray
Data pipelines with exact DuckDB-SQL twins in ``__ray_entry__``.
Float aggregates are rounded to 4 dp on both sides so the driver's
value-hash is insensitive to summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from graphscope_ray.sources.readers import read_parquet_clean as _read_parquet
from graphscope_ray.stages.relational import dedup_first, grouped_agg, topk


from graphscope_ray.functions.format import fixed_cols as _fixed_cols


def q1_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary.
    Columns pruned at the read; revenue computed vectorized per batch;
    one groupby shuffle."""
    li = _read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return t.append_column("revenue", rev)

    out = grouped_agg(
        li.map_batches(revenue, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "sum_revenue": ("revenue", "sum"),
            "avg_disc": ("l_discount", "mean"),
            "count_order": (None, "size"),
        },
    )
    return _fixed_cols(out, {"sum_qty": 4, "sum_revenue": 4, "avg_disc": 6})


def q3_top_orders(sf_dir: str, segment: str = "BUILDING", k: int = 10
                  ) -> ray.data.Dataset:
    """Join customer⋈orders⋈lineitem, filter segment, revenue per order,
    top-k by (revenue desc, orderkey asc).

    Shape: pre-aggregate revenue per order FIRST (one grouped sum over
    lineitem — the only line-scale shuffle), then join the order-scale
    sides. The customer filter is a semi-join: broadcast keys when the
    filtered segment fits BROADCAST_LIMIT_ROWS, else a bucketed
    co-group (the >1e8-customer path); the order⋈revenue join is
    always a co-group (both sides order-scale). Ray 2.49's native
    hash-shuffle join added ~8 s of aggregator-actor overhead here."""
    from graphscope_ray.pipelines.triangles import BROADCAST_LIMIT_ROWS
    from graphscope_ray.stages.relational import (
        broadcast_semi_join,
        cogroup_join,
    )

    # predicate pushdown: the segment filter rides the parquet scan so
    # row groups whose stats exclude it never leave storage (GIE Scan
    # predicate, algebra.proto:234)
    cust = _read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"],
        filter=(pc.field("c_mktsegment") == segment),
    ).select_columns(["c_custkey"])
    orders = _read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = _read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"o_orderkey": t.column("l_orderkey"), "revenue": rev})

    # order keys are high-cardinality (~4 lineitem rows per order): the
    # map-side combiner buys almost no shrink but costs a per-batch
    # groupby — measured 2x slower than the plain shuffle here
    rev_per_order = grouped_agg(
        li.map_batches(revenue, batch_format="pyarrow"),
        ["o_orderkey"], {"revenue": ("revenue", "sum")}, combine=False,
    )

    if cust.count() <= BROADCAST_LIMIT_ROWS:
        keys = cust.to_pandas()["c_custkey"].to_numpy(np.int64)
        co = broadcast_semi_join(orders, keys, on="o_custkey")
    else:
        co = cogroup_join(orders, cust, on="o_custkey",
                          right_on="c_custkey")
    agg = cogroup_join(
        rev_per_order, co.select_columns(["o_orderkey"]), on="o_orderkey")
    # distributed top-k (partial per-block cut + small sort) — the
    # per-order aggregate is order-scale and must not hit the driver
    top = topk(agg, "revenue", k, descending=True, tiebreak=["o_orderkey"])
    return _fixed_cols(top, {"revenue": 4})


def q5_nation_revenue(sf_dir: str,
                      num_buckets: int = 32) -> ray.data.Dataset:
    """Revenue per customer nation: nation⋈customer⋈orders⋈lineitem.

    Scale shape: nation (≤ a few hundred rows by TPC-H contract) is
    the only unconditional broadcast; the customer side auto-selects
    broadcast vs bucketed co-group on BROADCAST_LIMIT_ROWS exactly
    like q3 (at 100× the customer table is not a "small dim").
    Lineitem revenue is pre-aggregated to order grain BEFORE any join,
    so both co-group sides are order-scale and the lineitem table
    itself never shuffles. ``num_buckets`` sizes the co-group
    exchanges (set ≳ cluster cores at scale)."""
    from graphscope_ray.pipelines.triangles import BROADCAST_LIMIT_ROWS
    from graphscope_ray.stages.relational import (
        broadcast_lookup_join,
        cogroup_join,
    )

    nation = _read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas().rename(columns={"n_nationkey": "c_nationkey"})
    cust = _read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    # (c_custkey, n_name): nation is a per-batch pandas lookup, no shuffle
    cust_n = broadcast_lookup_join(cust, nation, on="c_nationkey",
                                   how="inner").select_columns(
                                       ["c_custkey", "n_name"])
    orders = _read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).rename_columns({"o_custkey": "c_custkey"})
    if cust.count() <= BROADCAST_LIMIT_ROWS:
        o_n = broadcast_lookup_join(orders, cust_n.to_pandas(),
                                    on="c_custkey", how="inner")
    else:
        o_n = cogroup_join(orders, cust_n, on="c_custkey",
                           num_buckets=num_buckets)
    li = _read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"o_orderkey": t.column("l_orderkey"), "revenue": rev})

    rev_per_order = grouped_agg(
        li.map_batches(revenue, batch_format="pyarrow"),
        ["o_orderkey"], {"revenue": ("revenue", "sum")},
        num_buckets=num_buckets, combine=False,   # high-cardinality key
    )
    ol = cogroup_join(rev_per_order,
                      o_n.select_columns(["o_orderkey", "n_name"]),
                      on="o_orderkey", num_buckets=num_buckets)
    out = grouped_agg(
        ol.select_columns(["n_name", "revenue"]),
        ["n_name"], {"revenue": ("revenue", "sum")},
    )
    return _fixed_cols(out, {"revenue": 4})


def q_dedup_orders(sf_dir: str) -> ray.data.Dataset:
    """First order per customer by (orderdate, orderkey) — GIE Dedup
    with deterministic tie-break."""
    orders = _read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    return dedup_first(orders, ["o_custkey"], order_by=["o_orderdate", "o_orderkey"])


def q_events_window(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour windows per event_type: count + sum(value) —
    the streaming-shaped workload as a batch groupby (ray_guide:
    windows over an ordered log are group-bys on floor(ts))."""
    ev = _read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def hour(t: pa.Table) -> pa.Table:
        h = pc.floor_temporal(t.column("ts"), unit="hour")
        return pa.table({"event_type": t.column("event_type"),
                         "window_start": h, "value": t.column("value")})

    out = grouped_agg(
        ev.map_batches(hour, batch_format="pyarrow"),
        ["event_type", "window_start"],
        {"n_events": (None, "size"), "sum_value": ("value", "sum")},
    )
    return _fixed_cols(out, {"sum_value": 4})


def q_events_funnel(sf_dir: str) -> ray.data.Dataset:
    """First-touch view→click→purchase funnel per user within 24 h
    (stages/relational.event_funnel): (user_id, t1, t2, t3,
    steps_completed, completed). Exact chained-min-subquery DuckDB
    twin."""
    from graphscope_ray.stages.relational import event_funnel

    ev = _read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])
    return event_funnel(ev, ["view", "click", "purchase"],
                        within_seconds=86400)


def q_events_sessions(sf_dir: str, gap_minutes: int = 30) -> ray.data.Dataset:
    """Session counts per user (new session when the gap to the previous
    event exceeds ``gap_minutes``) — ordered-log windowing inside
    ``groupby(user).map_groups`` over ts-sorted groups."""
    from graphscope_ray.stages.relational import bucketed_group_apply

    ev = _read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        # whole users per bucket: session starts where the user changes
        # or the gap exceeds the threshold — one vectorized pass
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy()
        uid = g["user_id"].to_numpy(np.int64)
        new = np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap))
        )
        out = (
            pd.DataFrame({"user_id": uid, "new": new})
            .groupby("user_id", sort=False)
            .agg(n_sessions=("new", "sum"), n_events=("new", "size"))
            .reset_index()
        )
        return out.astype({"n_sessions": np.int64, "n_events": np.int64})

    return bucketed_group_apply(ev, ["user_id"], sessions, num_buckets=16)
