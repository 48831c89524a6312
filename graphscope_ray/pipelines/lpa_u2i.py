"""Bipartite weighted label propagation (gs::LPAU2I).

Reference semantics (``analytical_engine/apps/lpa/lpa_u2i.h:30-250``):
a u→i bipartite graph with edge weights; u vertices carry a numeric
label vector (their properties). Alternating supersteps:

- **u2i**: ``label[i] = Σ_{u ∈ in(i)} label[u] · w(u,i)`` (plain
  weighted sum, no normalization — lpa_u2i.h:167-186).
- **i2u**: ``tmp[u] = Σ_{i ∈ out(u)} label[i] · w(u,i)``; then per
  property: labels exactly 0 or 1 are pinned (semi-supervised seeds);
  otherwise ``label'[u] = (tmp − outdeg(u)·label[u]) /
  (ond(u) − outdeg(u))`` where ``ond(u) = Σ_{i ∈ out(u)} indeg(i)``,
  kept unchanged when the denominator is 0 (lpa_u2i.h:188-236).

Expressed Ray-Data-native: each half-step is one bucketed co-group
(join + weighted segment sum) over the edge Dataset; the degree tables
are computed once. Labels stay in a (u, label) Dataset — nothing is
vertex-scale on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.stages.relational import bucketed_group_apply, grouped_agg


def _weighted_pull(edges: ray.data.Dataset, labels: ray.data.Dataset,
                   key: str, out: str, label_col: str,
                   num_buckets: int = 16) -> ray.data.Dataset:
    """Σ_{key} label[key]·w grouped by ``out`` — one co-group bucketed
    by ``key`` then a grouped sum by ``out``. Deterministic: the group
    sum orders by (out, key) before reducing."""

    def tag_e(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column(key).cast(pa.int64()),
            "o": t.column(out).cast(pa.int64()),
            "w": t.column("weight").cast(pa.float64()),
            "lab": pa.nulls(t.num_rows, pa.float64()),
            "side": pa.array(np.zeros(t.num_rows, np.int8)),
        })

    def tag_l(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column(key).cast(pa.int64()),
            "o": pa.nulls(t.num_rows, pa.int64()),
            "w": pa.nulls(t.num_rows, pa.float64()),
            "lab": t.column(label_col).cast(pa.float64()),
            "side": pa.array(np.ones(t.num_rows, np.int8)),
        })

    both = (edges.map_batches(tag_e, batch_format="pyarrow")
            .union(labels.map_batches(tag_l, batch_format="pyarrow")))

    def mul(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 0][["k", "o", "w"]]
        l = g[g["side"] == 1][["k", "lab"]]
        m = e.merge(l, on="k")
        m = m.sort_values(["o", "k"], kind="mergesort")
        return pd.DataFrame({
            "o": m["o"].to_numpy(np.int64),
            "contrib": (m["w"] * m["lab"]).to_numpy(np.float64),
        })

    prods = bucketed_group_apply(both, ["k"], mul, num_buckets)
    return grouped_agg(prods, ["o"], {"s": ("contrib", "sum")}, num_buckets)


def lpa_u2i(
    edges: ray.data.Dataset,
    u_labels: ray.data.Dataset,
    rounds: int = 3,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Run ``rounds`` (u2i, i2u) pairs; returns (u, label).

    ``edges``: (u, i, weight); ``u_labels``: (u, label) with label in
    [0, 1] (exact 0/1 values are pinned seeds, lpa_u2i.h:214-216)."""
    deg = grouped_agg(edges, ["u"], {"outdeg": (None, "size")}, num_buckets).materialize()
    indeg = grouped_agg(edges, ["i"], {"indeg": (None, "size")}, num_buckets)
    # ond(u) = Σ_{i∈out(u)} indeg(i): weighted pull with weight=1,
    # label=indeg along the i→u direction
    ond = _weighted_pull(
        edges.map_batches(
            lambda t: pa.table({
                "i": t.column("i"), "u": t.column("u"),
                "weight": pa.array(np.ones(t.num_rows))}),
            batch_format="pyarrow"),
        indeg, key="i", out="u", label_col="indeg", num_buckets=num_buckets,
    ).map_batches(
        lambda t: pa.table({"u": t.column("o"),
                            "ond": t.column("s").cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    def side_tables(ds, cols):
        return ds.map_batches(
            lambda t, c=cols: pa.table(
                {name: t.column(src) for name, src in c.items()}
            ), batch_format="pyarrow")

    ulab = side_tables(u_labels, {"u": "u", "label": "label"}).materialize()
    edges = edges.materialize()
    # u-side constants co-grouped once: (u, label0, outdeg, ond)
    for _ in range(rounds):
        # u2i: i_label = Σ u_label·w
        ilab = _weighted_pull(edges, ulab.rename_columns({"label": "lab_"}),
                              key="u", out="i", label_col="lab_",
                              num_buckets=num_buckets
                              ).map_batches(
            lambda t: pa.table({"i": t.column("o"), "ilab": t.column("s")}),
            batch_format="pyarrow")
        # i2u: tmp = Σ i_label·w over out(u)
        tmp = _weighted_pull(
            edges.map_batches(
                lambda t: pa.table({"i": t.column("i"), "u": t.column("u"),
                                    "weight": t.column("weight")}),
                batch_format="pyarrow"),
            ilab, key="i", out="u", label_col="ilab",
            num_buckets=num_buckets,
        ).map_batches(
            lambda t: pa.table({"u": t.column("o"), "tmp": t.column("s")}),
            batch_format="pyarrow")

        # combine: new = (tmp − outdeg·lab) / (ond − outdeg), pinned at
        # exact 0/1, unchanged when ond == outdeg
        def tag(ds, side):
            return ds.map_batches(
                lambda t, s=side: t.append_column(
                    "side", pa.array(np.full(t.num_rows, s, np.int8))),
                batch_format="pyarrow")

        def pad(ds, schema_cols):
            def f(t: pa.Table) -> pa.Table:
                cols = {}
                for name, typ in schema_cols.items():
                    if name in t.column_names:
                        cols[name] = t.column(name).cast(typ)
                    else:
                        cols[name] = pa.nulls(t.num_rows, typ)
                return pa.table(cols)
            return ds.map_batches(f, batch_format="pyarrow")

        schema = {"u": pa.int64(), "label": pa.float64(),
                  "tmp": pa.float64(), "outdeg": pa.int64(),
                  "ond": pa.int64(), "side": pa.int8()}
        parts = (pad(tag(ulab, 0), schema)
                 .union(pad(tag(tmp, 1), schema))
                 .union(pad(tag(deg, 2), schema))
                 .union(pad(tag(ond, 3), schema)))

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            lab = g[g["side"] == 0][["u", "label"]]
            tm = g[g["side"] == 1][["u", "tmp"]]
            dg = g[g["side"] == 2][["u", "outdeg"]]
            on = g[g["side"] == 3][["u", "ond"]]
            m = lab.merge(tm, on="u", how="left").merge(
                dg, on="u", how="left").merge(on, on="u", how="left")
            m[["tmp"]] = m[["tmp"]].fillna(0.0)
            m[["outdeg", "ond"]] = m[["outdeg", "ond"]].fillna(0)
            lab_v = m["label"].to_numpy(np.float64)
            tmp_v = m["tmp"].to_numpy(np.float64)
            od = m["outdeg"].to_numpy(np.float64)
            onv = m["ond"].to_numpy(np.float64)
            pinned = (lab_v == 0.0) | (lab_v == 1.0)
            denom = onv - od
            upd = ~pinned & (denom != 0)
            new = lab_v.copy()
            new[upd] = (tmp_v[upd] - od[upd] * lab_v[upd]) / denom[upd]
            return pd.DataFrame({"u": m["u"].to_numpy(np.int64),
                                 "label": new})

        ulab = bucketed_group_apply(parts, ["u"], combine, num_buckets
                                    ).materialize()
    return ulab


def lpa_u2i_pool(
    edges: ray.data.Dataset,
    u_labels: ray.data.Dataset,
    rounds: int = 3,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """BSP restatement of :func:`lpa_u2i` on the GraphShard actor pool
    — identical semantics (pytest pins both to 1e-9), ~15× less fixed
    overhead at small scale and the same scatter/exchange/apply waves
    as every builtin at large scale.

    u/i vertices share one id space by parity (u→2u even, i→2i+1 odd);
    forward arcs u→i are dir=0, mirror arcs i→u dir=1 (the bidi build's
    shard-direct reverse exchange carries the weights). Each round is
    two fused waves; ond(u)=Σ indeg(i) is two waves once up front."""
    from graphscope_ray.functions.hashing import partition_of
    from graphscope_ray.state.graph import _route_groups, build_graph

    def enc_edges(t: pa.Table) -> pa.Table:
        u = np.asarray(t.column("u").to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        i = np.asarray(t.column("i").to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        return pa.table({
            "src": pa.array(2 * u, pa.int64()),
            "dst": pa.array(2 * i + 1, pa.int64()),
            "weight": t.column("weight").cast(pa.float64()),
        })

    arcs = edges.map_batches(enc_edges, batch_format="pyarrow")

    def enc_u_verts(t: pa.Table) -> pa.Table:
        u = np.asarray(t.column("u").to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        return pa.table({"vid": pa.array(2 * u, pa.int64())})

    def enc_i_verts(t: pa.Table) -> pa.Table:
        i = np.asarray(t.column("i").to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        return pa.table({"vid": pa.array(2 * i + 1, pa.int64())})

    verts = (
        u_labels.map_batches(enc_u_verts, batch_format="pyarrow")
        .union(grouped_agg(edges.select_columns(["i"]), ["i"],
                           {"n": (None, "size")})
               .map_batches(enc_i_verts, batch_format="pyarrow"))
    )
    g = build_graph(arcs, num_partitions=num_partitions, directed=True,
                    with_reverse=True, extra_vertices=verts)

    def enc_seed(t: pa.Table) -> pa.Table:
        u = np.asarray(t.column("u").to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        vid = 2 * u
        return pa.table({
            "vid": pa.array(vid, pa.int64()),
            "label": t.column("label").cast(pa.float64()),
            "_fid": pa.array(partition_of(vid, g.P), pa.int64()),
        })

    _route_groups(u_labels.map_batches(enc_seed, batch_format="pyarrow"),
                  g.shards, "_fid",
                  lambda shard, tab: shard.lpa_seed.remote(tab))
    g.call_all("lpa_seal")

    refs = g.step_refs("lpa_ond_start")
    refs = g.step_refs("lpa_ond_mid", inbox=refs)
    g.apply_all("lpa_ond_apply", refs)

    refs = g.step_refs("lpa_scatter_u")
    for r in range(rounds):
        refs = g.step_refs("lpa_i_step", inbox=refs)
        refs = g.step_refs("lpa_u_step", r < rounds - 1, inbox=refs)
    g.step_scalars(refs)  # sync the last wave before reading state

    def dec(t: pa.Table) -> pa.Table:
        vid = np.asarray(t.column("vid").to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        keep = (vid % 2) == 0
        return pa.table({
            "u": pa.array(vid[keep] // 2, pa.int64()),
            "label": pa.array(np.asarray(
                t.column("label").to_numpy(zero_copy_only=False),
                dtype=np.float64)[keep]),
        })

    return g.state_dataset("label").map_batches(dec, batch_format="pyarrow")
