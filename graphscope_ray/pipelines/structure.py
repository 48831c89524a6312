"""Structural graph metrics as Dataset pipelines.

Covers the reference's clustering/assortativity/boundary/k-core family
(SURVEY §2.2): local clustering coefficient
(``apps/clustering/clustering.h:286``), average clustering
(``avg_clustering.h:260``), transitivity (``transitivity.h:311``),
degree assortativity (``apps/assortativity/degree_assortativity_
coefficient.h:259``), average degree connectivity
(``average_degree_connectivity.h:250``), node/edge boundary
(``apps/boundary/*.h``), k-core (``apps/kcore/kcore.h:130``) and
k-shell (``kshell.h:139``). All on the undirected simple graph,
composed from triangle counts + degree tables + broadcast semi-joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.pipelines.degree import degree_table
from graphscope_ray.pipelines.triangles import (
    BROADCAST_LIMIT_ROWS,
    _canonical_edges,
    triangle_counts,
)
from graphscope_ray.stages.relational import (
    broadcast_semi_join,
    bucketed_group_apply,
    cogroup_join,
    grouped_agg,
)


def _edge_degrees(canon: ray.data.Dataset,
                  broadcast: bool | None = None) -> ray.data.Dataset:
    """(u, v, du, dv): canonical edges with both endpoint degrees.

    ``broadcast=True`` ships the vertex-degree table once via
    ``ray.put`` (O(V) driver heap); ``False`` attaches degrees with two
    bucketed co-group shuffle joins — no vertex-scale driver state (the
    >BROADCAST_LIMIT_ROWS path); ``None`` auto-selects by vertex count
    (same policy as triangle_counts)."""
    deg = degree_table(canon, mode="both", src="u", dst="v").materialize()
    if broadcast is None:
        broadcast = deg.count() <= BROADCAST_LIMIT_ROWS
    if broadcast:
        deg_df = deg.to_pandas().sort_values("vid")
        ref = ray.put((deg_df["vid"].to_numpy(np.int64),
                       deg_df["degree"].to_numpy(np.int64)))

        def attach(t: pa.Table) -> pa.Table:
            vids, degs = ray.get(ref)
            u = t.column("u").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            return pa.table({
                "u": t.column("u"), "v": t.column("v"),
                "du": pa.array(degs[np.searchsorted(vids, u)], pa.int64()),
                "dv": pa.array(degs[np.searchsorted(vids, v)], pa.int64()),
            })

        return canon.map_batches(attach, batch_format="pyarrow")
    e1 = cogroup_join(
        canon,
        deg.map_batches(lambda t: pa.table({"vid": t.column("vid"),
                                            "du": t.column("degree")}),
                        batch_format="pyarrow"),
        on="u", right_on="vid")
    return cogroup_join(
        e1,
        deg.map_batches(lambda t: pa.table({"vid": t.column("vid"),
                                            "dv": t.column("degree")}),
                        batch_format="pyarrow"),
        on="v", right_on="vid")


def _tri_deg(edges: ray.data.Dataset,
             broadcast: bool | None = None) -> ray.data.Dataset:
    """(vid, triangles, degree) over the undirected simple graph.

    Degree attach follows the broadcast-vs-bucketed-join auto-select
    (BROADCAST_LIMIT_ROWS): broadcast appends per batch; the shuffle
    path co-groups the vertex-scale triangle and degree tables with no
    driver-side vertex state."""
    canon = _canonical_edges(edges).materialize()
    tri = triangle_counts(canon, broadcast_degrees=broadcast,
                          pre_canonical=True)
    deg = degree_table(canon, mode="both", src="u", dst="v").materialize()
    if broadcast is None:
        broadcast = deg.count() <= BROADCAST_LIMIT_ROWS
    if broadcast:
        deg_df = deg.to_pandas().sort_values("vid")
        ref = ray.put((deg_df["vid"].to_numpy(np.int64),
                       deg_df["degree"].to_numpy(np.int64)))

        def add_deg(t: pa.Table) -> pa.Table:
            vids, degs = ray.get(ref)
            v = t.column("vid").to_numpy(zero_copy_only=False)
            return t.append_column(
                "degree", pa.array(degs[np.searchsorted(vids, v)], pa.int64())
            )

        return tri.map_batches(add_deg, batch_format="pyarrow")
    return cogroup_join(tri, deg, on="vid")


def clustering_coefficient(edges: ray.data.Dataset) -> ray.data.Dataset:
    """lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)); 0 when deg < 2
    (networkx semantics, matching gs::Clustering on undirected)."""
    td = _tri_deg(edges)

    def lcc(t: pa.Table) -> pa.Table:
        tri = t.column("triangles").to_numpy(zero_copy_only=False).astype(np.float64)
        deg = t.column("degree").to_numpy(zero_copy_only=False).astype(np.float64)
        denom = deg * (deg - 1.0)
        c = np.where(denom > 0, 2.0 * tri / np.maximum(denom, 1.0), 0.0)
        return pa.table({"vid": t.column("vid"),
                         "clustering": pa.array(c, pa.float64())})

    return td.map_batches(lcc, batch_format="pyarrow")


def average_clustering(edges: ray.data.Dataset, n_vertices: int | None = None
                       ) -> float:
    """Mean lcc over all vertices (vertices absent from the edge set
    count as 0 when ``n_vertices`` is given)."""
    cc = clustering_coefficient(edges)
    tot = 0.0
    cnt = 0
    for b in cc.iter_batches(batch_format="pandas"):
        tot += float(b["clustering"].sum())
        cnt += len(b)
    n = n_vertices if n_vertices is not None else cnt
    return tot / n if n else 0.0


def transitivity(edges: ray.data.Dataset) -> float:
    """3·triangles / open triads = Σ T(v) / Σ C(deg(v), 2)."""
    td = _tri_deg(edges)
    tri_sum = 0.0
    wedge_sum = 0.0
    for b in td.iter_batches(batch_format="pandas"):
        tri_sum += float(b["triangles"].sum())
        d = b["degree"].to_numpy(np.float64)
        wedge_sum += float((d * (d - 1.0) / 2.0).sum())
    return tri_sum / wedge_sum if wedge_sum else 0.0


def degree_assortativity(edges: ray.data.Dataset,
                         broadcast: bool | None = None) -> float:
    """Pearson correlation of endpoint degrees over undirected arcs
    (each edge contributes both orientations, networkx convention).
    Degree attach via _edge_degrees (broadcast-vs-bucketed-join
    auto-select); only 6 scalar moments ever reach the driver."""
    canon = _canonical_edges(edges).materialize()
    ed = _edge_degrees(canon, broadcast=broadcast)

    def moments(t: pa.Table) -> pa.Table:
        du = t.column("du").to_numpy(zero_copy_only=False).astype(np.float64)
        dv = t.column("dv").to_numpy(zero_copy_only=False).astype(np.float64)
        # both orientations: (du,dv) and (dv,du)
        x = np.concatenate([du, dv])
        y = np.concatenate([dv, du])
        return pa.table({
            "n": pa.array([float(len(x))]),
            "sx": pa.array([x.sum()]), "sy": pa.array([y.sum()]),
            "sxx": pa.array([(x * x).sum()]), "syy": pa.array([(y * y).sum()]),
            "sxy": pa.array([(x * y).sum()]),
        })

    agg = ed.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    n, sx, sy = agg["n"], agg["sx"], agg["sy"]
    cov = agg["sxy"] / n - (sx / n) * (sy / n)
    vx = agg["sxx"] / n - (sx / n) ** 2
    vy = agg["syy"] / n - (sy / n) ** 2
    return float(cov / np.sqrt(vx * vy)) if vx > 0 and vy > 0 else float("nan")


def attribute_assortativity(
    edges: ray.data.Dataset,
    attrs: ray.data.Dataset,
    attr_col: str,
) -> float:
    """Attribute (categorical) assortativity coefficient — networkx
    ``attribute_assortativity_coefficient``, reference
    ``apps/assortativity/attribute_assortativity.h:30-323``: build the
    mixing matrix e[x][y] over arcs (both orientations on undirected
    edges), then r = (Σe_ii − Σ a_i·b_i) / (1 − Σ a_i·b_i).

    ``attrs`` is a (vid, attr_col) Dataset; the category vocabulary is
    small but the vid→attr map is vertex-scale, so the pair counting is
    two hash-shuffle joins on vid, and only the |categories|² mixing
    matrix ever reaches the driver."""
    canon = _canonical_edges(edges)
    arcs = canon.map_batches(
        lambda t: pa.table({
            "avid": pa.concat_arrays([t.column("u").combine_chunks(),
                                      t.column("v").combine_chunks()]),
            "other": pa.concat_arrays([t.column("v").combine_chunks(),
                                       t.column("u").combine_chunks()]),
        }),
        batch_format="pyarrow",
    )
    # normalize to Arrow blocks: Project ops (select/rename) on 2.49
    # assume Arrow when chained after a join, and from_pandas datasets
    # carry pandas blocks
    at = attrs.select_columns(["vid", attr_col]).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
    # arc (avid → other) ⋈ attr(avid) = x; rekey by the other endpoint
    # and join its attr = y; partial-count (x, y) per batch
    step1 = arcs.join(
        at, join_type="inner", num_partitions=8,
        on=("avid",), right_on=("vid",),
    ).select_columns(["other", attr_col]).rename_columns(
        {attr_col: "x"}
    )
    step2 = step1.join(
        at.rename_columns({attr_col: "y"}), join_type="inner",
        num_partitions=8, on=("other",), right_on=("vid",),
    )

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["x", "y"], sort=False).size().reset_index(name="n")

    counts = step2.map_batches(partial, batch_format="pandas").to_pandas()
    mix = counts.groupby(["x", "y"], sort=False)["n"].sum().reset_index()
    # exact integer arithmetic until the single final division, so any
    # engine counting the same arcs (incl. the SQL twin) produces the
    # bit-identical coefficient: r = (tr·T − S) / (T² − S) with
    # T = Σn, tr = Σ n_ii, S = Σ_i rowsum_i · colsum_i
    total = int(mix["n"].sum())
    if total == 0:
        return float("nan")
    tr_n = int(mix.loc[mix["x"] == mix["y"], "n"].sum())
    a = mix.groupby("x")["n"].sum()
    b = mix.groupby("y")["n"].sum()
    cats = a.index.union(b.index)
    s = int((a.reindex(cats, fill_value=0).astype(object)
             * b.reindex(cats, fill_value=0).astype(object)).sum())
    denom = total * total - s
    return (tr_n * total - s) / denom if denom else float("nan")


def average_degree_connectivity(edges: ray.data.Dataset,
                                broadcast: bool | None = None
                                ) -> ray.data.Dataset:
    """knn(k) = average neighbor degree over all vertices of degree k
    (networkx average_degree_connectivity): Σ over arcs from deg-k
    sources of dst degree / (k · #deg-k sources). Degree attach via
    _edge_degrees (broadcast-vs-bucketed-join auto-select)."""
    canon = _canonical_edges(edges).materialize()
    ed = _edge_degrees(canon, broadcast=broadcast)

    def arcs(t: pa.Table) -> pa.Table:
        du = t.column("du").to_numpy(zero_copy_only=False)
        dv = t.column("dv").to_numpy(zero_copy_only=False)
        # keep degrees integral: the per-k sums stay exact int64, so
        # the final float division is bit-identical to any other engine
        # summing the same integers (no accumulation-order knife-edge)
        k = np.concatenate([du, dv]).astype(np.int64)
        nbr = np.concatenate([dv, du]).astype(np.int64)
        return pa.table({"k": pa.array(k), "nbr_deg": pa.array(nbr)})

    sums = grouped_agg(
        ed.map_batches(arcs, batch_format="pyarrow"),
        ["k"], {"sum_nbr": ("nbr_deg", "sum"), "n_arcs": (None, "size")},
    )

    def finish(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("sum_nbr").to_numpy(zero_copy_only=False)
        n = t.column("n_arcs").to_numpy(zero_copy_only=False)
        return pa.table({"k": t.column("k"),
                         "avg_nbr_degree": pa.array(s / n, pa.float64())})

    return sums.map_batches(finish, batch_format="pyarrow")


def node_boundary(edges: ray.data.Dataset, s: list) -> ray.data.Dataset:
    """Vertices NOT in S adjacent to a vertex in S (nx semantics,
    apps/boundary/node_boundary.h) — broadcast set membership."""
    canon = _canonical_edges(edges)
    arcs = canon.map_batches(
        lambda t: pa.table({
            "a": pa.concat_arrays([t.column("u").combine_chunks(),
                                   t.column("v").combine_chunks()]),
            "b": pa.concat_arrays([t.column("v").combine_chunks(),
                                   t.column("u").combine_chunks()]),
        }),
        batch_format="pyarrow",
    )
    inside = broadcast_semi_join(arcs, s, on="a")
    outside = broadcast_semi_join(inside, s, on="b", anti=True)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"vid": g["b"].drop_duplicates().to_numpy()})

    return bucketed_group_apply(outside.select_columns(["b"]), ["b"], first, 16)


def edge_boundary(edges: ray.data.Dataset, s: list) -> ray.data.Dataset:
    """Edges with exactly one endpoint in S (u-side in S, nx semantics)."""
    canon = _canonical_edges(edges)
    sref = ray.put(np.asarray(list(s), dtype=np.int64))

    def f(t: pa.Table) -> pa.Table:
        ss = ray.get(sref)
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        inu, inv = np.isin(u, ss), np.isin(v, ss)
        keep = inu ^ inv
        # orient: S-side first
        a = np.where(inu[keep], u[keep], v[keep])
        b = np.where(inu[keep], v[keep], u[keep])
        return pa.table({"u": pa.array(a, pa.int64()),
                         "v": pa.array(b, pa.int64())})

    return canon.map_batches(f, batch_format="pyarrow")


def kcore(edges: ray.data.Dataset, k: int, max_iter: int = 10**6
          ) -> ray.data.Dataset:
    """Vertices of the k-core (maximal subgraph with min degree ≥ k) —
    iterative peeling (gs::KCore): drop deg<k vertices, re-count,
    repeat to fixpoint. Each round = one grouped count + one broadcast
    semi-filter over the shrinking edge set.

    SMALL-GRAPH / TEST-ORACLE variant: the per-round driver degree
    table is O(V) driver heap. The scale path (and the gate route) is
    ``algorithms.kcore_pool`` — BSP peeling on the shard pool; this
    implementation stays as its independent cross-check
    (test_kcore_pool_matches_dataset_peeling)."""
    sub = _canonical_edges(edges).materialize()
    while max_iter:
        max_iter -= 1
        deg_df = degree_table(sub, mode="both", src="u", dst="v").to_pandas()
        if deg_df.empty:
            sub = None
            break
        keep = deg_df.loc[deg_df["degree"] >= k, "vid"].to_numpy(np.int64)
        if len(keep) == len(deg_df):
            break
        if len(keep) == 0:
            sub = None
            break
        sub = broadcast_semi_join(
            broadcast_semi_join(sub, keep, on="u"), keep, on="v"
        ).materialize()
        if sub.count() == 0:
            sub = None
            break
    if sub is None:
        return ray.data.from_arrow(pa.table({"vid": pa.array([], pa.int64())}))
    deg_df = degree_table(sub, mode="both", src="u", dst="v").to_pandas()
    if deg_df.empty:
        return ray.data.from_arrow(pa.table({"vid": pa.array([], pa.int64())}))
    keep = np.sort(deg_df.loc[deg_df["degree"] >= k, "vid"].to_numpy(np.int64))
    return ray.data.from_arrow(pa.table({"vid": pa.array(keep, pa.int64())}))


def kshell(edges: ray.data.Dataset, k: int) -> ray.data.Dataset:
    """k-shell = in k-core but not in (k+1)-core (gs::KShell) — a
    distributed side-tagged anti-join over the two core memberships (no
    driver-side vertex sets). This edge-Dataset variant exists for the
    graph-less API; ``algorithms.kshell_pool`` (two BSP peels on the
    shard pool) is the scale path and serves the gate."""

    def side(v: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_side", pa.array(np.full(t.num_rows, v, np.int8)))

        return f

    lo = kcore(edges, k).map_batches(side(0), batch_format="pyarrow")
    hi = kcore(edges, k + 1).map_batches(side(1), batch_format="pyarrow")

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        drop = g.loc[g["_side"] == 1, "vid"]
        keep = g.loc[(g["_side"] == 0) & ~g["vid"].isin(drop), "vid"]
        return pd.DataFrame({"vid": keep.to_numpy(np.int64)})

    return bucketed_group_apply(lo.union(hi), ["vid"], anti, num_buckets=16)


def densest_subgraph_approx(graph, edges: ray.data.Dataset):
    """Densest-subgraph 2-approximation (FLASH
    apps/flash/subgraph/densest-sub-2-approx.h:44-93): the max-core
    subgraph. Returns ``(density, members)`` where members is a (vid)
    Dataset of max-core vertices and density mirrors the reference's
    value exactly — ordered internal pairs / vertices, i.e. the average
    degree 2·E_in/|V_in| of the subgraph (a 2-approx of max E/V by the
    classic peeling argument). Core numbers come from the incremental
    BSP peel (``algorithms.core_decomposition``); the internal-edge
    count is two bucketed co-group joins on the canonical edge list —
    no vertex-scale driver state."""
    import pyarrow.compute as pc

    from graphscope_ray.pipelines.algorithms import core_decomposition
    from graphscope_ray.stages.relational import cogroup_join

    cores = core_decomposition(graph).materialize()
    kmax = cores.max("core")
    members = cores.map_batches(
        lambda t: t.filter(pc.equal(t.column("core"), kmax))
                   .select(["vid"]),
        batch_format="pyarrow").materialize()
    nv = members.count()
    canon = _canonical_edges(edges)
    e1 = cogroup_join(canon, members.map_batches(
        lambda t: t.append_column("_mu", pa.array(
            np.ones(t.num_rows, np.int8))), batch_format="pyarrow"),
        on="u", right_on="vid")
    e2 = cogroup_join(e1, members.map_batches(
        lambda t: t.append_column("_mv", pa.array(
            np.ones(t.num_rows, np.int8))), batch_format="pyarrow"),
        on="v", right_on="vid")
    e_in = e2.count()  # inner joins: both endpoints in the max core
    density = (2.0 * e_in / nv) if nv else 0.0
    return density, members


def numeric_assortativity(
    edges: ray.data.Dataset,
    attrs: ray.data.Dataset,
    attr_col: str,
) -> float:
    """Numeric assortativity — Pearson correlation of a numeric vertex
    attribute across edge endpoints (both orientations; networkx
    numeric_assortativity_coefficient, the reference's
    apps/assortativity/attribute_assortativity.h ctx.numeric=true
    path). Attribute attach = two co-group joins on vid; only six
    scalar moments reach the driver."""
    canon = _canonical_edges(edges)
    a1 = cogroup_join(canon, attrs.map_batches(
        lambda t: pa.table({"vid": t.column("vid"),
                            "xu": t.column(attr_col).cast(pa.float64())}),
        batch_format="pyarrow"), on="u", right_on="vid")
    a2 = cogroup_join(a1, attrs.map_batches(
        lambda t: pa.table({"vid": t.column("vid"),
                            "xv": t.column(attr_col).cast(pa.float64())}),
        batch_format="pyarrow"), on="v", right_on="vid")

    def moments(t: pa.Table) -> pa.Table:
        xu = t.column("xu").to_numpy(zero_copy_only=False)
        xv = t.column("xv").to_numpy(zero_copy_only=False)
        x = np.concatenate([xu, xv])
        y = np.concatenate([xv, xu])
        return pa.table({
            "n": pa.array([float(len(x))]),
            "sx": pa.array([x.sum()]), "sy": pa.array([y.sum()]),
            "sxx": pa.array([(x * x).sum()]),
            "syy": pa.array([(y * y).sum()]),
            "sxy": pa.array([(x * y).sum()]),
        })

    agg = a2.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    n, sx, sy = agg["n"], agg["sx"], agg["sy"]
    cov = agg["sxy"] / n - (sx / n) * (sy / n)
    vx = agg["sxx"] / n - (sx / n) ** 2
    vy = agg["syy"] / n - (sy / n) ** 2
    return float(cov / np.sqrt(vx * vy)) if vx > 0 and vy > 0 else float("nan")
