"""Small-subgraph (motif) counting — the FLASH subgraph family.

Reference semantics: apps/flash/subgraph/{rectangle,diamond,
tailed-triangle,3-path,k-clique}.h. All counts are over the undirected
simple graph (self-loops dropped, parallel edges deduped), exact:

- rectangle (C4): Chiba–Nishizeki degree-ordered wedge pairs —
  Σ_{v <ᵒ o} C(W(v,o), 2) with W = #common neighbors m with m <ᵒ o
  (rectangle.h:49-78; each 4-cycle counted once at its (deg,id)-max
  corner o and its opposite corner v).
- diamond: Σ_edges C(codeg, 2) (diamond.h:50-85 — pairs of common
  neighbors of an edge; K4s count per the reference's own convention).
- tailed triangle: Σ_edges codeg·(deg_u + deg_v − 4) / 2
  (tailed-triangle.h:47-79).
- 3-path (simple paths on 4 distinct vertices): Σ_edges
  (deg_u−1)(deg_v−1) − codeg (3-path.h:48-77 — per middle edge).
- k-clique: recursive intersection over the (deg,id)-oriented DAG
  (k-clique.h:49-93).

The shared ingredient is ``edge_codegree``: per-edge triangle counts
from the same degree-oriented wedge-close shuffle as
``pipelines/triangles.py`` (hits keyed by EDGE instead of vertex).
Everything shuffles compact int64 rows; degree attachment broadcasts
under BROADCAST_LIMIT_ROWS and falls back to bucketed cogroup joins
above it (the same auto-select as triangle_counts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.pipelines.triangles import (
    BROADCAST_LIMIT_ROWS,
    CSR_BROADCAST_LIMIT_ROWS,
    _canonical_edges,
    _resolve,
)

_EDGE = np.int64(-1)


def _deg_table(canon: ray.data.Dataset) -> ray.data.Dataset:
    from graphscope_ray.stages.relational import grouped_agg

    def endpoints(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"vid": pa.array(np.concatenate([u, v]), pa.int64())})

    return grouped_agg(
        canon.map_batches(endpoints, batch_format="pyarrow"),
        ["vid"], {"degree": (None, "size")},
    ).materialize()


def _with_degrees(canon: ray.data.Dataset, deg_ds: ray.data.Dataset,
                  broadcast: bool | None) -> ray.data.Dataset:
    """(u, v) → (u, v, du, dv): broadcast lookup under the row cap,
    two bucketed cogroup joins above it (no vertex-scale driver state
    on the big-graph path)."""
    from graphscope_ray.stages.relational import cogroup_join

    if broadcast is None:
        broadcast = deg_ds.count() <= BROADCAST_LIMIT_ROWS
    if broadcast:
        deg_df = deg_ds.to_pandas().sort_values("vid")
        ref = ray.put((deg_df["vid"].to_numpy(np.int64),
                       deg_df["degree"].to_numpy(np.int64)))

        def attach(t: pa.Table) -> pa.Table:
            vids, degs = _resolve(ref)
            u = t.column("u").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            return t.append_column(
                "du", pa.array(degs[np.searchsorted(vids, u)], pa.int64())
            ).append_column(
                "dv", pa.array(degs[np.searchsorted(vids, v)], pa.int64()))

        return canon.map_batches(attach, batch_format="pyarrow")
    e1 = cogroup_join(
        canon,
        deg_ds.map_batches(
            lambda t: pa.table({"vid": t.column("vid"),
                                "du": t.column("degree")}),
            batch_format="pyarrow"),
        on="u", right_on="vid")
    return cogroup_join(
        e1,
        deg_ds.map_batches(
            lambda t: pa.table({"vid": t.column("vid"),
                                "dv": t.column("degree")}),
            batch_format="pyarrow"),
        on="v", right_on="vid")


def _orient(with_deg: ray.data.Dataset) -> ray.data.Dataset:
    """(u, v, du, dv) → (a, b, da, db) arcs oriented low→high by the
    (degree, vid) total order."""

    def orient(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        du = t.column("du").to_numpy(zero_copy_only=False)
        dv = t.column("dv").to_numpy(zero_copy_only=False)
        uf = (du < dv) | ((du == dv) & (u < v))
        return pa.table({
            "a": pa.array(np.where(uf, u, v), pa.int64()),
            "b": pa.array(np.where(uf, v, u), pa.int64()),
            "da": pa.array(np.where(uf, du, dv), pa.int64()),
            "db": pa.array(np.where(uf, dv, du), pa.int64()),
        })

    return with_deg.map_batches(orient, batch_format="pyarrow")


def edge_codegree(edges: ray.data.Dataset,
                  broadcast_degrees: bool | None = None
                  ) -> ray.data.Dataset:
    """Per-edge common-neighbor (triangle) counts: (u, v, codeg, du,
    dv), one row per distinct undirected edge, u < v by vid. The
    wedge-close shuffle of triangles.py with hits keyed by edge."""
    from graphscope_ray.stages.relational import (
        bucketed_group_apply,
        grouped_agg,
    )

    canon = _canonical_edges(edges).materialize()
    deg_ds = _deg_table(canon)
    withd = _with_degrees(canon, deg_ds, broadcast_degrees).materialize()
    oriented = _orient(withd).materialize()

    def wedges_of(g: pd.DataFrame) -> pd.DataFrame:
        m = g[["a", "b", "db"]].merge(g[["a", "b", "db"]], on="a")
        bx = m["b_x"].to_numpy(np.int64)
        by = m["b_y"].to_numpy(np.int64)
        dx = m["db_x"].to_numpy(np.int64)
        dy = m["db_y"].to_numpy(np.int64)
        keep = (dx < dy) | ((dx == dy) & (bx < by))
        return pd.DataFrame({"x": bx[keep], "y": by[keep],
                             "center": m["a"].to_numpy(np.int64)[keep]})

    wedges = bucketed_group_apply(
        oriented.select_columns(["a", "b", "db"]), ["a"], wedges_of,
        num_buckets=64)

    def as_edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "x": t.column("a"), "y": t.column("b"),
            "center": pa.array(np.full(t.num_rows, _EDGE), pa.int64())})

    edge_rows = oriented.select_columns(["a", "b"]).map_batches(
        as_edge_rows, batch_format="pyarrow")

    def close(g: pd.DataFrame) -> pd.DataFrame:
        """Each closed wedge (center—x, center—y, x—y) increments all
        three edges' codegrees, keys canonical (min, max) by vid."""
        is_edge = g["center"].to_numpy(np.int64) == _EDGE
        edge_pairs = g.loc[is_edge, ["x", "y"]].drop_duplicates()
        tri = g.loc[~is_edge].merge(edge_pairs, on=["x", "y"])
        if not len(tri):
            return pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                                 "v": pd.Series([], dtype=np.int64),
                                 "cnt": pd.Series([], dtype=np.int64)})
        c = tri["center"].to_numpy(np.int64)
        x = tri["x"].to_numpy(np.int64)
        y = tri["y"].to_numpy(np.int64)
        eu = np.concatenate([np.minimum(c, x), np.minimum(c, y),
                             np.minimum(x, y)])
        ev = np.concatenate([np.maximum(c, x), np.maximum(c, y),
                             np.maximum(x, y)])
        return pd.DataFrame({"u": eu, "v": ev,
                             "cnt": np.ones(len(eu), dtype=np.int64)})

    hits = bucketed_group_apply(
        wedges.union(edge_rows), ["x", "y"], close, num_buckets=64)

    zeros = withd.map_batches(
        lambda t: pa.table({"u": t.column("u"), "v": t.column("v"),
                            "cnt": pa.array(np.zeros(t.num_rows, np.int64))}),
        batch_format="pyarrow")
    codeg = grouped_agg(hits.union(zeros), ["u", "v"],
                        {"codeg": ("cnt", "sum")})
    # re-attach endpoint degrees (same broadcast/shuffle auto-select)
    return _with_degrees(codeg, deg_ds, broadcast_degrees)


def _sum_expr(codeg_ds: ray.data.Dataset, fn) -> int:
    part = codeg_ds.map_batches(
        lambda t: pa.table({"s": pa.array([int(fn(
            t.column("codeg").to_numpy(zero_copy_only=False),
            t.column("du").to_numpy(zero_copy_only=False),
            t.column("dv").to_numpy(zero_copy_only=False)).sum())],
            pa.int64())}),
        batch_format="pyarrow")
    return int(part.sum("s") or 0)


def diamond_count(edges: ray.data.Dataset,
                  codeg_ds: ray.data.Dataset | None = None) -> int:
    """Diamonds = Σ_edges C(codeg, 2) (diamond.h:50-85)."""
    ds = codeg_ds if codeg_ds is not None else edge_codegree(edges)
    return _sum_expr(ds, lambda c, du, dv: c * (c - 1) // 2)


def tailed_triangle_count(edges: ray.data.Dataset,
                          codeg_ds: ray.data.Dataset | None = None) -> int:
    """Tailed triangles = Σ_edges codeg·(du+dv−4) / 2
    (tailed-triangle.h:47-79; each tailed triangle lands on the two
    triangle edges at the tail vertex, hence the halving)."""
    ds = codeg_ds if codeg_ds is not None else edge_codegree(edges)
    return _sum_expr(ds, lambda c, du, dv: c * (du + dv - 4)) // 2


def three_path_count(edges: ray.data.Dataset,
                     codeg_ds: ray.data.Dataset | None = None) -> int:
    """Simple 3-edge paths = Σ_edges (du−1)(dv−1) − codeg, one count
    per middle edge (3-path.h:48-77)."""
    ds = codeg_ds if codeg_ds is not None else edge_codegree(edges)
    return _sum_expr(ds, lambda c, du, dv: (du - 1) * (dv - 1) - c)


def rectangle_count(edges: ray.data.Dataset,
                    broadcast_degrees: bool | None = None,
                    num_buckets: int = 64) -> int:
    """4-cycles via Chiba–Nishizeki wedge pairs (rectangle.h:49-78):
    wedges v—m—o with o >ᵒ v and o >ᵒ m, grouped by the (v, o)
    diagonal; Σ C(W, 2). Wedge volume is Σ_m deg(m)·|N⁺(m)| rows of
    two int64s — the same order the reference's per-vertex loop walks,
    but shuffled instead of replicated."""
    from graphscope_ray.stages.relational import (
        bucketed_group_apply,
        grouped_agg,
    )

    canon = _canonical_edges(edges).materialize()
    deg_ds = _deg_table(canon)
    withd = _with_degrees(canon, deg_ds, broadcast_degrees)
    oriented = _orient(withd).materialize()

    # arcs keyed by the wedge middle m: every neighbor v (either
    # direction, with its degree) + every sup-neighbor o (= oriented
    # out-arc). kind 0 = any neighbor, 1 = sup neighbor.
    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("da").to_numpy(zero_copy_only=False)
        db = t.column("db").to_numpy(zero_copy_only=False)
        m = np.concatenate([a, b, a])
        w = np.concatenate([b, a, b])
        dw = np.concatenate([db, da, db])
        kind = np.concatenate([
            np.zeros(2 * len(a), np.int8), np.ones(len(a), np.int8)])
        return pa.table({"m": pa.array(m, pa.int64()),
                         "w": pa.array(w, pa.int64()),
                         "dw": pa.array(dw, pa.int64()),
                         "kind": pa.array(kind, pa.int8())})

    arcs = oriented.map_batches(both_dirs, batch_format="pyarrow")

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sup = g[g["kind"] == 1]
        anyn = g[g["kind"] == 0]
        mm = anyn[["m", "w", "dw"]].merge(
            sup[["m", "w", "dw"]], on="m", suffixes=("_v", "_o"))
        v = mm["w_v"].to_numpy(np.int64)
        o = mm["w_o"].to_numpy(np.int64)
        dv = mm["dw_v"].to_numpy(np.int64)
        do = mm["dw_o"].to_numpy(np.int64)
        keep = (dv < do) | ((dv == do) & (v < o))
        return pd.DataFrame({"v": v[keep], "o": o[keep]})

    wedges = bucketed_group_apply(arcs, ["m"], wedge_pairs,
                                  num_buckets=num_buckets)
    pair_w = grouped_agg(wedges, ["v", "o"], {"w": (None, "size")})
    part = pair_w.map_batches(
        lambda t: pa.table({"s": pa.array([int((lambda w: w * (w - 1) // 2)(
            t.column("w").to_numpy(zero_copy_only=False)).sum())],
            pa.int64())}),
        batch_format="pyarrow")
    return int(part.sum("s") or 0)


def k_clique_count(edges: ray.data.Dataset, k: int) -> int:
    """k-cliques by recursive candidate intersection over the
    (deg, id)-oriented DAG (k-clique.h:49-93). The oriented CSR is
    broadcast once (``ray.put``) and every task walks its own vertex
    block — the same replication the reference's GetV random access
    relies on, capped at CSR_BROADCAST_LIMIT_ROWS arcs (beyond that a
    bucketed 2-hop-subgraph exchange would be needed)."""
    if k < 2:
        raise ValueError("k_clique_count needs k >= 2")
    canon = _canonical_edges(edges).materialize()
    deg_ds = _deg_table(canon)
    withd = _with_degrees(canon, deg_ds, True)
    oriented = _orient(withd).materialize()
    n_arcs = oriented.count()
    if n_arcs == 0:
        return 0
    if n_arcs > CSR_BROADCAST_LIMIT_ROWS:
        raise ValueError(
            f"k_clique_count: oriented arcs {n_arcs} exceed the CSR "
            f"broadcast cap {CSR_BROADCAST_LIMIT_ROWS}")
    if k == 2:
        return n_arcs

    odf = oriented.select_columns(["a", "b"]).to_pandas()
    deg_df = deg_ds.to_pandas().sort_values("vid")
    vkeys = deg_df["vid"].to_numpy(np.int64)
    nv = len(vkeys)
    a_loc = np.searchsorted(vkeys, odf["a"].to_numpy(np.int64))
    b_loc = np.searchsorted(vkeys, odf["b"].to_numpy(np.int64))
    order = np.lexsort((b_loc, a_loc))
    a_s, b_s = a_loc[order], b_loc[order]
    indptr = np.zeros(nv + 1, np.int64)
    np.cumsum(np.bincount(a_s, minlength=nv), out=indptr[1:])
    csr_ref = ray.put((indptr, b_s.astype(np.int32)))

    def count_block(t: pa.Table) -> pa.Table:
        ptr, nbrs = _resolve(csr_ref)

        def rec(cand: np.ndarray, depth: int) -> int:
            # cand is sorted unique; depth = clique size so far
            if depth == k - 1:
                return len(cand)
            total = 0
            for u in cand:
                nu = nbrs[ptr[u]:ptr[u + 1]]
                c = np.intersect1d(nu, cand, assume_unique=True)
                if len(c) >= k - depth - 1:
                    total += rec(c, depth + 1)
            return total

        vids = t.column("vid").to_numpy(zero_copy_only=False)
        locs = np.searchsorted(vkeys, vids)
        s = 0
        for lo in locs:
            out = nbrs[ptr[lo]:ptr[lo + 1]]
            if len(out) >= k - 1:
                s += rec(out, 1)
        return pa.table({"s": pa.array([s], pa.int64())})

    part = deg_ds.select_columns(["vid"]).map_batches(
        count_block, batch_format="pyarrow")
    return int(part.sum("s") or 0)


def directed_triangle_plus_census(edges: ray.data.Dataset) -> dict:
    """The FLASH bidirectional-edge triangle family over distinct arcs
    (self-loops dropped):

    - ``in_plus``   Σ over unordered mutual pairs {s,d} (s↔d) of
      |out(s) ∩ out(d)|  (in-triangle.h:47-70 — both point at x)
    - ``out_plus``  Σ over mutual pairs of |in(s) ∩ in(d)|
      (out-triangle.h:47-70 — x points at both)
    - ``cycle_plus`` Σ over ORDERED mutual arcs (s→d) of
      |in(s) ∩ out(d)| (cycle-plus-triangle.h:48-72 — the cycle
      d→x→s→d plus the back edge)

    The totals are orientation-invariant (the reference's (deg,id)
    check only picks which endpoint tallies), so each unordered pair
    is intersected once. Adjacency CSRs broadcast once (documented
    CSR_BROADCAST_LIMIT_ROWS cap, like k_clique_count); per-edge
    intersections run vectorized against them."""
    import pyarrow.compute as pc

    from graphscope_ray.stages.relational import dedup_first

    arcs = dedup_first(
        edges.map_batches(
            lambda t: pa.table({"src": t.column("src").cast(pa.int64()),
                                "dst": t.column("dst").cast(pa.int64())}),
            batch_format="pyarrow"
        ).map_batches(
            lambda t: t.filter(pc.invert(pc.equal(t.column("src"),
                                                  t.column("dst")))),
            batch_format="pyarrow"),
        ["src", "dst"]).materialize()
    n_arcs = arcs.count()
    if n_arcs == 0:
        return {"in_plus": 0, "out_plus": 0, "cycle_plus": 0}
    if n_arcs > CSR_BROADCAST_LIMIT_ROWS:
        raise ValueError(
            f"directed_triangle_plus_census: {n_arcs} arcs exceed the "
            f"CSR broadcast cap {CSR_BROADCAST_LIMIT_ROWS}")

    adf = arcs.to_pandas()
    src = adf["src"].to_numpy(np.int64)
    dst = adf["dst"].to_numpy(np.int64)
    vkeys = np.unique(np.concatenate([src, dst]))
    nv = len(vkeys)
    s_loc = np.searchsorted(vkeys, src).astype(np.int64)
    d_loc = np.searchsorted(vkeys, dst).astype(np.int64)

    def csr(keys, vals):
        order = np.lexsort((vals, keys))
        k, v = keys[order], vals[order]
        ptr = np.zeros(nv + 1, np.int64)
        np.cumsum(np.bincount(k, minlength=nv), out=ptr[1:])
        return ptr, v.astype(np.int32)

    out_ptr, out_nb = csr(s_loc, d_loc)
    in_ptr, in_nb = csr(d_loc, s_loc)
    # mutual arcs: (s,d) with (d,s) present — sorted-key membership
    key = s_loc * nv + d_loc
    rkey = d_loc * nv + s_loc
    mutual = np.isin(rkey, key)
    ms, md = s_loc[mutual], d_loc[mutual]   # ordered mutual arcs
    csr_ref = ray.put((out_ptr, out_nb, in_ptr, in_nb, ms, md))

    def count_block(t: pa.Table) -> pa.Table:
        op, on, ip, inb, s_, d_ = _resolve(csr_ref)
        lo = int(t.column("lo")[0].as_py())
        hi = int(t.column("hi")[0].as_py())
        inp = outp = cycp = 0
        for j in range(lo, hi):
            a, b = s_[j], d_[j]
            if a < b:  # unordered-pair families once per pair
                inp += len(np.intersect1d(on[op[a]:op[a + 1]],
                                          on[op[b]:op[b + 1]],
                                          assume_unique=True))
                outp += len(np.intersect1d(inb[ip[a]:ip[a + 1]],
                                           inb[ip[b]:ip[b + 1]],
                                           assume_unique=True))
            cycp += len(np.intersect1d(inb[ip[a]:ip[a + 1]],
                                       on[op[b]:op[b + 1]],
                                       assume_unique=True))
        return pa.table({"inp": pa.array([inp], pa.int64()),
                         "outp": pa.array([outp], pa.int64()),
                         "cycp": pa.array([cycp], pa.int64())})

    m = len(ms)
    if m == 0:
        return {"in_plus": 0, "out_plus": 0, "cycle_plus": 0}
    bounds = np.linspace(0, m, min(64, m) + 1, dtype=np.int64)
    spans = ray.data.from_arrow(pa.table({
        "lo": pa.array(bounds[:-1], pa.int64()),
        "hi": pa.array(bounds[1:], pa.int64())})).repartition(min(64, m))
    part = spans.map_batches(count_block, batch_size=1,
                             batch_format="pyarrow")
    agg = part.to_pandas().sum()
    return {"in_plus": int(agg["inp"]), "out_plus": int(agg["outp"]),
            "cycle_plus": int(agg["cycp"])}


def directed_clustering(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Directed local clustering coefficient (grape::LCCDirected,
    registered as ``lcc_directed`` in .gs_conf.yaml:95-99; networkx
    DiGraph semantics, Fagiolo 2007):

        c(v) = T(v) / (d_tot(v)·(d_tot(v)−1) − 2·d_recip(v))

    with T(v) = Σ over unordered support triangles at v of
    b(e1)·b(e2)·b(e3), where b(x,y) ∈ {1, 2} is the number of arc
    directions present between x and y — equal to ½·(A+Aᵀ)³_vv, the
    directed-triangle count networkx uses. d_tot = in+out degree,
    d_recip = #reciprocated neighbors; c = 0 when the denominator is.

    Pipeline: distinct arcs → b-weighted support edges → the same
    degree-oriented wedge-close shuffle as triangle_counts, but each
    closed wedge contributes b_cx·b_cy·b_xy to all three corners.
    Returns (vid, clustering) over every arc endpoint.
    """
    from graphscope_ray.stages.relational import (
        bucketed_group_apply,
        cogroup_join,
        dedup_first,
        grouped_agg,
    )

    def drop_loops(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.not_equal(t.column("src"), t.column("dst")))

    arcs = dedup_first(
        edges.select_columns(["src", "dst"]).map_batches(
            drop_loops, batch_format="pyarrow"),
        ["src", "dst"])

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": pa.array(np.minimum(s, d)),
                         "v": pa.array(np.maximum(s, d)),
                         "cnt": pa.array(np.ones(len(s), np.int64))})

    # b = directions present per support edge (1 or 2)
    bedges = grouped_agg(arcs.map_batches(canon, batch_format="pyarrow"),
                         ["u", "v"], {"b": ("cnt", "sum")}).materialize()

    # per-vertex: support degree (orientation), d_tot = Σ b,
    # d_recip = #(b == 2)
    def vrows(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "vid": pa.array(np.concatenate([u, v]), pa.int64()),
            "one": pa.array(np.ones(2 * len(u), np.int64)),
            "b": pa.array(np.concatenate([b, b]), pa.int64()),
            "recip": pa.array(
                np.concatenate([b, b]) == 2).cast(pa.int64()),
        })

    vstats = grouped_agg(
        bedges.map_batches(vrows, batch_format="pyarrow"), ["vid"],
        {"degree": ("one", "sum"), "dtot": ("b", "sum"),
         "drecip": ("recip", "sum")}).materialize()

    deg_only = vstats.select_columns(["vid", "degree"])
    # rename the edge weight before degree attach/orient so it can't
    # clash with the oriented endpoint column named b
    bw_edges = bedges.map_batches(
        lambda t: pa.table({"u": t.column("u"), "v": t.column("v"),
                            "bw": t.column("b").cast(pa.int64())}),
        batch_format="pyarrow")
    withd = _with_degrees(bw_edges, deg_only, None).materialize()

    def orient_bw(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        du = t.column("du").to_numpy(zero_copy_only=False)
        dv = t.column("dv").to_numpy(zero_copy_only=False)
        uf = (du < dv) | ((du == dv) & (u < v))
        return pa.table({
            "a": pa.array(np.where(uf, u, v), pa.int64()),
            "b": pa.array(np.where(uf, v, u), pa.int64()),
            "db": pa.array(np.where(uf, dv, du), pa.int64()),
            "bw": t.column("bw"),
        })

    oriented = withd.map_batches(orient_bw, batch_format="pyarrow")

    def wedges_of(g: pd.DataFrame) -> pd.DataFrame:
        m = g[["a", "b", "db", "bw"]].merge(g[["a", "b", "db", "bw"]],
                                            on="a")
        bx = m["b_x"].to_numpy(np.int64)
        by = m["b_y"].to_numpy(np.int64)
        dx = m["db_x"].to_numpy(np.int64)
        dy = m["db_y"].to_numpy(np.int64)
        keep = (dx < dy) | ((dx == dy) & (bx < by))
        return pd.DataFrame({
            "x": bx[keep], "y": by[keep],
            "center": m["a"].to_numpy(np.int64)[keep],
            "w": (m["bw_x"].to_numpy(np.int64)
                  * m["bw_y"].to_numpy(np.int64))[keep]})

    wedges = bucketed_group_apply(
        oriented.select_columns(["a", "b", "db", "bw"]), ["a"],
        wedges_of, num_buckets=64)

    def edge_rows(t: pa.Table) -> pa.Table:
        # keys must be in the same (deg, vid) order as the wedge pairs
        return pa.table({
            "x": t.column("a"), "y": t.column("b"),
            "center": pa.array(np.full(t.num_rows, _EDGE), pa.int64()),
            "w": t.column("bw").cast(pa.int64())})

    closing = oriented.map_batches(edge_rows, batch_format="pyarrow")

    def close(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["center"].to_numpy(np.int64) == _EDGE
        ew = (g.loc[is_edge, ["x", "y", "w"]]
              .drop_duplicates(["x", "y"])
              .rename(columns={"w": "wxy"}))
        tri = g.loc[~is_edge].merge(ew, on=["x", "y"])
        if not len(tri):
            return pd.DataFrame({"vid": pd.Series([], dtype=np.int64),
                                 "t": pd.Series([], dtype=np.int64)})
        w = (tri["w"].to_numpy(np.int64)
             * tri["wxy"].to_numpy(np.int64))
        vid = np.concatenate([tri["center"].to_numpy(np.int64),
                              tri["x"].to_numpy(np.int64),
                              tri["y"].to_numpy(np.int64)])
        return pd.DataFrame({"vid": vid, "t": np.tile(w, 3)})

    hits = bucketed_group_apply(wedges.union(closing), ["x", "y"],
                                close, num_buckets=64)
    # T over EVERY endpoint (triangle-less vertices get 0), so the
    # inner cogroup join below keeps all vertices
    zeros = vstats.map_batches(
        lambda t: pa.table({"vid": t.column("vid"),
                            "t": pa.array(np.zeros(t.num_rows,
                                                   np.int64))}),
        batch_format="pyarrow")
    tsum = grouped_agg(hits.union(zeros), ["vid"], {"t": ("t", "sum")})
    joined = cogroup_join(vstats, tsum, on="vid", right_on="vid")

    def cc(t: pa.Table) -> pa.Table:
        dtot = t.column("dtot").to_numpy(zero_copy_only=False
                                         ).astype(np.float64)
        drec = t.column("drecip").to_numpy(zero_copy_only=False
                                           ).astype(np.float64)
        tv = t.column("t").to_numpy(zero_copy_only=False
                                    ).astype(np.float64)
        denom = dtot * (dtot - 1.0) - 2.0 * drec
        c = np.where((denom > 0) & (tv > 0),
                     tv / np.maximum(denom, 1.0), 0.0)
        return pa.table({"vid": t.column("vid"),
                         "clustering": pa.array(c, pa.float64())})

    return joined.map_batches(cc, batch_format="pyarrow")
