"""GraphAr-format graph save/load (Apache GraphAr spec v1 subset).

Mirrors the reference's ``Graph.save_to(format="graphar")`` /
``Graph.load_from("graphar+file://…")`` surface
(``python/graphscope/framework/graph.py:1171-1347``; format described
in ``docs/storage_engine/graphar.md``), re-expressed Ray-Data-first:

- ``save_graphar``: writes the standard layout — ``<name>.graph.yml``
  + per-label ``<label>.vertex.yml`` / ``<s>_<e>_<d>.edge.yml`` meta,
  vertex property chunks of ``vertex_chunk_size`` rows under
  ``vertex/<label>/<group>/chunk<k>``, CSR-style
  ``ordered_by_source`` adjacency chunks of ``edge_chunk_size`` rows
  under ``edge/<s>_<e>_<d>/ordered_by_source/adj_list/part<i>/chunk<j>``
  (part ``i`` = source-vertex chunk ``i``), per-part offset chunks and
  ``vertex_count`` / ``edge_count<i>`` count files.  GraphAr adjacency
  references vertices by their dense internal index (rank in ascending
  original-id order) with the standard ``_graphArSrcIndex`` /
  ``_graphArDstIndex`` column names.
- ``load_graphar``: reads a GraphAr directory (ours or one following
  the same public spec, ``.graph.yml`` or the reference's
  ``.graph.yaml`` suffix) back into ``(edges, vertices)`` Datasets
  with ORIGINAL ids restored.

Scale shape: the vertex table is ranked with one sort + O(#blocks)
driver offsets (never row data on the driver); edges acquire ranks via
two bucketed co-group joins; chunk files are written inside
``bucketed_group_apply`` workers (whole chunk per call, one file per
chunk — resumable, never one giant file).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

SRC_COL = "_graphArSrcIndex"
DST_COL = "_graphArDstIndex"
OFFSET_COL = "_graphArOffset"
VERSION = "gar/v1"


# --------------------------------------------------------------- save
def _ranked_vertices(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct endpoint vids, ascending, + dense ``rank`` 0..n-1
    (GraphAr internal vertex index). Driver holds O(#blocks) ints."""
    from graphscope_ray.stages.relational import dedup_first

    def endpoints(t: pa.Table) -> pa.Table:
        v = np.unique(np.concatenate([
            t.column("src").to_numpy(zero_copy_only=False),
            t.column("dst").to_numpy(zero_copy_only=False)]))
        return pa.table({"vid": pa.array(v.astype(np.int64))})

    verts = dedup_first(
        edges.map_batches(endpoints, batch_format="pyarrow"), ["vid"]
    ).sort("vid").materialize()
    refs = verts.to_arrow_refs()

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)

    @ray.remote
    def _rank(t: pa.Table, base: int) -> pa.Table:
        return pa.table({
            "vid": t.column("vid").cast(pa.int64()),
            "rank": pa.array(base + np.arange(t.num_rows, dtype=np.int64)),
        })

    return ray.data.from_arrow_refs(
        [_rank.remote(t, int(offsets[i])) for i, t in enumerate(refs)])


def save_graphar(
    edges: ray.data.Dataset,
    path: str,
    name: str = "graph",
    vertex_label: str = "vertex",
    edge_label: str = "edge",
    vertex_chunk_size: int = 2**18,
    edge_chunk_size: int = 2**22,
    weight_col: str | None = None,
    directed: bool = False,
) -> str:
    """Write ``edges`` (src, dst[, weight]) as a GraphAr directory;
    returns the graph-info yml path (the reference's save_to returns
    the same URI payload)."""
    from graphscope_ray.stages.relational import (
        bucketed_group_apply,
        cogroup_join,
    )

    os.makedirs(path, exist_ok=True)
    vprefix = f"vertex/{vertex_label}/"
    etriple = f"{vertex_label}_{edge_label}_{vertex_label}"
    eprefix = f"edge/{etriple}/"
    adjdir = os.path.join(path, eprefix, "ordered_by_source")

    verts = _ranked_vertices(edges).materialize()
    n_vertices = verts.count()

    # ---- vertex property chunks (one file per chunk, whole chunk per
    # worker call via the co-located bucket guarantee)
    vdir = os.path.join(path, vprefix, "id")
    os.makedirs(vdir, exist_ok=True)

    def tag_vchunk(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy(zero_copy_only=False)
        return t.append_column(
            "chunk", pa.array(r // np.int64(vertex_chunk_size)))

    def write_vchunk(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for ck, grp in g.groupby("chunk", sort=True):
            grp = grp.sort_values("rank")
            pq.write_table(
                pa.table({"id": pa.array(grp["vid"].to_numpy(np.int64))}),
                os.path.join(vdir, f"chunk{int(ck)}"))
            out.append((int(ck), len(grp)))
        return pd.DataFrame(out or [(0, 0)], columns=["chunk", "rows"])

    bucketed_group_apply(
        verts.map_batches(tag_vchunk, batch_format="pyarrow"),
        ["chunk"], write_vchunk).materialize()
    with open(os.path.join(path, vprefix, "vertex_count"), "w") as f:
        f.write(str(n_vertices))

    # ---- edges → ranks via two bucketed joins, then per-source-chunk
    # CSR parts + offsets
    sel = ["src", "dst"] + ([weight_col] if weight_col else [])
    e = edges.select_columns(sel)
    e = cogroup_join(
        e, verts.map_batches(
            lambda t: pa.table({"src": t.column("vid"),
                                "srank": t.column("rank")}),
            batch_format="pyarrow"), on="src")
    e = cogroup_join(
        e, verts.map_batches(
            lambda t: pa.table({"dst": t.column("vid"),
                                "drank": t.column("rank")}),
            batch_format="pyarrow"), on="dst")

    def tag_echunk(t: pa.Table) -> pa.Table:
        s = t.column("srank").to_numpy(zero_copy_only=False)
        return t.append_column(
            "part", pa.array(s // np.int64(vertex_chunk_size)))

    os.makedirs(os.path.join(adjdir, "adj_list"), exist_ok=True)
    os.makedirs(os.path.join(adjdir, "offset"), exist_ok=True)
    if weight_col:
        os.makedirs(os.path.join(adjdir, weight_col), exist_ok=True)

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pk, grp in g.groupby("part", sort=True):
            pk = int(pk)
            order = np.lexsort((grp["drank"].to_numpy(np.int64),
                                grp["srank"].to_numpy(np.int64)))
            s = grp["srank"].to_numpy(np.int64)[order]
            d = grp["drank"].to_numpy(np.int64)[order]
            w = (grp[weight_col].to_numpy(np.float64)[order]
                 if weight_col else None)
            pdir = os.path.join(adjdir, "adj_list", f"part{pk}")
            os.makedirs(pdir, exist_ok=True)
            for j, lo in enumerate(range(0, len(s), edge_chunk_size)):
                hi = min(lo + edge_chunk_size, len(s))
                pq.write_table(pa.table({
                    SRC_COL: pa.array(s[lo:hi]),
                    DST_COL: pa.array(d[lo:hi])}),
                    os.path.join(pdir, f"chunk{j}"))
                if w is not None:
                    wdir = os.path.join(adjdir, weight_col, f"part{pk}")
                    os.makedirs(wdir, exist_ok=True)
                    pq.write_table(
                        pa.table({weight_col: pa.array(w[lo:hi])}),
                        os.path.join(wdir, f"chunk{j}"))
            # CSR offsets local to this part: one value per vertex in
            # the source chunk, +1 (cumulative edge counts)
            base = pk * vertex_chunk_size
            nverts = min(vertex_chunk_size,
                         max(0, n_vertices - base))
            deg = np.bincount((s - base).astype(np.int64),
                              minlength=nverts)
            pq.write_table(pa.table({
                OFFSET_COL: pa.array(
                    np.concatenate(([0], np.cumsum(deg))).astype(np.int64))
            }), os.path.join(adjdir, "offset", f"chunk{pk}"))
            with open(os.path.join(adjdir, f"edge_count{pk}"), "w") as f:
                f.write(str(len(s)))
            out.append((pk, len(s)))
        return pd.DataFrame(out or [(0, 0)], columns=["part", "rows"])

    bucketed_group_apply(
        e.map_batches(tag_echunk, batch_format="pyarrow"),
        ["part"], write_part).materialize()

    # parts with NO edges still need empty offset/count files so a
    # strict reader can walk every source chunk
    n_parts = max(1, -(-n_vertices // vertex_chunk_size))
    for pk in range(n_parts):
        cfile = os.path.join(adjdir, f"edge_count{pk}")
        if not os.path.exists(cfile):
            base = pk * vertex_chunk_size
            nverts = min(vertex_chunk_size, max(0, n_vertices - base))
            pq.write_table(pa.table({
                OFFSET_COL: pa.array(np.zeros(nverts + 1, np.int64))
            }), os.path.join(adjdir, "offset", f"chunk{pk}"))
            with open(cfile, "w") as f:
                f.write("0")

    # ---- metadata ymls (public GraphAr v1 fields)
    import yaml as _yaml

    vinfo = {
        "label": vertex_label,
        "chunk_size": int(vertex_chunk_size),
        "prefix": vprefix,
        "property_groups": [{
            "properties": [{"name": "id", "data_type": "int64",
                            "is_primary": True}],
            "prefix": "id/",
            "file_type": "parquet",
        }],
        "version": VERSION,
    }
    adj = {"ordered_by": "source", "prefix": "ordered_by_source/",
           "file_type": "parquet"}
    einfo = {
        "src_label": vertex_label,
        "edge_label": edge_label,
        "dst_label": vertex_label,
        "chunk_size": int(edge_chunk_size),
        "src_chunk_size": int(vertex_chunk_size),
        "dst_chunk_size": int(vertex_chunk_size),
        "directed": bool(directed),
        "prefix": eprefix,
        "adj_lists": [adj],
        "version": VERSION,
    }
    if weight_col:
        einfo["property_groups"] = [{
            "properties": [{"name": weight_col, "data_type": "double",
                            "is_primary": False}],
            "prefix": f"{weight_col}/",
            "file_type": "parquet",
        }]
    ginfo = {
        "name": name,
        "prefix": path if path.endswith("/") else path + "/",
        "vertices": [f"{vertex_label}.vertex.yml"],
        "edges": [f"{etriple}.edge.yml"],
        "version": VERSION,
    }
    with open(os.path.join(path, f"{vertex_label}.vertex.yml"), "w") as f:
        _yaml.safe_dump(vinfo, f, sort_keys=False)
    with open(os.path.join(path, f"{etriple}.edge.yml"), "w") as f:
        _yaml.safe_dump(einfo, f, sort_keys=False)
    info_path = os.path.join(path, f"{name}.graph.yml")
    with open(info_path, "w") as f:
        _yaml.safe_dump(ginfo, f, sort_keys=False)
    return info_path


# --------------------------------------------------------------- load
def _chunk_files(d: str) -> list[tuple[int, str]]:
    out = []
    for fn in os.listdir(d):
        if fn.startswith("chunk"):
            out.append((int(fn[5:]), os.path.join(d, fn)))
    return sorted(out)


@ray.remote
def _read_vchunk(fp: str, base: int, id_col: str) -> pa.Table:
    t = pq.read_table(fp)
    return pa.table({
        "vid": t.column(id_col).cast(pa.int64()),
        "rank": pa.array(base + np.arange(t.num_rows, dtype=np.int64)),
    })


@ray.remote
def _read_echunk(fp: str, wfp: str | None, wcol: str | None) -> pa.Table:
    t = pq.read_table(fp)
    cols = {"srank": t.column(SRC_COL).cast(pa.int64()),
            "drank": t.column(DST_COL).cast(pa.int64())}
    if wfp is not None and os.path.exists(wfp):
        cols[wcol] = pq.read_table(wfp).column(wcol).cast(pa.float64())
    return pa.table(cols)


def load_graphar(graph_info_path: str
                 ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Load a GraphAr directory → ``(edges, vertices)`` with original
    ids. Accepts our output or any spec-following layout (including
    the reference's ``.graph.yaml`` suffix and multi-chunk parts)."""
    import yaml

    from graphscope_ray.stages.relational import cogroup_join

    with open(graph_info_path) as f:
        ginfo = yaml.safe_load(f)
    root = os.path.dirname(os.path.abspath(graph_info_path))

    vyml = ginfo["vertices"][0]
    with open(os.path.join(root, vyml)) as f:
        vinfo = yaml.safe_load(f)
    vcs = int(vinfo["chunk_size"])
    # primary property group holds the original id column
    pgroups = vinfo["property_groups"]
    pg = next((g for g in pgroups
               if any(p.get("is_primary") for p in g["properties"])),
              pgroups[0])
    id_col = next((p["name"] for p in pg["properties"]
                   if p.get("is_primary")), pg["properties"][0]["name"])
    vdir = os.path.join(root, vinfo["prefix"], pg["prefix"])
    vrefs = [_read_vchunk.remote(fp, ck * vcs, id_col)
             for ck, fp in _chunk_files(vdir)]
    verts = ray.data.from_arrow_refs(vrefs).materialize()

    eyml = ginfo["edges"][0]
    with open(os.path.join(root, eyml)) as f:
        einfo = yaml.safe_load(f)
    adj = next(a for a in einfo["adj_lists"]
               if a.get("ordered_by", "source") == "source")
    adjroot = os.path.join(root, einfo["prefix"], adj["prefix"])
    wcol = None
    for g in einfo.get("property_groups", []) or []:
        for p in g["properties"]:
            if p["data_type"] in ("double", "float"):
                wcol = p["name"]
                break
    erefs = []
    adjdir = os.path.join(adjroot, "adj_list")
    for part in sorted(os.listdir(adjdir),
                       key=lambda s: int(s.replace("part", ""))):
        for _, fp in _chunk_files(os.path.join(adjdir, part)):
            wfp = (os.path.join(adjroot, wcol, part,
                                os.path.basename(fp)) if wcol else None)
            erefs.append(_read_echunk.remote(fp, wfp, wcol))
    eranks = ray.data.from_arrow_refs(erefs)

    e = cogroup_join(
        eranks, verts.map_batches(
            lambda t: pa.table({"srank": t.column("rank"),
                                "src": t.column("vid")}),
            batch_format="pyarrow"), on="srank")
    e = cogroup_join(
        e, verts.map_batches(
            lambda t: pa.table({"drank": t.column("rank"),
                                "dst": t.column("vid")}),
            batch_format="pyarrow"), on="drank")
    keep = ["src", "dst"] + ([wcol] if wcol else [])
    return (e.select_columns(keep),
            verts.select_columns(["vid"]))
