"""GraphAr save/load: round-trip identity, algorithm parity after a
round trip, and loading a hand-built directory following the public
Apache GraphAr v1 layout the reference emits (reference surface:
python/graphscope/framework/graph.py:1171-1347)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from graphscope_ray.sources.graphar import (
    DST_COL,
    SRC_COL,
    load_graphar,
    save_graphar,
)

PAIRS = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 6),
         (6, 0), (1, 4), (3, 6)]


def _edges(rows, weighted=False):
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    df = pd.DataFrame(rows, columns=cols)
    df[["src", "dst"]] = df[["src", "dst"]].astype(np.int64)
    return ray.data.from_pandas(df)


def _edge_set(ds, weighted=False):
    rows = ds.take_all()
    if weighted:
        return {(int(r["src"]), int(r["dst"]), float(r["weight"]))
                for r in rows}
    return {(int(r["src"]), int(r["dst"])) for r in rows}


def test_roundtrip_identity(tmp_path):
    d = str(tmp_path / "gar")
    info = save_graphar(_edges(PAIRS), d, name="g1",
                        vertex_chunk_size=3, edge_chunk_size=4)
    assert info.endswith("g1.graph.yml") and os.path.exists(info)
    edges2, verts2 = load_graphar(info)
    assert _edge_set(edges2) == set(PAIRS)
    assert sorted(r["vid"] for r in verts2.take_all()) == list(range(7))
    # spec artifacts present: chunked files, counts, offsets
    assert os.path.exists(os.path.join(d, "vertex/vertex/vertex_count"))
    adj = os.path.join(d, "edge/vertex_edge_vertex/ordered_by_source")
    assert os.path.exists(os.path.join(adj, "adj_list/part0/chunk0"))
    assert os.path.exists(os.path.join(adj, "offset/chunk0"))
    assert os.path.exists(os.path.join(adj, "edge_count0"))
    # offsets are a valid per-part CSR over the source chunk
    off = pq.read_table(os.path.join(adj, "offset/chunk0")
                        ).column(0).to_numpy()
    cnt = int(open(os.path.join(adj, "edge_count0")).read())
    assert off[0] == 0 and off[-1] == cnt
    assert (np.diff(off) >= 0).all()


def test_roundtrip_weighted_and_hashed_vids(tmp_path):
    rows = [(-(2**60), 2**61, 1.5), (2**61, 7, 2.0), (7, -(2**60), 0.5)]
    info = save_graphar(_edges(rows, weighted=True),
                        str(tmp_path / "gw"), name="gw",
                        vertex_chunk_size=2, edge_chunk_size=2,
                        weight_col="weight")
    edges2, _ = load_graphar(info)
    assert _edge_set(edges2, weighted=True) == set(rows)


def test_algorithms_identical_after_roundtrip(tmp_path):
    from graphscope_ray.pipelines.algorithms import pagerank, wcc
    from graphscope_ray.state.graph import build_graph

    def run(edges):
        g = build_graph(edges, num_partitions=3, directed=False)
        pr, _ = pagerank(g)
        cc, _ = wcc(g)
        prd = {int(r["vid"]): round(float(r["pagerank"]), 12)
               for r in pr.take_all()}
        ccd = {int(r["vid"]): int(r["component"])
               for r in cc.take_all()}
        return prd, ccd

    before = run(_edges(PAIRS))
    info = save_graphar(_edges(PAIRS), str(tmp_path / "ga"), name="ga",
                        vertex_chunk_size=4, edge_chunk_size=8)
    edges2, _ = load_graphar(info)
    assert run(edges2) == before


def test_load_reference_style_layout(tmp_path):
    """Hand-build a directory exactly as the public GraphAr v1 spec
    (and the reference's GraphAr writer) lays it out — .graph.yaml
    suffix, person/knows labels, multi-chunk parts — and load it."""
    import yaml

    root = tmp_path / "ldbc_sample"
    vdir = root / "vertex/person/id"
    adj = root / "edge/person_knows_person/ordered_by_source"
    os.makedirs(vdir)
    os.makedirs(adj / "adj_list/part0")
    os.makedirs(adj / "adj_list/part1")
    os.makedirs(adj / "offset")
    ids = [100, 200, 300, 400]  # ranks 0..3, vertex_chunk_size=2
    pq.write_table(pa.table({"id": pa.array(ids[:2], pa.int64())}),
                   str(vdir / "chunk0"))
    pq.write_table(pa.table({"id": pa.array(ids[2:], pa.int64())}),
                   str(vdir / "chunk1"))
    (root / "vertex/person/vertex_count").write_text("4")
    # arcs: 0→1, 0→2 | 1→3 (part0, two edge chunks of size 2) ; 2→0 (part1)
    pq.write_table(pa.table({SRC_COL: pa.array([0, 0], pa.int64()),
                             DST_COL: pa.array([1, 2], pa.int64())}),
                   str(adj / "adj_list/part0/chunk0"))
    pq.write_table(pa.table({SRC_COL: pa.array([1], pa.int64()),
                             DST_COL: pa.array([3], pa.int64())}),
                   str(adj / "adj_list/part0/chunk1"))
    pq.write_table(pa.table({SRC_COL: pa.array([2], pa.int64()),
                             DST_COL: pa.array([0], pa.int64())}),
                   str(adj / "adj_list/part1/chunk0"))
    from graphscope_ray.sources.graphar import OFFSET_COL
    pq.write_table(pa.table({OFFSET_COL: pa.array([0, 2, 3], pa.int64())}),
                   str(adj / "offset/chunk0"))
    pq.write_table(pa.table({OFFSET_COL: pa.array([0, 1, 1], pa.int64())}),
                   str(adj / "offset/chunk1"))
    (adj / "edge_count0").write_text("3")
    (adj / "edge_count1").write_text("1")
    yaml.safe_dump({
        "label": "person", "chunk_size": 2, "prefix": "vertex/person/",
        "property_groups": [{
            "properties": [{"name": "id", "data_type": "int64",
                            "is_primary": True}],
            "prefix": "id/", "file_type": "parquet"}],
        "version": "gar/v1",
    }, open(root / "person.vertex.yml", "w"), sort_keys=False)
    yaml.safe_dump({
        "src_label": "person", "edge_label": "knows",
        "dst_label": "person", "chunk_size": 2, "src_chunk_size": 2,
        "dst_chunk_size": 2, "directed": True,
        "prefix": "edge/person_knows_person/",
        "adj_lists": [{"ordered_by": "source",
                       "prefix": "ordered_by_source/",
                       "file_type": "parquet"}],
        "version": "gar/v1",
    }, open(root / "person_knows_person.edge.yml", "w"), sort_keys=False)
    yaml.safe_dump({
        "name": "ldbc_sample", "prefix": str(root) + "/",
        "vertices": ["person.vertex.yml"],
        "edges": ["person_knows_person.edge.yml"],
        "version": "gar/v1",
    }, open(root / "ldbc_sample.graph.yaml", "w"), sort_keys=False)

    edges, verts = load_graphar(str(root / "ldbc_sample.graph.yaml"))
    assert _edge_set(edges) == {(100, 200), (100, 300), (200, 400),
                                (300, 100)}
    assert sorted(r["vid"] for r in verts.take_all()) == ids
