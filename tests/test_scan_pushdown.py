"""Scan predicate pushdown: read_parquet(filter=...) must skip row
groups whose statistics exclude the predicate (GIE Scan,
algebra.proto:234 → Ray read_parquet fragment filter)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray.data

from graphscope_ray.sources.readers import (
    read_edges_parquet,
    read_table_parquet,
)


def _write_sorted(tmp_path, n=1000, rg=100):
    # weight ascending → row-group min/max stats partition the range
    t = pa.table({
        "s": pa.array(np.arange(n, dtype=np.int64)),
        "d": pa.array((np.arange(n, dtype=np.int64) + 1) % n),
        "weight": pa.array(np.arange(n, dtype=np.float64)),
    })
    fp = str(tmp_path / "edges.parquet")
    pq.write_table(t, fp, row_group_size=rg)
    return fp


def test_filter_skips_row_groups_and_matches(tmp_path):
    fp = _write_sorted(tmp_path)
    expr = pc.field("weight") >= 950.0
    ds = read_edges_parquet(fp, src="s", dst="d", weight="weight",
                            filter_expr=expr)
    out = ds.to_pandas()
    assert len(out) == 50
    assert set(out.columns) == {"src", "dst", "weight"}
    assert (out["weight"].to_numpy() >= 950).all()
    # row-group skip evidence: the SAME expression splits the fragment
    # to only the final row group (9 of 10 skipped by stats)
    frag = next(pads.dataset(fp, format="parquet").get_fragments())
    kept = list(frag.split_by_row_group(expr))
    assert len(kept) == 1
    total = list(frag.split_by_row_group())
    assert len(total) == 10


def test_generic_table_scan_pushdown(tmp_path):
    fp = _write_sorted(tmp_path)
    ds = read_table_parquet(fp, columns=["s", "weight"],
                            filter_expr=(pc.field("weight") < 100.0))
    out = ds.to_pandas()
    assert len(out) == 100 and list(out.columns) == ["s", "weight"]


def test_q3_segment_pushdown_still_exact():
    # the q3 customer read now carries the segment predicate on the
    # scan; results must be unchanged (twin-checked in the gate too)
    from graphscope_ray.pipelines.tpch import q3_top_orders
    out = q3_top_orders("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 10
    assert (out["revenue"].to_numpy()[:-1]
            >= out["revenue"].to_numpy()[1:]).all()
