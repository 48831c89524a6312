"""Corpus split / mix / exact-k sample ops (stages/sampling.py):
DuckDB interchange twins (md5 kernel), partition invariance, and the
fast splitmix kernel's determinism properties."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from graphscope_ray.stages.sampling import (
    hash_order_sample,
    hash_split,
    weighted_resample,
)

SF = "/root/testdata/sf0.001"


def _docs(parallelism=4):
    return ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source"],
        override_num_blocks=parallelism)


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return con


def test_hash_split_matches_duckdb_and_is_partition_invariant():
    con = _con()
    want = con.sql("""
SELECT doc_id, CASE WHEN b < 800000 THEN 'train'
                    WHEN b < 900000 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id,
        md5_number_lower(CAST(doc_id AS VARCHAR) || ':split') % 1000000 AS b
      FROM documents) ORDER BY doc_id""").df()
    for p in (1, 7):
        got = (hash_split(_docs(p), {"train": 0.8, "val": 0.1, "test": 0.1})
               .select_columns(["doc_id", "split"]).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want)
    # every row assigned exactly once, roughly proportional bins
    counts = want["split"].value_counts()
    assert counts.sum() == len(want)
    assert counts["train"] > counts["val"] + counts["test"]


def test_hash_split_validates_fractions():
    import pytest
    with pytest.raises(ValueError):
        hash_split(_docs(), {"train": 0.8, "val": 0.1})


def test_weighted_resample_matches_duckdb():
    con = _con()
    want = con.sql("""
SELECT doc_id, CAST(unnest(range(copies)) AS BIGINT) AS rep FROM (
  SELECT doc_id,
    CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
                WHEN 'src2' THEN 2 WHEN 'src3' THEN 0 ELSE 1 END
    + CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR) || ':mix') % 1000000
             < CASE source WHEN 'src1' THEN 500000
                           WHEN 'src2' THEN 250000 ELSE 0 END
      THEN 1 ELSE 0 END AS copies
  FROM documents) ORDER BY doc_id, rep""").df()
    got = (weighted_resample(
               _docs(5), {"src0": 2.0, "src1": 0.5, "src2": 2.25,
                          "src3": 0.0},
               domain_col="source", key_col="doc_id")
           .select_columns(["doc_id", "rep"]).to_pandas()
           .sort_values(["doc_id", "rep"]).reset_index(drop=True))
    assert got.equals(want)
    # src0 rows duplicated exactly twice, src3 rows gone
    src = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "source"])
    by_src = src.set_index("doc_id")["source"]
    reps = got.groupby("doc_id").size()
    assert (reps[by_src[reps.index] == "src0"] == 2).all()
    assert not set(src[src["source"] == "src3"]["doc_id"]) & set(got["doc_id"])


def test_hash_order_sample_matches_duckdb_exact_k():
    con = _con()
    want = con.sql("""
SELECT doc_id FROM documents
ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR) || ':sample'), doc_id
LIMIT 50""").df().sort_values("doc_id").reset_index(drop=True)
    for p in (1, 6):
        got = (hash_order_sample(
                   _docs(p).select_columns(["doc_id"]), 50)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert len(got) == 50
        assert got.equals(want)
    # k larger than n returns everything
    all_rows = hash_order_sample(
        _docs(3).select_columns(["doc_id"]), 10_000).to_pandas()
    assert len(all_rows) == 500


def test_fast_kernel_determinism_and_proportions():
    # splitmix kernel: no SQL twin, but must be partition-invariant and
    # respect fractions statistically over string keys too
    df = pd.DataFrame({"k": [f"key{i}" for i in range(4000)]})
    outs = []
    for p in (2, 9):
        ds = ray.data.from_pandas(df).repartition(p)
        got = (hash_split(ds, {"a": 0.5, "b": 0.5}, key_col="k",
                          hash_fn="fast")
               .to_pandas().sort_values("k").reset_index(drop=True))
        outs.append(got)
    assert outs[0].equals(outs[1])
    frac_a = (outs[0]["split"] == "a").mean()
    assert 0.45 < frac_a < 0.55
    # fast weighted_resample: copy counts depend only on (key, domain)
    df2 = pd.DataFrame({"k": np.arange(1000), "d": ["x", "y"] * 500})
    r = (weighted_resample(ray.data.from_pandas(df2), {"x": 1.5, "y": 0.5},
                           domain_col="d", key_col="k", hash_fn="fast")
         .to_pandas())
    per_key = r.groupby("k").size()
    xs = per_key[per_key.index % 2 == 0]
    assert set(xs.unique()) <= {1, 2}
    assert 0.4 < (xs == 2).mean() < 0.6


def test_per_key_cap_matches_duckdb():
    from graphscope_ray.stages.sampling import per_key_cap

    con = _con()
    want = con.sql("""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY
           md5_number_lower(CAST(doc_id AS VARCHAR) || ':cap'),
           doc_id) AS rn
  FROM documents) WHERE rn <= 7 ORDER BY doc_id""").df()
    for p in (1, 6):
        got = (per_key_cap(_docs(p), 7, group_col="source")
               .select_columns(["doc_id", "source"]).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)


def test_per_key_cap_bounds_and_small_groups():
    from graphscope_ray.stages.sampling import per_key_cap

    df = pd.DataFrame({
        "doc_id": np.arange(30, dtype=np.int64),
        "source": ["big"] * 25 + ["tiny"] * 5,
    })
    got = per_key_cap(ray.data.from_pandas(df).repartition(4), 10,
                      group_col="source").to_pandas()
    counts = got["source"].value_counts()
    assert counts["big"] == 10   # capped
    assert counts["tiny"] == 5   # whole group survives
    assert got["doc_id"].is_unique
