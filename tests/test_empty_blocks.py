"""Empty/schema-less block hygiene: tiny inputs with far more buckets
and partitions than rows force Ray's sort shuffle to emit zero-row
empty-schema splits inside every bucketed relational op; each op must
still return correct, fully-typed results (round-2's one red row came
from this class). Also pins the typed_blocks gather guard and the
narrow log filter for the benign internal divergence warning."""

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.stages.relational import (
    asof_join,
    bucketed_group_apply,
    cogroup_join,
    dedup_first,
    global_ntile,
    grouped_agg,
    topk,
    typed_blocks,
)


def _tiny(rows, nparts=8):
    df = pd.DataFrame(rows)
    for c in df.columns:
        if df[c].dtype.kind == "i":
            df[c] = df[c].astype(np.int64)
    return ray.data.from_pandas(df).repartition(nparts)


def test_bucketed_group_apply_sparse_buckets():
    ds = _tiny({"k": [1, 1, 2], "x": [10, 20, 30]})
    out = bucketed_group_apply(
        ds, ["k"],
        lambda g: g.groupby("k", sort=False)["x"].sum().reset_index(),
        num_buckets=64).to_pandas().sort_values("k")
    assert out["x"].tolist() == [30, 30]
    assert set(out.columns) == {"k", "x"}


def test_grouped_agg_both_paths_sparse():
    ds = _tiny({"k": [5, 5, 9], "x": [1, 2, 3]})
    for combine in (True, False):
        out = grouped_agg(ds, ["k"], {"s": ("x", "sum")},
                          num_buckets=64, combine=combine
                          ).to_pandas().sort_values("k")
        assert out["s"].tolist() == [3, 3]


def test_dedup_first_sparse():
    ds = _tiny({"k": [7, 7, 7], "v": [3, 1, 2]})
    out = dedup_first(ds, ["k"], order_by=["v"], num_buckets=64
                      ).to_pandas()
    assert out["v"].tolist() == [1]


def test_cogroup_join_sparse_and_empty_side():
    left = _tiny({"k": [1, 2], "a": [10, 20]})
    right = _tiny({"k": [2, 3], "b": [200, 300]})
    out = cogroup_join(left, right, "k", num_buckets=64).to_pandas()
    assert out[["k", "a", "b"]].values.tolist() == [[2, 20, 200]]
    # one side entirely empty (schema intact, zero rows)
    from graphscope_ray.stages.relational import select_expr
    empty = select_expr(
        right, lambda t: pa.array(np.zeros(t.num_rows, bool)))
    out2 = cogroup_join(left, empty, "k", num_buckets=64)
    # Ray forwards the sort's schema-less empty splits without calling
    # any UDF, so to_pandas() of an ALL-empty result loses columns;
    # the engine contract is the DATASET schema (which stays typed)
    # plus typed_blocks at every raw-block gather point
    assert out2.count() == 0
    sch = out2.schema()
    assert set(sch.names) == {"k", "a", "b"}


def test_asof_join_sparse():
    left = _tiny({"t": [5, 15], "g": [1, 1], "x": [1, 2]})
    right = _tiny({"t": [4, 11], "g": [1, 1], "y": [40, 110]})
    out = asof_join(left, right, "t", ["g"], num_buckets=64
                    ).to_pandas().sort_values("t")
    assert out["y"].tolist() == [40, 110]


def test_topk_and_ntile_many_partitions():
    ds = _tiny({"v": [3, 1, 2], "id": [0, 1, 2]}, nparts=8)
    out = topk(ds, "v", 2, tiebreak=["id"]).to_pandas()
    assert out["v"].tolist() == [3, 2]
    nt = global_ntile(ds, ["v", "id"], 2).to_pandas().sort_values("v")
    assert nt["bucket"].tolist() == [1, 1, 2]


def test_typed_blocks_guard():
    real = pa.table({"src": pa.array([1], pa.int64())})
    empty_schemaless = pa.table({})
    empty_typed = real.slice(0, 0)
    assert typed_blocks(
        [real, empty_schemaless, empty_typed, None], "src") == [real]


def test_log_filter_is_narrow():
    from graphscope_ray import _EmptySchemaDivergenceFilter
    f = _EmptySchemaDivergenceFilter()

    def rec(msg):
        return logging.LogRecord("ray.data", logging.WARNING, "f", 1,
                                 msg, None, None)

    benign = ("Operator produced a RefBundle with a different schema "
              "than the previous one. Previous schema: vid: int64, "
              "new schema: . This may lead to unexpected behavior.")
    benign_pandas = (
        "Operator produced a RefBundle with a different schema than "
        "the previous one. Previous schema: PandasBlockSchema("
        "names=['h'], types=[dtype('int64')]), new schema: "
        "PandasBlockSchema(names=[], types=[]). This may lead to "
        "unexpected behavior.")
    real_divergence = (
        "Operator produced a RefBundle with a different schema than "
        "the previous one. Previous schema: vid: int64, new schema: "
        "vid: int32. This may lead to unexpected behavior.")
    real_pandas_divergence = (
        "Operator produced a RefBundle with a different schema than "
        "the previous one. Previous schema: PandasBlockSchema("
        "names=['h'], types=[dtype('int64')]), new schema: "
        "PandasBlockSchema(names=['h'], types=[dtype('float64')]). "
        "This may lead to unexpected behavior.")
    assert not f.filter(rec(benign))          # suppressed
    assert not f.filter(rec(benign_pandas))   # suppressed
    assert f.filter(rec(real_divergence))     # kept
    assert f.filter(rec(real_pandas_divergence))  # kept
    assert f.filter(rec("unrelated warning"))


def test_parquet_read_strips_unhashable_metadata(ray_session, tmp_path):
    """pandas-written parquet carries a 'pandas' schema-metadata dict
    that makes pa.Schema unhashable on pyarrow 16 — every downstream
    schema unification then warns 'Failed to hash the schemas'.
    read_parquet_clean must hand out hashable, metadata-free block
    schemas."""
    import pandas as pd
    import pyarrow as pa

    from graphscope_ray.sources.readers import read_parquet_clean

    p = str(tmp_path / "t.parquet")
    pd.DataFrame({"a": [1, 2], "text": ["x", "y"]}).to_parquet(p)
    # the raw read's file schema is unhashable (the warning's root)
    import pyarrow.parquet as pq
    try:
        hash(pq.read_schema(p))
        raw_hashable = True
    except TypeError:
        raw_hashable = False
    assert not raw_hashable
    ds = read_parquet_clean(p)
    for ref in ds.materialize().to_arrow_refs():
        import ray as _ray
        sch = _ray.get(ref).schema
        assert sch.metadata is None
        hash(sch)   # must not raise


def test_synth_pipeline_input_typed_empty(ray_session):
    """Zero-row blocks through the synth-input producer and the eval
    selector must come out ARROW-typed (string text), not object-dtype
    pandas — the 'cannot call vectorize on size 0 inputs' class."""
    import pandas as pd
    import pyarrow as pa

    from graphscope_ray.pipelines.textproc import _synth_pipeline_input

    out = _synth_pipeline_input(pd.DataFrame({"doc_id": [], "text": []}))
    assert isinstance(out, pa.Table)
    assert out.schema.field("text").type == pa.string()
    assert out.num_rows == 0
    full = _synth_pipeline_input(
        pd.DataFrame({"doc_id": [2], "text": ["hello"]}))
    assert "mail" in full["text"].iloc[0]
