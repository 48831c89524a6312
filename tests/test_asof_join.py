"""Distributed as-of join vs DuckDB ASOF LEFT JOIN on random data."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from graphscope_ray.stages.relational import asof_join


def _data(seed=7, n_l=4000, n_r=3000, keys=40):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "u": rng.integers(0, keys, n_l),
        "t": rng.integers(0, 100_000, n_l),
        "px": rng.random(n_l).round(6),
    })
    right = pd.DataFrame({
        "u": rng.integers(0, keys, n_r),
        "t": rng.integers(0, 100_000, n_r),
        "bid": rng.random(n_r).round(6),
    })
    # asof needs unique (u, t) on the right for a deterministic match
    right = right.drop_duplicates(["u", "t"])
    return left, right


def _oracle(left, right, op: str):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.execute(f"""
        SELECT l.u, l.t, l.px, r.t AS t_r, r.bid
        FROM l ASOF LEFT JOIN r ON l.u = r.u AND l.t {op} r.t
        ORDER BY l.u, l.t, l.px""").df()


def _norm(df):
    return (df.sort_values(["u", "t", "px"], kind="mergesort")
            .reset_index(drop=True).astype("float64"))


def test_asof_backward_matches_duckdb():
    left, right = _data()
    got = asof_join(ray.data.from_pandas(left),
                    ray.data.from_pandas(right),
                    on="t", by=["u"]).to_pandas()
    want = _oracle(left, right, ">=")
    pd.testing.assert_frame_equal(_norm(got[want.columns]), _norm(want))


def test_asof_forward_matches_duckdb():
    left, right = _data(seed=11)
    got = asof_join(ray.data.from_pandas(left),
                    ray.data.from_pandas(right),
                    on="t", by=["u"], direction="forward").to_pandas()
    want = _oracle(left, right, "<=")
    pd.testing.assert_frame_equal(_norm(got[want.columns]), _norm(want))


def test_asof_partition_invariance():
    left, right = _data(seed=3)
    a = asof_join(ray.data.from_pandas(left),
                  ray.data.from_pandas(right), on="t", by=["u"]
                  ).to_pandas()
    b = asof_join(ray.data.from_pandas(left).repartition(17),
                  ray.data.from_pandas(right).repartition(5),
                  on="t", by=["u"], num_buckets=8).to_pandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(b))
