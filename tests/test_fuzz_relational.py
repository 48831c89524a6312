"""Randomized differential checks for the relational layer: cogroup
joins (all four kinds) and grouped aggregates vs pandas on random
frames with duplicate keys, empty sides and unmatched rows."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.stages.relational import cogroup_join, grouped_agg

SEEDS = [5, 23, 47]


def _frames(seed):
    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(5, 60)), int(rng.integers(5, 60))
    left = pd.DataFrame({
        "k": rng.integers(0, 12, nl).astype(np.int64),
        "lv": rng.integers(-5, 100, nl).astype(np.int64),
        "ls": [f"l{i % 7}" for i in range(nl)],
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 12, nr).astype(np.int64),
        "rv": rng.normal(size=nr),
    })
    return left, right


def _sorted(df):
    return (df[sorted(df.columns)]
            .sort_values(sorted(df.columns), kind="mergesort")
            .reset_index(drop=True))


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("how", ["inner", "left", "right", "outer"])
def test_cogroup_join_matches_pandas(seed, how):
    left, right = _frames(seed)
    got = cogroup_join(ray.data.from_pandas(left).repartition(3),
                       ray.data.from_pandas(right).repartition(2),
                       on="k", how=how).to_pandas()
    want = left.merge(right, on="k", how=how)
    g, w = _sorted(got), _sorted(want)
    assert len(g) == len(w), (seed, how)
    for c in w.columns:
        a = g[c].to_numpy()
        b = w[c].to_numpy()
        if w[c].dtype.kind == "f":
            assert np.allclose(a.astype(np.float64),
                               b.astype(np.float64), equal_nan=True)
        else:
            # null representations differ (None / NaN / pd.NA) —
            # null masks must MATCH, then non-null values must match
            ga, wa = pd.Series(a), pd.Series(b)
            na_g, na_w = ga.isna().to_numpy(), wa.isna().to_numpy()
            assert (na_g == na_w).all(), (seed, how, c)
            m = ~na_g
            assert (ga[m].to_numpy(object)
                    == wa[m].to_numpy(object)).all(), (seed, how, c)


@pytest.mark.parametrize("seed", SEEDS)
def test_grouped_agg_matches_pandas(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    df = pd.DataFrame({
        "g": rng.integers(0, 9, n).astype(np.int64),
        "x": rng.integers(-50, 50, n).astype(np.int64),
        "y": rng.normal(size=n),
    })
    for combine in (True, False):
        got = grouped_agg(
            ray.data.from_pandas(df).repartition(4),
            ["g"],
            {"n": (None, "size"), "sx": ("x", "sum"),
             "mx": ("x", "max"), "mn": ("y", "min")},
            combine=combine,
        ).to_pandas().sort_values("g").reset_index(drop=True)
        want = (df.groupby("g")
                .agg(n=("x", "size"), sx=("x", "sum"),
                     mx=("x", "max"), mn=("y", "min"))
                .reset_index().sort_values("g").reset_index(drop=True))
        assert got["g"].tolist() == want["g"].tolist()
        assert got["n"].tolist() == want["n"].tolist()
        assert got["sx"].tolist() == want["sx"].tolist()
        assert got["mx"].tolist() == want["mx"].tolist()
        assert np.allclose(got["mn"], want["mn"])
