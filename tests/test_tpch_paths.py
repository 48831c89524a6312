"""TPC-H-ish join-path selection: the broadcast and co-group variants
of q3/q5 must produce identical results (the auto-select on
BROADCAST_LIMIT_ROWS is a pure execution-strategy switch)."""

import numpy as np
import pytest

import graphscope_ray.pipelines.triangles as tri
from graphscope_ray.pipelines.tpch import q3_top_orders, q5_nation_revenue

SF = "/root/testdata/sf0.001"


def _df(ds):
    return ds.to_pandas()


@pytest.mark.parametrize("fn,sort_keys", [
    (q3_top_orders, ["revenue", "o_orderkey"]),
    (q5_nation_revenue, ["n_name"]),
])
def test_broadcast_and_cogroup_paths_agree(fn, sort_keys, monkeypatch):
    broadcast = _df(fn(SF)).sort_values(sort_keys).reset_index(drop=True)
    monkeypatch.setattr(tri, "BROADCAST_LIMIT_ROWS", 0)
    cogroup = _df(fn(SF)).sort_values(sort_keys).reset_index(drop=True)
    assert list(broadcast.columns) == list(cogroup.columns)
    for c in broadcast.columns:
        a, b = broadcast[c].to_numpy(), cogroup[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b.astype(np.float64), atol=1e-9)
        else:
            assert (a == b).all()
    assert len(broadcast) > 0
