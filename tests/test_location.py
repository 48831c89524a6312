"""Loader-protocol URI resolution (reference loader.py:107-160)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from graphscope_ray.sources import location
from graphscope_ray.sources.location import resolve_location
from graphscope_ray.sources.readers import (read_edges_parquet,
                                            read_table_parquet)


def test_bare_and_file_uri(tmp_path):
    fs, p = resolve_location(str(tmp_path / "x.parquet"))
    assert fs is None and p == str(tmp_path / "x.parquet")
    fs, p = resolve_location(f"file://{tmp_path}/x.parquet")
    assert fs is None and p == f"{tmp_path}/x.parquet"


def test_file_uri_end_to_end(ray_session, tmp_path):
    t = pa.table({"src": pa.array([1, 2], pa.int64()),
                  "dst": pa.array([2, 3], pa.int64())})
    pq.write_table(t, tmp_path / "e.parquet")
    ds = read_edges_parquet(f"file://{tmp_path}/e.parquet")
    df = ds.to_pandas().sort_values("src", ignore_index=True)
    assert list(df["dst"]) == [2, 3]
    ds2 = read_table_parquet(f"file://{tmp_path}/e.parquet",
                             columns=["dst"])
    assert ds2.schema().names == ["dst"]


class _FakeS3:
    """Injected S3FileSystem: records ctor kwargs, no network."""
    last_kwargs = None

    def __init__(self, **kw):
        _FakeS3.last_kwargs = kw


@pytest.fixture
def fake_s3(monkeypatch):
    monkeypatch.setattr(location, "_S3_FACTORY", _FakeS3)
    _FakeS3.last_kwargs = None
    return _FakeS3


def test_s3_option_mapping(fake_s3):
    fs, p = resolve_location("s3://bkt/dir/part.parquet", key="AK",
                             secret="SK", token="ST",
                             region="us-east-1", anonymous=False)
    assert isinstance(fs, _FakeS3)
    assert p == "bkt/dir/part.parquet"
    assert fake_s3.last_kwargs == {
        "access_key": "AK", "secret_key": "SK", "session_token": "ST",
        "region": "us-east-1", "anonymous": False}


def test_oss_requires_endpoint(fake_s3):
    with pytest.raises(ValueError, match="endpoint"):
        resolve_location("oss://bkt/key", key="AK", secret="SK")
    fs, p = resolve_location("oss://bkt/dir/f", key="AK", secret="SK",
                             endpoint="oss-cn-hangzhou.aliyuncs.com")
    assert isinstance(fs, _FakeS3) and p == "bkt/dir/f"
    assert fake_s3.last_kwargs["endpoint_override"] == \
        "oss-cn-hangzhou.aliyuncs.com"


def test_unknown_storage_option_rejected(fake_s3):
    with pytest.raises(ValueError, match="unknown S3/OSS storage"):
        resolve_location("s3://b/k", kee="typo")


def test_hdfs_mapping_and_error(monkeypatch):
    seen = {}

    def fake_from_uri(uri):
        seen["uri"] = uri
        return "FS"

    monkeypatch.setattr(location, "_HDFS_FACTORY", fake_from_uri)
    fs, p = resolve_location("hdfs://nn:9000/data/edges")
    assert fs == "FS" and p == "/data/edges"
    assert seen["uri"] == "hdfs://nn:9000/data/edges"

    def broken(uri):
        raise OSError("libhdfs not found")

    monkeypatch.setattr(location, "_HDFS_FACTORY", broken)
    with pytest.raises(RuntimeError, match="libhdfs"):
        resolve_location("hdfs://nn:9000/data/edges")


def test_vineyard_and_unknown_scheme():
    with pytest.raises(NotImplementedError, match="Parquet"):
        resolve_location("vineyard://graph_1")
    with pytest.raises(ValueError, match="unsupported location scheme"):
        resolve_location("gopher://x/y")
