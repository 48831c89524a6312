"""Location-URI resolution (SURVEY §2.4; reference loader protocols).

The reference's ``Loader`` accepts ``file:// oss:// hdfs:// s3://
vineyard://`` location URIs with fsspec-style storage options
(``python/graphscope/framework/loader.py:107-160``) and hands them to
vineyard I/O drivers. Ray-native equivalent: resolve each scheme to a
``pyarrow.fs.FileSystem`` + in-filesystem path and pass both straight
into ``ray.data.read_parquet/read_csv`` — the scan stays pruned,
predicate-pushed and parallel regardless of where the bytes live.

Scheme map (public pyarrow.fs only):

- ``file://`` / bare paths → the local filesystem (``None`` — Ray's
  default resolution; keeps local reads on the zero-copy fast path).
- ``s3://bucket/key`` → ``pyarrow.fs.S3FileSystem``; storage options
  ``key/secret/token/endpoint/region/anonymous`` map to the pyarrow
  constructor (access_key/secret_key/session_token/endpoint_override/
  region/anonymous).
- ``oss://bucket/key`` → Alibaba OSS through its public S3-compatible
  endpoint: the same ``S3FileSystem`` with ``endpoint`` REQUIRED in
  the storage options (e.g. ``oss-cn-hangzhou.aliyuncs.com``) since
  OSS has no default AWS-style resolution.
- ``hdfs://namenode:port/path`` → ``pyarrow.fs.HadoopFileSystem`` via
  ``from_uri`` (needs libhdfs + a JVM at runtime; this sandbox has
  neither, so construction is attempted and failures re-raised with a
  clear message — the mapping itself is unit-tested via injection).
- ``vineyard://`` → unsupported here by design (the reference's
  vineyard streams are its own store; this engine's interchange format
  is Parquet — see ``state/checkpoint`` and ``sources/graphar``).
"""

from __future__ import annotations

from urllib.parse import urlparse

#: test seam: tests inject a fake S3FileSystem class here to assert
#: the kwarg mapping without network/credentials.
_S3_FACTORY = None
_HDFS_FACTORY = None

#: fsspec-style option name → pyarrow S3FileSystem kwarg
_S3_OPT_MAP = {
    "key": "access_key",
    "access_key": "access_key",
    "secret": "secret_key",
    "secret_key": "secret_key",
    "token": "session_token",
    "session_token": "session_token",
    "endpoint": "endpoint_override",
    "endpoint_override": "endpoint_override",
    "region": "region",
    "anonymous": "anonymous",
}


def _s3_kwargs(storage_options: dict) -> dict:
    out = {}
    for k, v in storage_options.items():
        if k not in _S3_OPT_MAP:
            raise ValueError(
                f"unknown S3/OSS storage option {k!r}; "
                f"supported: {sorted(set(_S3_OPT_MAP))}")
        out[_S3_OPT_MAP[k]] = v
    return out


def resolve_location(uri: str, **storage_options):
    """``uri`` → ``(filesystem | None, path)`` ready for
    ``ray.data.read_*(path, filesystem=fs)``.

    ``None`` filesystem means "let Ray resolve it" (local paths). All
    schemes of the reference loader are accepted; ``vineyard://``
    raises with the documented substitution.
    """
    parsed = urlparse(uri)
    scheme = parsed.scheme
    if scheme in ("", "file"):
        return None, (uri[len("file://"):] if scheme == "file" else uri)

    if scheme in ("s3", "oss"):
        import pyarrow.fs as pafs

        opts = _s3_kwargs(storage_options)
        if scheme == "oss" and "endpoint_override" not in opts:
            raise ValueError(
                "oss:// locations need an 'endpoint' storage option "
                "(the bucket's S3-compatible endpoint, e.g. "
                "'oss-cn-hangzhou.aliyuncs.com')")
        factory = _S3_FACTORY or pafs.S3FileSystem
        fs = factory(**opts)
        return fs, f"{parsed.netloc}{parsed.path}"

    if scheme == "hdfs":
        import pyarrow.fs as pafs

        factory = _HDFS_FACTORY or pafs.HadoopFileSystem.from_uri
        try:
            fs = factory(uri)
        except Exception as e:  # no libhdfs/JVM in this environment
            raise RuntimeError(
                f"hdfs:// location {uri!r} could not be opened: {e}. "
                "pyarrow's HadoopFileSystem needs libhdfs and a JVM on "
                "every Ray node; install them or copy the data to "
                "s3/local parquet.") from e
        return fs, parsed.path

    if scheme == "vineyard":
        raise NotImplementedError(
            "vineyard:// streams are the reference store's own format; "
            "this engine interchanges Parquet (archive_graph / GraphAr "
            "— sources/graphar.py) instead.")

    raise ValueError(f"unsupported location scheme {scheme!r} in {uri!r}")
