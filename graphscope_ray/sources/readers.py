"""Edge/vertex table readers (SURVEY §2.4 sources).

The reference loads CSV (configurable delimiter/header), ORC, Parquet,
in-memory pandas/numpy, and whitespace ``.v``/``.e`` edge-list files
(``python/graphscope/framework/loader.py:99-160``;
``analytical_engine/test/run_app.h:154-190``). Ray-native equivalents:
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def strip_schema_metadata(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Drop schema-level metadata from every block (zero-copy; the
    stage fuses into the upstream read). Parquet files written by
    pandas carry a ``pandas`` metadata dict that makes the block's
    ``pa.Schema`` UNHASHABLE on pyarrow 16 — every downstream schema
    unification then logs ``Failed to hash the schemas (for
    deduplication): unhashable type: 'dict'`` and skips the fast
    dedup path. Pinned in tests/test_empty_blocks.py."""
    return ds.map_batches(lambda t: t.replace_schema_metadata(None),
                          batch_format="pyarrow")


def read_parquet_clean(path, *args, **kwargs) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with schema metadata stripped — the
    default parquet entry for every pipeline in this repo.

    When the first file's footer is readable driver-side, the cleaned
    (pruned, metadata-free) schema is passed INTO the read, so even
    blocks built inside the read operator (e.g. under SplitBlocks)
    never carry the unhashable metadata; the zero-copy strip stage
    stays as the fallback for unreadable-here filesystems."""
    if "schema" not in kwargs:
        try:
            import pyarrow.parquet as pq

            first = path[0] if isinstance(path, (list, tuple)) else path
            fs = kwargs.get("filesystem")
            sch = (pq.read_schema(first, filesystem=fs) if fs
                   else pq.read_schema(first)).remove_metadata()
            cols = kwargs.get("columns")
            if cols:
                sch = pa.schema([sch.field(c) for c in cols])
            kwargs["schema"] = sch
        except Exception:
            pass   # directory/remote path — the strip stage covers it
    return strip_schema_metadata(
        ray.data.read_parquet(path, *args, **kwargs))


def read_edges_parquet(path: str, src: str = "src", dst: str = "dst",
                       weight: str | None = None,
                       filter_expr=None,
                       storage_options: dict | None = None) -> ray.data.Dataset:
    """Pruned parquet scan: only the named columns leave storage, and
    ``filter_expr`` (a ``pyarrow.dataset`` expression, e.g.
    ``pc.field("weight") > 2``) is pushed into the fragment scan so
    row groups whose statistics exclude the predicate are SKIPPED at
    the read — the GIE Scan predicate (algebra.proto:234) mapped onto
    ``read_parquet(filter=...)``; row-group skipping asserted in
    tests/test_scan_pushdown.py. ``path`` may be a loader-protocol URI
    (``file:// s3:// oss:// hdfs://`` — loader.py:107-160) resolved by
    :mod:`graphscope_ray.sources.location`."""
    from graphscope_ray.sources.location import resolve_location

    fs, path = resolve_location(path, **(storage_options or {}))
    cols = [src, dst] + ([weight] if weight else [])
    ds = read_parquet_clean(path, columns=cols, filter=filter_expr,
                            filesystem=fs)
    ren = {src: "src", dst: "dst"}
    if weight:
        ren[weight] = "weight"
    return ds.rename_columns(ren)


def read_table_parquet(path: str, columns: list[str] | None = None,
                       filter_expr=None,
                       storage_options: dict | None = None) -> ray.data.Dataset:
    """Generic pruned + predicate-pushed parquet scan (GIE Scan with
    column projection and predicate, algebra.proto:234); accepts
    loader-protocol URIs like :func:`read_edges_parquet`."""
    from graphscope_ray.sources.location import resolve_location

    fs, path = resolve_location(path, **(storage_options or {}))
    return read_parquet_clean(path, columns=columns,
                              filter=filter_expr, filesystem=fs)


def read_edges_csv(path: str, src: str = "src", dst: str = "dst",
                   weight: str | None = None,
                   storage_options: dict | None = None,
                   **csv_kwargs) -> ray.data.Dataset:
    from graphscope_ray.sources.location import resolve_location

    fs, path = resolve_location(path, **(storage_options or {}))
    ds = ray.data.read_csv(path, filesystem=fs, **csv_kwargs)
    ren = {src: "src", dst: "dst"}
    if weight:
        ren[weight] = "weight"
    return ds.select_columns(list(ren)).rename_columns(ren)


def read_edge_list(path: str, comment: str = "#") -> ray.data.Dataset:
    """Whitespace-separated ``src dst [weight]`` lines (the reference
    test driver's ``.e`` files, run_app.h:154-190) via read_text +
    vectorized parse."""
    txt = ray.data.read_text(path)

    def parse(b: pd.DataFrame) -> pd.DataFrame:
        lines = b["text"].str.strip()
        lines = lines[(lines != "") & ~lines.str.startswith(comment)]
        if lines.empty:  # a block holding only comments/blank lines
            return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                                 "dst": pd.Series([], dtype=np.int64),
                                 "weight": pd.Series([], dtype=np.float64)})
        parts = lines.str.split(expand=True)
        out = pd.DataFrame({
            "src": parts[0].astype(np.int64),
            "dst": parts[1].astype(np.int64),
        })
        # weight presence is decided PER LINE (missing third field →
        # 1.0) so every block emits the identical schema even when 2-
        # and 3-column lines mix or split unevenly across text blocks
        # (ADVICE r01; 1.0 matches the unweighted default in build).
        if parts.shape[1] > 2:
            out["weight"] = parts[2].astype(np.float64).fillna(1.0)
        else:
            out["weight"] = np.float64(1.0)
        return out

    return txt.map_batches(parse, batch_format="pandas")


def read_edges_orc(path: str, src: str = "src", dst: str = "dst",
                   weight: str | None = None) -> ray.data.Dataset:
    """ORC edge reader (the reference's loader lists ORC as a first-
    class format, python/graphscope/framework/loader.py:99-160).

    Ray 2.49 has no ``read_orc``; files are decoded with pyarrow.orc
    inside ``map_batches`` over the file list — one task per file
    (parallel, streaming; the same shape a native reader would have)."""
    import glob
    import os

    paths = (sorted(glob.glob(os.path.join(path, "*.orc")))
             if os.path.isdir(path) else [path])
    if not paths:
        raise FileNotFoundError(f"no .orc files under {path}")
    cols = [src, dst] + ([weight] if weight else [])
    ren = {src: "src", dst: "dst"}
    if weight:
        ren[weight] = "weight"

    def load(b: pd.DataFrame) -> pa.Table:
        from pyarrow import orc

        tabs = [orc.read_table(p, columns=cols) for p in b["p"]]
        t = pa.concat_tables(tabs)
        return t.rename_columns([ren.get(c, c) for c in t.column_names])

    return ray.data.from_items([{"p": p} for p in paths]).map_batches(
        load, batch_format="pandas", batch_size=1
    )


def from_pandas_edges(df: pd.DataFrame) -> ray.data.Dataset:
    """In-memory pandas loader (loader.py 'pandas' protocol)."""
    return ray.data.from_pandas(df)


def from_numpy_edges(src: np.ndarray, dst: np.ndarray,
                     weight: np.ndarray | None = None) -> ray.data.Dataset:
    """In-memory numpy loader (loader.py 'numpy' protocol)."""
    cols = {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    if weight is not None:
        cols["weight"] = pa.array(weight, pa.float64())
    return ray.data.from_arrow(pa.table(cols))
