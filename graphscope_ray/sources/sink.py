"""Resumable hash-partitioned parquet sink.

The reference persists results per fragment (one output per fid,
analytical_engine/test/run_app.h:180-185 writes result_frag_<fid>;
OUTPUT_CONTEXT streams per-worker). At 100-TB scale the failure mode
that matters is a job dying at 99%: output must land as many
independent partitions, each finished atomically, so a re-run skips
the finished ones instead of rewriting everything — never one giant
file.

Layout: ``out_dir/part=<k>/data.parquet`` + ``_SUCCESS`` (json with
row count + key name — the marker doubles as per-partition lineage).
Writes are atomic per partition: data lands under a temp name and is
``os.replace``d, the marker is written last, so a partition either has
a complete marker or doesn't count. On resume, finished partitions'
rows are dropped BEFORE the shuffle — recovering a 99%-done job
reshuffles only the missing 1%.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from graphscope_ray.functions.hashing import hash64_any


def _finished_parts(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    done = set()
    for d in os.listdir(out_dir):
        if d.startswith("part=") and os.path.exists(
                os.path.join(out_dir, d, "_SUCCESS")):
            done.add(int(d.split("=", 1)[1]))
    return done


def write_partitioned_parquet(
    ds: ray.data.Dataset,
    out_dir: str,
    key: str,
    num_partitions: int = 64,
    resume: bool = True,
) -> dict:
    """Write ``ds`` partitioned by ``hash64(key) % num_partitions``.

    Returns ``{"parts_written", "rows_written", "parts_skipped"}``.
    Deterministic: the same key always lands in the same partition, so
    a resumed run (``resume=True``, the default) produces byte-stable
    content for the partitions it completes. Rows inside a partition
    are sorted by ``key`` before writing (stable output independent of
    shuffle arrival order)."""
    os.makedirs(out_dir, exist_ok=True)
    done = _finished_parts(out_dir) if resume else set()
    done_arr = np.fromiter(done, dtype=np.int64, count=len(done))

    def tag(b: pa.Table) -> pa.Table:
        h = (hash64_any(b.column(key).to_numpy(zero_copy_only=False))
             % np.uint64(num_partitions)).astype(np.int64)
        b = b.append_column("_part", pa.array(h))
        if len(done_arr):
            b = b.filter(pa.array(~np.isin(h, done_arr)))
        return b.replace_schema_metadata(None)

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def write_parts(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for part, g in pdf.groupby("_part", sort=True):
            part = int(part)
            d = os.path.join(out_dir, f"part={part}")
            os.makedirs(d, exist_ok=True)
            g = g.drop(columns=["_part"]).sort_values(key, kind="mergesort")
            tmp = os.path.join(d, f".tmp-{os.getpid()}.parquet")
            pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                           tmp)
            os.replace(tmp, os.path.join(d, "data.parquet"))
            mtmp = os.path.join(d, f".tmp-{os.getpid()}.marker")
            with open(mtmp, "w") as f:
                json.dump({"rows": len(g), "key": key}, f)
            os.replace(mtmp, os.path.join(d, "_SUCCESS"))
            rows.append((part, len(g)))
        return pd.DataFrame(rows, columns=["part", "rows"])

    from graphscope_ray.stages.relational import bucketed_group_apply

    manifest = bucketed_group_apply(
        tagged, ["_part"], write_parts,
        num_buckets=min(num_partitions, 64),
    ).to_pandas()
    return {
        "parts_written": (int(manifest["part"].nunique())
                          if len(manifest) else 0),
        "rows_written": (int(manifest["rows"].sum())
                         if len(manifest) else 0),
        "parts_skipped": len(done),
    }


def read_partitioned_parquet(out_dir: str, columns=None
                             ) -> ray.data.Dataset:
    """Read back only FINISHED partitions (marker present) — a reader
    never sees a partition another run is mid-writing."""
    files = [os.path.join(out_dir, f"part={k}", "data.parquet")
             for k in sorted(_finished_parts(out_dir))]
    if not files:
        raise FileNotFoundError(f"no finished partitions under {out_dir}")
    # partitioning=None: the part=<k> dir name is placement metadata,
    # not a data column — don't let hive inference re-add it
    from graphscope_ray.sources.readers import strip_schema_metadata

    return strip_schema_metadata(
        ray.data.read_parquet(files, columns=columns, partitioning=None))
