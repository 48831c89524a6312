"""Local emulation of the driver's correctness gate: run each
``queries()`` entry and its ``oracle_sql()`` twin over the same sf dir,
compare row count, schema (sorted column names) and values (rows sorted
by all columns; exact for ints/strings, exact-after-rounding for
floats, with a float tolerance fallback reported separately).

Usage: PYTHONPATH=. python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            try:
                df[c] = df[c].astype(np.int64)  # duckdb HUGEINT -> object
            except (TypeError, ValueError):
                pass
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> str:
    if len(got) != len(want):
        return f"ROWS {len(got)} != {len(want)}"
    g, w = normalize(got), normalize(want)
    if list(g.columns) != list(w.columns):
        return f"SCHEMA {list(g.columns)} != {list(w.columns)}"
    issues = []
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]):
            a, b = g[c].to_numpy(), w[c].to_numpy()
            if not np.array_equal(a, b):
                if np.allclose(a, b, atol=1e-9, equal_nan=True):
                    issues.append(f"{c}: float-not-bitexact(max {np.abs(a - b).max():.2e})")
                else:
                    bad = np.abs(a - b) > 1e-9
                    return f"VALUES col {c}: {bad.sum()} rows differ, max {np.abs(a - b).max():.3g}"
        else:
            if not g[c].equals(w[c]):
                n = (g[c] != w[c]).sum()
                return f"VALUES col {c}: {n} rows differ e.g. {g[c][g[c] != w[c]].head(2).tolist()} vs {w[c][g[c] != w[c]].head(2).tolist()}"
    return "OK" + ("  [" + "; ".join(issues) + "]" if issues else "")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:24s} RAY-FAIL {type(e).__name__}: {str(e)[:100]}")
            continue
        t1 = time.perf_counter()
        if name not in oracles:
            print(f"{name:24s} rows-only rows={len(got)} ray={t1 - t0:.1f}s")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:24s} SQL-FAIL {type(e).__name__}: {str(e)[:120]}")
            continue
        verdict = compare(name, got, want)
        print(f"{name:24s} {verdict} rows={len(got)} ray={t1 - t0:.1f}s "
              f"sql={time.perf_counter() - t1:.1f}s")


if __name__ == "__main__":
    main()
