"""Fixed-decimal formatting for float result columns.

Cross-engine float parity: numpy's ``round`` and DuckDB's ``round``
can emit doubles that differ by 1 ulp for the same decimal value, so a
value-hash over raw doubles is flaky even after rounding. Both the Ray
pipelines and the SQL oracles therefore emit float results as
fixed-decimal *strings* (``%.Nf`` after rounding to N decimals) — bit-
identical across engines whenever the rounded decimal values agree,
which is the actual correctness contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def fixed_str(values, nd: int) -> np.ndarray:
    """Vectorized '%.{nd}f' of the values (object array of str).

    No pre-rounding: %.Nf performs correctly-rounded decimal conversion
    of the exact double, identically in C/Python/DuckDB's printf —
    whereas numpy's round (half-to-even) and SQL ROUND (half-away)
    disagree on boundary values."""
    arr = np.asarray(values, dtype=np.float64)
    return np.char.mod(f"%.{nd}f", arr).astype(object)


def fixed_cols(ds: ray.data.Dataset, cols: dict[str, int]) -> ray.data.Dataset:
    """Replace float columns with fixed-decimal strings."""

    def f(t: pa.Table) -> pa.Table:
        for c, nd in cols.items():
            idx = t.schema.get_field_index(c)
            vals = t.column(c).to_numpy(zero_copy_only=False)
            t = t.set_column(idx, c, pa.array(fixed_str(vals, nd), pa.string()))
        return t

    return ds.map_batches(f, batch_format="pyarrow")


def fixed_cols_df(df: pd.DataFrame, cols: dict[str, int]) -> pd.DataFrame:
    df = df.copy()
    for c, nd in cols.items():
        df[c] = fixed_str(df[c].to_numpy(), nd)
    return df


def sql_fixed(expr: str, nd: int) -> str:
    """The SQL twin of fixed_str: printf('%.{nd}f', expr)."""
    return f"printf('%.{nd}f', {expr})"
