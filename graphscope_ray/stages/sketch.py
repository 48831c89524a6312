"""Distributed sketches: HyperLogLog approximate count-distinct.

At 100-TB scale, "distinct users per key" via exact dedup is an
edge-scale shuffle of the raw values; an HLL sketch ships one
``2^p``-byte register block per (batch, group) instead and merges by
element-wise max — the classic Flajolet–Fourier–Gandouet–Meunier
estimator (HyperLogLog, AofA 2007) with linear-counting small-range
correction. Deterministic: registers are a pure function of the value
SET (order- and partition-independent), which the tests pin by
comparing registers across arbitrary re-partitionings.

Accuracy: σ ≈ 1.04/√(2^p); the default p=12 (4 KB registers) gives
~1.6 % relative error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.functions.hashing import hash64_any


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (0 -> 64)."""
    n = np.full(x.shape, 64, dtype=np.int64)
    shift = np.uint64(32)
    cur = x.copy()
    for bits in (32, 16, 8, 4, 2, 1):
        hi = cur >> np.uint64(bits)
        take = hi != 0
        n[take] -= bits
        cur = np.where(take, hi, cur)
    n[x != 0] -= 1  # the highest set bit itself
    return n


def hll_registers(values, p: int = 12) -> np.ndarray:
    """Registers (uint8[2^p]) of one value collection."""
    h = hash64_any(np.asarray(values))
    if h.size == 0:
        return np.zeros(1 << p, dtype=np.uint8)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)).astype(np.uint64)
    rho = np.minimum(_clz64(rest) + 1, 64 - p + 1).astype(np.uint8)
    order = np.lexsort((rho, idx))
    idx, rho = idx[order], rho[order]
    # max per register: last of each run after a stable (idx, rho) sort
    last = np.concatenate((idx[1:] != idx[:-1], [True]))
    regs = np.zeros(1 << p, dtype=np.uint8)
    regs[idx[last]] = rho[last]
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with linear-counting correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(e)


def approx_count_distinct(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    p: int = 12,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-group approximate distinct count of ``col``.

    Map side: one register block per (batch, group) — the shuffle moves
    ``groups × 2^p`` bytes, independent of the value count. Reduce
    side: element-wise max merge per group + estimate. Returns
    ``(*keys, approx_distinct: int64)``. Pays off when distinct values
    per group ≫ 2^p / 8; below that, exact ``dedup_first`` + count is
    cheaper — pick per pipeline."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, g in b.groupby(keys, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            rows.append((*kv, hll_registers(g[col].to_numpy(), p).tobytes()))
        return pd.DataFrame(rows, columns=[*keys, "_regs"])

    partials = ds.map_batches(partial, batch_format="pandas")

    from graphscope_ray.stages.relational import bucketed_group_apply

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, grp in g.groupby(keys, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            regs = np.maximum.reduce([
                np.frombuffer(r, dtype=np.uint8) for r in grp["_regs"]])
            rows.append((*kv, int(round(hll_estimate(regs)))))
        return pd.DataFrame(rows, columns=[*keys, "approx_distinct"])

    return bucketed_group_apply(partials, keys, merge,
                                num_buckets=num_buckets)


def approx_top_k(
    ds: ray.data.Dataset,
    col: str,
    k: int = 20,
    capacity: int = 4096,
) -> ray.data.Dataset:
    """Approximate top-k heavy hitters of ``col`` (distributed
    Misra–Gries / Space-Saving): each batch reduces its exact counts to
    a ``capacity``-entry summary (subtract the (capacity+1)-th largest
    count, keep the positive remainder), the summaries are sum-merged
    with one SMALL keyed shuffle (≤ capacity rows per block, not the
    raw value stream), and the global top-k by merged count comes back
    with its estimate.

    Guarantees (classic MG analysis): ``estimate`` is a LOWER bound
    with ``count − n/capacity ≤ estimate ≤ count``, so every value with
    true frequency > n/capacity survives to the candidate set; with
    ``capacity`` ≥ the number of distinct values the result is exact.
    Returns (``value`` named by ``col``, ``estimate``) sorted by
    estimate desc, value asc (deterministic ties)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[col].value_counts()
        if len(vc) > capacity:
            cut = vc.iloc[capacity]
            vc = (vc - cut).iloc[:capacity]
            vc = vc[vc > 0]
        return pd.DataFrame({col: vc.index.to_numpy(),
                             "estimate": vc.to_numpy(np.int64)})

    from graphscope_ray.stages.relational import grouped_agg, topk

    summed = grouped_agg(ds.map_batches(partial, batch_format="pandas"),
                         [col], {"estimate": ("estimate", "sum")})
    return topk(summed, "estimate", k, descending=True, tiebreak=[col])


def frequent_ngrams(
    docs: ray.data.Dataset,
    n: int = 3,
    k: int = 20,
    text_col: str = "text",
    capacity: int = 4096,
) -> ray.data.Dataset:
    """Corpus-wide most-frequent word n-grams — the boilerplate-
    discovery companion to ``dedup.paragraph_dedup`` (find the
    recurring spans BEFORE deciding what to strip). A thin composition:
    one flat pass explodes each batch's n-grams as strings (lowercase
    ``TOKEN_RE`` tokens joined by single spaces — the dedup family's
    token space) with a per-batch ``value_counts`` pre-reduce, then the
    Misra–Gries :func:`approx_top_k` finishes (≤ ``capacity`` summary
    rows per block ever shuffle; the raw n-gram stream never does).
    Same estimate guarantees as :func:`approx_top_k`. Returns
    (``ngram``, ``estimate``) sorted by estimate desc, ngram asc."""
    from graphscope_ray.functions.text import TOKEN_RE

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].str.lower().str.findall(TOKEN_RE)
        lens = toks.str.len().fillna(0).to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"ngram": pd.Series([], dtype=object)})
        flat = np.concatenate([t for t in toks if t]).astype(object)
        grams = flat
        for j in range(1, n):
            shifted = np.roll(flat, -j)
            grams = np.char.add(np.char.add(grams.astype(str), " "),
                                shifted.astype(str)).astype(object)
        # doc-local windows: drop each doc's last min(len, n-1)
        # positions so no n-gram crosses a document boundary
        # (vectorized — no per-doc loop)
        valid = np.ones(len(flat), dtype=bool)
        ends = np.cumsum(lens[lens > 0])
        cut = np.minimum(lens[lens > 0], n - 1)
        tot = int(cut.sum())
        if tot:
            base = np.repeat(ends - cut, cut)
            step = (np.arange(tot, dtype=np.int64)
                    - np.repeat(np.cumsum(cut) - cut, cut))
            valid[base + step] = False
        return pd.DataFrame({"ngram": grams[valid]})

    exploded = docs.map_batches(explode, batch_format="pandas")
    out = approx_top_k(exploded, "ngram", k=k, capacity=capacity)
    return out
