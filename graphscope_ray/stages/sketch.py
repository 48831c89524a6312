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
    recurring spans BEFORE deciding what to strip).

    Two passes, both hash-domain until the very end (building n-gram
    STRINGS for the whole corpus measured ~8× slower than hashing —
    ``np.char.add`` is per-element): (1) Misra–Gries
    :func:`approx_top_k` over the dedup family's rolling shingle
    hashes (one vectorized kernel call per batch, ≤ ``capacity``
    summary rows per block ever shuffle); (2) one streaming resolve
    pass that recovers each winning hash's text from the first batch
    that contains it (searchsorted membership against the broadcast
    winner array, then a tiny per-batch slice-and-join), reduced by a
    driver-side first-wins over ≤ k rows per block. Same estimate
    guarantees as :func:`approx_top_k`; candidate SELECTION at the
    k-boundary tie-breaks by hash (deterministic), the returned rows
    then sort (estimate desc, ngram asc)."""
    from graphscope_ray.functions.text import TOKEN_RE
    from graphscope_ray.stages.dedup import _batch_shingles

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        sh, starts = _batch_shingles(b[text_col], n)
        # docs shorter than n tokens emit a single padded pseudo-
        # shingle (dedup kernel contract); drop those — an n-gram
        # needs n real tokens
        lens = (b[text_col].str.lower().str.findall(TOKEN_RE)
                .str.len().fillna(0).to_numpy(np.int64))
        out_lens = np.diff(starts)
        keep = np.repeat(lens >= n, out_lens)
        return pd.DataFrame({"h": sh[keep].view(np.int64)})

    winners = approx_top_k(
        docs.map_batches(explode, batch_format="pandas"),
        "h", k=k, capacity=capacity).to_pandas()
    if len(winners) == 0:
        return ray.data.from_pandas(pd.DataFrame(
            {"ngram": pd.Series([], dtype=object),
             "estimate": pd.Series([], dtype=np.int64)}))
    wref = ray.put(np.sort(winners["h"].to_numpy(np.int64).view(np.uint64)))

    def resolve(b: pd.DataFrame) -> pd.DataFrame:
        wins = ray.get(wref)
        sh, starts = _batch_shingles(b[text_col], n)
        pos = np.searchsorted(wins, sh)
        pos[pos == len(wins)] = 0
        hit = np.flatnonzero(wins[pos] == sh)
        if len(hit) == 0:
            return pd.DataFrame({"h": pd.Series([], dtype=np.int64),
                                 "ngram": pd.Series([], dtype=object)})
        # one occurrence per winning hash per batch: a boilerplate
        # n-gram can hit hundreds of thousands of times — only the
        # first needs its text materialized
        _, first = np.unique(sh[hit], return_index=True)
        hit = hit[first]
        toks = b[text_col].str.lower().str.findall(TOKEN_RE)
        doc_of = np.searchsorted(starts[1:], hit, side="right")
        off = hit - starts[doc_of]
        grams = [" ".join(toks.iloc[d][o:o + n])
                 for d, o in zip(doc_of, off)]  # ≤ k rows per batch
        return pd.DataFrame({"h": sh[hit].view(np.int64), "ngram": grams})

    texts = docs.map_batches(resolve, batch_format="pandas").to_pandas()
    texts = texts.drop_duplicates("h")
    out = winners.merge(texts, on="h", how="left")
    out = out[["ngram", "estimate"]].sort_values(
        ["estimate", "ngram"], ascending=[False, True],
        kind="mergesort").reset_index(drop=True)
    return ray.data.from_pandas(out)


def approx_quantiles(
    ds: "ray.data.Dataset",
    value_col: str,
    quantiles: "list[float]",
    key_col: str = "doc_id",
    sample_k: int = 4096,
    salt: str = "quantiles",
) -> "dict[float, float]":
    """One-pass approximate quantiles: exact quantiles of a
    deterministic uniform ``sample_k``-sample (the k globally smallest
    key hashes, via :func:`sampling.hash_order_sample`'s partial-top-k
    shuffle — ≤ k rows per block ever move). The scale-path companion
    to :func:`relational.global_ntile`, which is exact but pays a full
    range sort. DKW bound: P(|F̂ − F|∞ > ε) ≤ 2e^(−2kε²), so k = 4096
    gives ±2.1 % rank error at 95 % confidence — independent of corpus
    size. Deterministic: same (input keys, salt) → same sample → same
    estimates at any partitioning. Returns {q: value} using the
    lower-interpolation convention on the sorted sample.
    """
    import numpy as np

    from graphscope_ray.stages.sampling import hash_order_sample

    sample = hash_order_sample(
        ds.select_columns([key_col, value_col]), sample_k,
        key_col=key_col, salt=salt).to_pandas()
    if not len(sample):
        return {float(q): float("nan") for q in quantiles}
    v = np.sort(sample[value_col].to_numpy(np.float64))
    out = {}
    for q in quantiles:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        idx = min(len(v) - 1, int(np.floor(q * len(v))))
        out[float(q)] = float(v[idx])
    return out


# ---------------------------------------------------------------------------
# Bloom filter: constant-size set membership for incremental dedup
# ---------------------------------------------------------------------------

class BloomFilter:
    """Immutable Bloom filter over 64-bit key hashes (double hashing,
    Kirsch–Mitzenmacher: ``pos_i = (h1 + i·h2) mod m``). ``words`` is
    the packed uint64 bitmap — the whole sketch is ``m_bits / 8`` bytes
    regardless of how many keys went in, so it broadcasts once via
    ``ray.put`` and every filter task reads it zero-copy.

    Guarantees: NO false negatives (a key that was inserted always
    tests positive), false positives at the classic
    ``(1 − e^{−kn/m})^k`` rate — i.e. "definitely new" is always
    correct; a small fraction of genuinely-new keys is conservatively
    dropped. That is the right direction for incremental corpus dedup
    (never re-admit a seen document)."""

    __slots__ = ("words", "m_bits", "k", "seed")

    def __init__(self, words: np.ndarray, m_bits: int, k: int, seed: int):
        self.words = words
        self.m_bits = int(m_bits)
        self.k = int(k)
        self.seed = int(seed)

    def positions(self, keys) -> np.ndarray:
        """(n, k) bit positions of each key."""
        from graphscope_ray.functions.hashing import hash64_any, splitmix64

        h1 = hash64_any(np.asarray(keys))
        h2 = splitmix64(h1 ^ np.uint64(self.seed * 0x9E3779B97F4A7C15
                                       & 0xFFFFFFFFFFFFFFFF))
        h2 |= np.uint64(1)  # odd stride: all k probes distinct mod 2^j
        i = np.arange(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return (h1[:, None] + i[None, :] * h2[:, None]) \
                % np.uint64(self.m_bits)

    def contains(self, keys) -> np.ndarray:
        """Vectorized membership test → bool[n] (True = maybe seen)."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self.positions(keys)
        w = self.words[(pos >> np.uint64(6)).astype(np.int64)]
        bit = (w >> (pos & np.uint64(63))) & np.uint64(1)
        return (bit == 1).all(axis=1)


def bloom_build(
    ds: ray.data.Dataset,
    col: str,
    *,
    m_bits: int = 1 << 24,
    k: int = 4,
    seed: int = 17,
    num_buckets: int = 64,
) -> BloomFilter:
    """Distributed Bloom build: per-batch key hashing emits deduped bit
    positions (O(k·rows) uint64s — the only thing that shuffles), a
    bucketed group-apply builds disjoint sub-bitmaps in parallel, and
    the driver assembles exactly ``m_bits/8`` bytes from ≤ num_buckets
    rows. Driver state is the final bitmap only — never the keys."""
    n_words = (m_bits + 63) // 64
    wpb = (n_words + num_buckets - 1) // num_buckets
    probe = BloomFilter(np.zeros(0, np.uint64), m_bits, k, seed)

    def positions(b: pd.DataFrame) -> pd.DataFrame:
        pos = np.unique(probe.positions(b[col].to_numpy()).ravel())
        return pd.DataFrame({"pos": pos.astype(np.int64)})

    pos_ds = ds.map_batches(positions, batch_format="pandas")

    from graphscope_ray.stages.relational import bucketed_group_apply

    def seal(g: pd.DataFrame) -> pd.DataFrame:
        # a coarse hash-bucket may hold several whole bkt-groups
        rows = []
        for bkt, grp in g.groupby("bkt", sort=False):
            pos = grp["pos"].to_numpy(np.uint64)
            sub = np.zeros(wpb, dtype=np.uint64)
            widx = (pos >> np.uint64(6)).astype(np.int64) - int(bkt) * wpb
            np.bitwise_or.at(sub, widx,
                             np.uint64(1) << (pos & np.uint64(63)))
            rows.append((np.int64(bkt), sub.tobytes()))
        return pd.DataFrame(rows, columns=["bkt", "sub"])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bkt"] = (b["pos"].to_numpy(np.int64) >> 6) // wpb
        return b

    subs = bucketed_group_apply(
        pos_ds.map_batches(add_bucket, batch_format="pandas"),
        ["bkt"], seal, num_buckets=num_buckets).to_pandas()

    words = np.zeros(n_words, dtype=np.uint64)
    for _, row in subs.iterrows():
        base = int(row["bkt"]) * wpb
        sub = np.frombuffer(row["sub"], dtype=np.uint64)
        words[base:base + len(sub)] |= sub[:n_words - base]
    return BloomFilter(words, m_bits, k, seed)


def bloom_new_rows(
    ds: ray.data.Dataset,
    bloom: BloomFilter,
    col: str,
) -> ray.data.Dataset:
    """Incremental dedup against a seen-corpus Bloom filter: keep rows
    whose key is DEFINITELY not in the filter (at least one probe bit
    unset). The bitmap ships once via ``ray.put``; each task
    reconstructs a zero-copy view."""
    words_ref = ray.put(bloom.words)
    m_bits, k, seed = bloom.m_bits, bloom.k, bloom.seed

    def keep_new(b: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(ray.get(words_ref), m_bits, k, seed)
        return b[~bf.contains(b[col].to_numpy())]

    return ds.map_batches(keep_new, batch_format="pandas")
