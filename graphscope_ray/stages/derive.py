"""Edge derivation: source-code corpus → repo→repo dependency edges.

The north-rule ingest pipeline (BASELINE.json input_hint): from the
Parquet table ``(repo, path, commit, lang, content)`` derive directed
repo→repo edges "via shared path/content dependency keys". Shape
mirrors the reference's loader flow (tables → partitioned edges,
``core/loader/arrow_fragment_loader.h:248-612``) but is expressed as
three Ray Data stages:

1. ``with_sha256``      — stateless map_batches; per-row content sha256
                          (ingest invariant, verified row-for-row in tests)
2. ``extract_dep_keys`` — actor-pool map_batches (compiled regexes in
                          __init__); emits (repo, key, kind) where kind
                          PROVIDES = repo owns a file with basename `key`,
                          REFERENCES = repo's content includes/imports `key`
3. ``derive_edges``     — groupby(key).map_groups: referencer×provider
                          pairs per key (skew-capped, capped drops are
                          counted and logged — no silent caps), then
                          groupby(src,dst).count → weight = #shared keys

Only (repo, path, content) columns are read; the content column never
survives past stage 2 (10^12-file posture: project early, stream).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.functions.hashing import sha256_hex

logger = logging.getLogger(__name__)

PROVIDES = 0
REFERENCES = 1


def with_sha256(corpus: ray.data.Dataset) -> ray.data.Dataset:
    """Append the per-row ``content_sha256`` column (input_hint invariant)."""

    def add(batch: pa.Table) -> pa.Table:
        digests = sha256_hex(batch.column("content").to_pylist())
        return batch.append_column("content_sha256", pa.array(digests, pa.string()))

    return corpus.map_batches(add, batch_format="pyarrow")


class DepKeyExtractor:
    """Stateful extractor: regexes compiled once per actor (SURVEY §7.2)."""

    def __init__(self):
        import re

        self.include_re = re.compile(r'#include\s+"([^"]+)"')
        self.import_re = re.compile(r"^\s*import\s+([\w./]+)", re.M)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        repo = batch["repo"]
        # PROVIDES: the file's basename is a key this repo provides
        base = batch["path"].str.rsplit("/", n=1).str[-1]
        prov = pd.DataFrame({"repo": repo, "key": base})
        prov["kind"] = np.int8(PROVIDES)
        # REFERENCES: include/import targets in content
        inc = batch["content"].str.findall(self.include_re)
        imp = batch["content"].str.findall(self.import_re)
        refs = pd.DataFrame({"repo": repo, "key": inc + imp}).explode("key")
        refs = refs.dropna(subset=["key"])
        refs["kind"] = np.int8(REFERENCES)
        out = pd.concat([prov, refs], ignore_index=True)
        # within-batch dedup cuts shuffle volume (global dedup happens
        # inside the per-key group)
        return out.drop_duplicates(ignore_index=True)


_STATELESS_EXTRACTOR = None


def _extract_fn(batch: pd.DataFrame) -> pd.DataFrame:
    # stateless-task path: the regex state is module-level, compiled
    # once per worker process at import — same amortization as an
    # actor pool with zero pool-startup cost (an actor pool is the
    # right tool for heavy state like models, not two regexes)
    global _STATELESS_EXTRACTOR
    if _STATELESS_EXTRACTOR is None:
        _STATELESS_EXTRACTOR = DepKeyExtractor()
    return _STATELESS_EXTRACTOR(batch)


def extract_dep_keys(corpus: ray.data.Dataset, concurrency: int | None = None
                     ) -> ray.data.Dataset:
    kwargs = {}
    fn = _extract_fn
    if concurrency is not None:  # explicit actor-pool mode
        fn = DepKeyExtractor
        kwargs["concurrency"] = concurrency
    return corpus.select_columns(["repo", "path", "content"]).map_batches(
        fn, batch_format="pandas", batch_size=8192, **kwargs
    )


def _extract_vid_fn(batch: pd.DataFrame) -> pd.DataFrame:
    """Int64 extract: (vid, key, kind) with vid = siphash64(repo) (the
    SAME pure function the vertex map uses, state/vertex_map.py) and
    key = fnv-like 64-bit key hash. The downstream shuffles then move
    17-byte int rows instead of two strings per row (~2.5× fewer
    shuffle bytes), and the edge table needs no oid→vid join at all."""
    from graphscope_ray.functions.hashing import (
        hash64_strings,
        string_ids_to_vids,
    )

    global _STATELESS_EXTRACTOR
    if _STATELESS_EXTRACTOR is None:
        _STATELESS_EXTRACTOR = DepKeyExtractor()
    out = _STATELESS_EXTRACTOR(batch)
    return pd.DataFrame({
        "vid": string_ids_to_vids(out["repo"].tolist()),
        "key": hash64_strings(out["key"].tolist()).astype(np.int64),
        "kind": out["kind"],
    })


def extract_dep_keys_vids(corpus: ray.data.Dataset) -> ray.data.Dataset:
    return corpus.select_columns(["repo", "path", "content"]).map_batches(
        _extract_vid_fn, batch_format="pandas", batch_size=8192
    )


def derive_edges_vids(
    pairs: ray.data.Dataset,
    cap_per_key: int = 64,
) -> ray.data.Dataset:
    """(vid, key, kind) → directed multigraph arcs (src, dst) as int64
    vids. Same semantics as :func:`derive_edges` with ``weighted=False``
    except the hot-key cap keeps the ``cap_per_key`` MINIMUM-VID repos
    per side (the string path keeps lexicographically-first repos) —
    an equally deterministic truncation policy, chosen so the whole
    derive works on int columns. 64-bit key-hash collisions would merge
    two dep keys (≈ n²/2⁶⁵ birthday bound — negligible; the downstream
    vid-collision check still guards vertex identity)."""

    from graphscope_ray.stages.relational import bucketed_group_apply

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["vid", "key", "kind"])
        g = g.sort_values(["key", "kind", "vid"], kind="mergesort")
        rank = g.groupby(["key", "kind"], sort=False).cumcount()
        over = rank >= cap_per_key
        dropped = int(over.sum())
        if dropped:
            hot = g.loc[over, "key"].nunique()
            logger.warning(
                "dep-key cap %d: %d repo slots dropped across %d hot keys "
                "in this bucket", cap_per_key, dropped, hot,
            )
            g = g[~over]
        prov = g[g["kind"] == PROVIDES][["key", "vid"]]
        refs = g[g["kind"] == REFERENCES][["key", "vid"]]
        m = refs.merge(prov, on="key", suffixes=("_src", "_dst"))
        m = m[m["vid_src"] != m["vid_dst"]]
        return pd.DataFrame({"src": m["vid_src"].to_numpy(np.int64),
                             "dst": m["vid_dst"].to_numpy(np.int64)})

    return bucketed_group_apply(pairs, ["key"], emit, num_buckets=64)


def derive_edges(
    pairs: ray.data.Dataset,
    cap_per_key: int = 64,
    weighted: bool = True,
) -> ray.data.Dataset:
    """(repo, key, kind) → directed distinct edges (src, dst[, weight]).

    src = referencing repo, dst = providing repo (includer → includee,
    FIXTURES.md F2). Hot keys (provided or referenced by more than
    ``cap_per_key`` repos — think ``common.h``) are deterministically
    truncated to the ``cap_per_key`` lexicographically-first repos on
    each side; the number of dropped repos is counted per group and
    logged (no silent caps). Weight = number of distinct shared keys.
    """

    from graphscope_ray.stages.relational import bucketed_group_apply

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        # g holds WHOLE key-groups for many keys: dedupe, truncate hot
        # keys (deterministic: lexicographically-first repos survive),
        # then one vectorized refs×provs merge on key.
        g = g.drop_duplicates(["repo", "key", "kind"])
        g = g.sort_values(["key", "kind", "repo"], kind="mergesort")
        rank = g.groupby(["key", "kind"], sort=False).cumcount()
        over = rank >= cap_per_key
        dropped = int(over.sum())
        if dropped:
            hot = g.loc[over, "key"].nunique()
            logger.warning(
                "dep-key cap %d: %d repo slots dropped across %d hot keys "
                "in this bucket", cap_per_key, dropped, hot,
            )
            g = g[~over]
        prov = g[g["kind"] == PROVIDES][["key", "repo"]]
        refs = g[g["kind"] == REFERENCES][["key", "repo"]]
        m = refs.merge(prov, on="key", suffixes=("_src", "_dst"))
        m = m[m["repo_src"] != m["repo_dst"]]
        return pd.DataFrame({"src": m["repo_src"].to_numpy(),
                             "dst": m["repo_dst"].to_numpy()})

    edges = bucketed_group_apply(pairs, ["key"], emit, num_buckets=64)
    if not weighted:
        return edges
    from graphscope_ray.stages.relational import grouped_agg

    # combine=False: (src, dst) pair keys are near-unique per batch
    # (dep-key caps bound duplication), so a map-side combiner would
    # add an edge-scale per-batch sort for almost no byte reduction
    return grouped_agg(edges, ["src", "dst"], {"weight": (None, "size")},
                       combine=False)
