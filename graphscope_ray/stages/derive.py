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
from ray.data.aggregate import Count

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


def extract_dep_keys(corpus: ray.data.Dataset, concurrency: int | None = None
                     ) -> ray.data.Dataset:
    if concurrency is None:
        import ray

        # size the actor pool to the session, leaving headroom for the
        # read and shuffle stages (ray_guide: don't starve other stages)
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    return corpus.select_columns(["repo", "path", "content"]).map_batches(
        DepKeyExtractor, batch_format="pandas", batch_size=8192,
        concurrency=concurrency,
    )


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

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["repo", "kind"])
        prov = np.sort(g.loc[g["kind"] == PROVIDES, "repo"].to_numpy())
        refs = np.sort(g.loc[g["kind"] == REFERENCES, "repo"].to_numpy())
        dropped = max(0, len(prov) - cap_per_key) + max(0, len(refs) - cap_per_key)
        if dropped:
            logger.warning(
                "dep key %r truncated: %d providers, %d referencers, cap %d "
                "(%d repos dropped)",
                g["key"].iloc[0], len(prov), len(refs), cap_per_key, dropped,
            )
            prov, refs = prov[:cap_per_key], refs[:cap_per_key]
        if len(prov) == 0 or len(refs) == 0:
            return pd.DataFrame({"src": pd.Series([], dtype=object),
                                 "dst": pd.Series([], dtype=object)})
        src = np.repeat(refs, len(prov))
        dst = np.tile(prov, len(refs))
        keep = src != dst
        return pd.DataFrame({"src": src[keep], "dst": dst[keep]})

    edges = pairs.groupby("key").map_groups(emit, batch_format="pandas")
    if not weighted:
        return edges
    return edges.groupby(["src", "dst"]).aggregate(Count(alias_name="weight"))
