"""Corpus generator + edge derivation + flagship repo-graph pipeline.

Oracle: an independent pandas/duckdb reimplementation of the derive
semantics, plus the north-rule per-row sha256 ingest invariant
(BASELINE.json input_hint) cross-checked against DuckDB's sha256.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.pipelines.repo_graph import (
    build_repo_graph,
    corpus_to_edges,
    pagerank_repos,
    wcc_repos,
)
from graphscope_ray.sources.generator import CorpusSpec, corpus_table, write_corpus
from graphscope_ray.stages.derive import with_sha256

from .oracles import oracle_pagerank, oracle_wcc

SPEC = CorpusSpec(n_repos=60, seed=42)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    write_corpus(str(d), SPEC, repos_per_file=25)
    return str(d)


def _oracle_edges(df: pd.DataFrame) -> pd.DataFrame:
    """Independent pandas reimplementation of corpus_to_edges."""
    import re

    prov = df.assign(key=df["path"].str.rsplit("/", n=1).str[-1])[["repo", "key"]]
    inc = re.compile(r'#include\s+"([^"]+)"')
    imp = re.compile(r"^\s*import\s+([\w./]+)", re.M)
    rows = []
    for repo, content in zip(df["repo"], df["content"]):
        for k in inc.findall(content) + imp.findall(content):
            rows.append((repo, k))
    refs = pd.DataFrame(rows, columns=["repo", "key"])
    prov, refs = prov.drop_duplicates(), refs.drop_duplicates()
    j = refs.merge(prov, on="key", suffixes=("_src", "_dst"))
    j = j[j["repo_src"] != j["repo_dst"]]
    out = (
        j.groupby(["repo_src", "repo_dst"])["key"].nunique().reset_index()
        .rename(columns={"repo_src": "src", "repo_dst": "dst", "key": "weight"})
    )
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def test_generator_deterministic():
    t1, t2 = corpus_table(SPEC), corpus_table(SPEC)
    assert t1.equals(t2)
    # planted fixtures exist: hub keys, dangling (leaf) repos, isolated repos
    df = t1.to_pandas()
    assert df["path"].str.endswith("/common_0.h").any()
    assert df["path"].is_unique or df.groupby("repo")["path"].nunique().sum() == len(df)
    assert df["repo"].nunique() == SPEC.n_repos


def test_sha256_invariant(corpus_dir):
    """Per-row content sha256 equals an independent (DuckDB) digest."""
    ds = with_sha256(ray.data.read_parquet(corpus_dir))
    got = ds.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = duckdb.sql(
        f"SELECT repo, path, sha256(content) AS d FROM '{corpus_dir}/*.parquet' "
        "ORDER BY repo, path"
    ).df()
    assert (got["content_sha256"].to_numpy() == want["d"].to_numpy()).all()


def test_derived_edges_match_oracle(corpus_dir):
    ds = ray.data.read_parquet(corpus_dir)
    got = (
        corpus_to_edges(ds, cap_per_key=10**9).to_pandas()
        .sort_values(["src", "dst"]).reset_index(drop=True)
    )
    want = _oracle_edges(pd.read_parquet(corpus_dir))
    pd.testing.assert_frame_equal(
        got.astype({"weight": np.int64}), want.astype({"weight": np.int64})
    )
    assert len(got) > 0


def test_cap_per_key_truncates(corpus_dir):
    ds = ray.data.read_parquet(corpus_dir)
    capped = corpus_to_edges(ds, cap_per_key=3).to_pandas()
    full = corpus_to_edges(ds, cap_per_key=10**9).to_pandas()
    assert len(capped) < len(full)  # hub keys got truncated
    # capped edge set is a subset of the full one
    fullset = set(zip(full["src"], full["dst"]))
    assert all(p in fullset for p in zip(capped["src"], capped["dst"]))


def test_repo_graph_pagerank_and_wcc(corpus_dir):
    """Flagship end-to-end: corpus → graph → PageRank (allclose 1e-6 vs
    oracle on the derived edges) and WCC (exact, canonical min-repo ids)."""
    corpus = ray.data.read_parquet(corpus_dir)
    edges_df = corpus_to_edges(corpus, cap_per_key=10**9).to_pandas()
    edge_list = list(zip(edges_df["src"], edges_df["dst"]))
    all_repos = [SPEC.repo_name(i) for i in range(SPEC.n_repos)]

    graph, vmap = build_repo_graph(corpus, num_partitions=4, directed=True,
                                   cap_per_key=10**9)
    assert graph.n_vertices == SPEC.n_repos

    pr, metrics = pagerank_repos(graph, vmap)
    prdf = pr.to_pandas()
    got = dict(zip(prdf["repo"], prdf["pagerank"]))
    want = oracle_pagerank(edge_list, all_repos, directed=True)
    assert set(got) == set(want)
    for r in want:
        assert got[r] == pytest.approx(want[r], abs=1e-6), r
    assert metrics["edges_per_sec"] > 0

    # WCC needs the undirected view
    g2, vmap2 = build_repo_graph(corpus, num_partitions=4, directed=False,
                                 cap_per_key=10**9)
    comp, _ = wcc_repos(g2, vmap2)
    cdf = comp.to_pandas()
    gotc = dict(zip(cdf["repo"], cdf["component_repo"]))
    wantc = oracle_wcc(edge_list, all_repos)
    assert gotc == wantc
    # planted structure: isolated repos are singletons
    iso = [r for r in all_repos if wantc[r] == r and
           sum(1 for v, c in wantc.items() if c == r) == 1]
    assert len(iso) >= 1
